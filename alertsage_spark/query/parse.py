"""Lucene-lite query-string language over the boolean + phrase engine.

Syntax (the user-facing search box the reference exposes as free-text
inputs in its UI, /root/reference/src/triage/ui_premium.py):

    +word      required (must)
    -word      excluded (must_not)
    word       optional (should)
    "a b c"    phrase: tokens must appear CONTIGUOUSLY in the
               normalized token stream; phrase tokens also score as
               must clauses (Lucene's behavior)
    +"a b"     same as "a b" (phrases are implicitly required)

Every fragment is normalized through the ONE tokenizer spec, so a
camelCase fragment expands to several tokens which each carry the
fragment's role. A term landing in several roles keeps the strongest
one (must_not > must > should), so the clause table stays
duplicate-free. Negated phrases (-"a b") are not supported — raising
beats silently approximating them as token exclusions.

Execution (`search`): parse -> boolean_qualified (score + must
coverage + exclusion in one hash-agg pass) -> semi-join docs satisfying
ALL of the query's phrases (token-stream contiguity, the same
boundary-delimited rule as ft_phrase_search) -> rank top-k. Phrase
verification joins only the queries that HAVE phrases — phrase-free
queries pay nothing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alertsage_spark.index.build import InvertedIndex
from alertsage_spark.query.boolean import boolean_qualified, clauses_df
from alertsage_spark.tokenizer import tokenize_col, tokenize_py

_PART_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')

_ROLE_RANK = {"must_not": 3, "must": 2, "should": 1}


def parse_query(q: str) -> dict:
    """-> {"must": [...], "should": [...], "must_not": [...],
           "phrases": [[tok, ...], ...]} (token lists, spec-normalized)."""
    roles: dict[str, str] = {}
    phrases: list[list[str]] = []
    for prefix, quoted, bare in _PART_RE.findall(q):
        text = quoted if quoted != "" else bare
        toks = tokenize_py(text)
        if not toks:
            continue
        is_phrase = quoted != "" and len(toks) >= 2
        if is_phrase:
            if prefix == "-":
                raise ValueError(f'negated phrases are unsupported: -"{quoted}"')
            phrases.append(toks)
            role = "must"
        else:
            role = {"+": "must", "-": "must_not"}.get(prefix, "should")
        for t in toks:
            if _ROLE_RANK[role] > _ROLE_RANK.get(roles.get(t), 0):
                roles[t] = role
    out = {"must": [], "should": [], "must_not": [], "phrases": phrases}
    for t, role in roles.items():
        out[role].append(t)
    return out


def search(
    spark,
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k for [(query_id, query_string)] under the query language.

    Returns (query_id, doc_id, score double, rank int) — ranks are
    assigned AFTER phrase filtering, so they are dense per query.
    """
    parsed = [(qid, parse_query(q)) for qid, q in queries]
    clauses = clauses_df(
        spark,
        [
            (qid, {r: p[r] for r in ("must", "should", "must_not")})
            for qid, p in parsed
        ],
    )
    qualified = boolean_qualified(index, clauses)

    phrase_rows = [
        (qid, " " + " ".join(toks) + " ")
        for qid, p in parsed
        for toks in p["phrases"]
    ]
    if phrase_rows:
        from alertsage_spark.session import local_df

        pdf = local_df(spark, phrase_rows, "query_id string, needle string")
        n_phrases = pdf.groupBy("query_id").agg(F.count("*").alias("n_ph"))
        streamed = docs.select(
            F.col(id_col).alias("doc_id"),
            F.concat(
                F.lit(" "),
                F.array_join(tokenize_col(F.col(text_col), mode=index.mode), " "),
                F.lit(" "),
            ).alias("s"),
        )
        ok = (
            streamed.join(F.broadcast(pdf), F.col("s").contains(F.col("needle")))
            .groupBy("query_id", "doc_id")
            .agg(F.count("*").alias("hit_ph"))
            .join(F.broadcast(n_phrases), "query_id")
            .filter(F.col("hit_ph") == F.col("n_ph"))
            .select("query_id", "doc_id")
        )
        # phrase-free queries pass through untouched
        with_ph = {qid for qid, _ in phrase_rows}
        free = qualified.filter(~F.col("query_id").isin(list(with_ph)))
        gated = qualified.join(ok, ["query_id", "doc_id"], "left_semi")
        qualified = free.unionByName(gated)

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        qualified.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )
