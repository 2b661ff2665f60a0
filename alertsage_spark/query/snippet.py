"""Result snippeting / hit highlighting.

For each (query term, matching document) produce a display snippet: a
bounded window of the document text around the FIRST occurrence of the
term, with the hit wrapped in ``[`` ``]``. This is the engine analog of
the reference UI's result presentation (truncated description +
highlighted matches in /root/reference/src/triage/ui_premium.py result
tables) as a deterministic, distributed operator.

Determinism contract (shared with the DuckDB oracle):
  * matching/ranking is over the NORMALIZED token array (tokenizer
    spec), counting exact token instances — "scan" never matches
    inside "scans", and adjacent occurrences each count;
  * the snippet position is the first occurrence of the term in
    lower(text) — guaranteed to exist because every token is a
    contiguous character run of the lowercased source (the tokenizer
    only inserts spaces and lowercases);
  * the snippet is cut from lower(text) on both engines, so byte
    offsets and content agree exactly.

Scale shape: candidates come from the inverted index (posting lists of
the query terms — selective prefilter), the snippet expression is pure
JVM string functions over only the top-ranked candidate rows. No
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from alertsage_spark.tokenizer import tokenize_col


def snippet_col(lowered: Column, term: Column, width: int = 30) -> Column:
    """``pre[hit]post`` window around the first occurrence of ``term``
    in ``lowered`` (1-based position arithmetic, identical in DuckDB)."""
    pos = F.instr(lowered, term)
    start = F.greatest(F.lit(1), pos - width)
    pre = lowered.substr(start, pos - start)
    hit = lowered.substr(pos, F.length(term))
    post = lowered.substr(pos + F.length(term), F.lit(width))
    return F.concat(pre, F.lit("["), hit, F.lit("]"), post)


def snippet_topdocs(
    docs: DataFrame,
    qterms: DataFrame,
    k: int = 3,
    width: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    index=None,
) -> DataFrame:
    """Top-k docs per query term by token-occurrence count, each with a
    highlight snippet.

    docs:   (doc_id, text)
    qterms: (query_id, term) — term must be tokenizer-normalized.
    index:  optional text-mode InvertedIndex over the SAME docs — the
            scale path the module docstring promises: candidates and
            occurrence counts come from the posting lists (tf IS the
            exact token-instance count the brute-force path recomputes),
            ranking runs over postings only, and the snippet expression
            evaluates over just the <= k x queries winning rows. Without
            it the corpus is tokenized per call (the r1-r5 shape, kept
            for index-less callers; results identical either way).
    Returns (query_id, term, doc_id, n_occ bigint, snip string,
    rank int) — rank is dense per (query_id, term).
    """
    if index is not None:
        if getattr(index, "mode", "text") != "text":
            raise ValueError("snippet_topdocs needs a text-mode index")
        cand = F.broadcast(qterms).join(
            index.postings.select(
                "term", "doc_id", F.col("tf").cast("bigint").alias("n_occ")
            ),
            "term",
        )
        w = Window.partitionBy("query_id", "term").orderBy(
            F.col("n_occ").desc(), F.col("doc_id").asc()
        )
        top = cand.withColumn("rank", F.row_number().over(w).cast("int")).filter(
            F.col("rank") <= k
        )
        return (
            docs.select(
                F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("lt")
            )
            .join(F.broadcast(top), "doc_id")
            .select(
                "query_id",
                "term",
                "doc_id",
                "n_occ",
                snippet_col(F.col("lt"), F.col("term"), width).alias("snip"),
                "rank",
            )
        )
    streamed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.col(text_col)).alias("lt"),
        tokenize_col(F.col(text_col)).alias("toks"),
    )
    # exact token-instance count (an ' x ' needle over the joined stream
    # undercounts ADJACENT occurrences: non-overlapping replace consumes
    # the shared boundary space)
    matched = streamed.join(
        F.broadcast(qterms), F.array_contains("toks", F.col("term"))
    ).select(
        "query_id",
        "term",
        "doc_id",
        F.size(F.filter("toks", lambda x: x == F.col("term")))
        .cast("bigint")
        .alias("n_occ"),
        snippet_col(F.col("lt"), F.col("term"), width).alias("snip"),
    )
    # top-k PER (query, term): a multi-term query must not let one
    # term's high-count docs evict another term's snippets
    w = Window.partitionBy("query_id", "term").orderBy(
        F.col("n_occ").desc(), F.col("doc_id").asc()
    )
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "term", "doc_id", "n_occ", "snip", "rank")
    )
