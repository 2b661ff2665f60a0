"""Boolean (must / should / must_not) retrieval with BM25 ranking.

Lucene-style boolean clause semantics over the same inverted index as
bm25.py — the query surface the reference approximates with its keyword
evidence gates (/root/reference/src/triage/cli.py:641-1068: required
keyword presence gates + downgrade lists are exactly must / must_not
semantics applied post-hoc; here they are first-class retrieval
clauses evaluated inside the index):

  * ``must``      — every clause term must appear in the doc; scores.
  * ``should``    — optional; adds score when present.
  * ``must_not``  — any doc containing the term is excluded; never scores.

A document qualifies iff it contains ALL must terms, NO must_not term,
and — when the query has no must clause — at least one should term.
Score = sum of BM25 (k1=1.2, b=0.75) term scores over the matched
must+should terms; ranking/tie-break identical to ``bm25_topk``
(round(score, 6) desc, doc_id asc).

Plan shape (the 100 TB path): the clause table is tiny and BROADCAST to
the postings scan; ONE hash aggregation per (query_id, doc_id) computes
the score, the matched-must count and the must_not flag in the same
pass — the exclusion list never becomes a second join against the big
side. The per-query required-must count joins back broadcast. Total
shuffles: the single (query_id, doc_id) aggregation any scored
retrieval already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alertsage_spark.index.build import InvertedIndex

ROLES = ("must", "should", "must_not")


def clauses_df(spark, queries: list[tuple[str, dict[str, list[str]]]]) -> DataFrame:
    """Build the clause table from [(query_id, {role: [term, ...]})].

    Terms must already be tokenizer-normalized and distinct per
    (query_id, term) — a term listed under two roles of the same query
    would double-join its postings.
    """
    rows = []
    for qid, roles in queries:
        seen: set[str] = set()
        for role, terms in roles.items():
            if role not in ROLES:
                raise ValueError(f"unknown boolean role: {role}")
            for t in terms:
                if t in seen:
                    raise ValueError(f"duplicate term {t!r} in query {qid}")
                seen.add(t)
                rows.append((qid, t, role))
    from alertsage_spark.session import local_df

    return local_df(spark, rows, "query_id string, term string, role string")


def boolean_qualified(index: InvertedIndex, clauses: DataFrame) -> DataFrame:
    """Qualifying (query_id, doc_id, score) rows — no cutoff, no rank.
    The building block for boolean_topk and the query-language search
    (parse.py), which post-filters before ranking."""
    from alertsage_spark.query.bm25 import term_score_rows

    # clauses_df guarantees one row per (query_id, term) and postings
    # hold one row per (term, doc_id), so every counted row below is
    # distinct by construction — plain conditional counts replace the
    # former count_distinct aggregations, dropping Spark's
    # distinct-aggregate Expand + second aggregation pass (r6).
    required = clauses.filter(F.col("role") == "must").groupBy("query_id").agg(
        F.count("term").alias("n_must")
    )
    # the ONE scoring join shape (bm25.py); `role` rides along
    scored = term_score_rows(index, clauses).withColumn(
        "term_score",
        F.when(F.col("role") != "must_not", F.col("term_score")).otherwise(
            F.lit(0.0)
        ),
    )
    agg = (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count(
                F.when(F.col("role") == "must", F.lit(1))
            ).alias("must_hits"),
            F.max((F.col("role") == "must_not").cast("int")).alias("excluded"),
        )
    )
    return (
        agg.join(F.broadcast(required), "query_id", "left")
        .withColumn("n_must", F.coalesce("n_must", F.lit(0)))
        .filter(
            (F.col("excluded") == 0)
            & (F.col("must_hits") == F.col("n_must"))
            # no must clauses -> the doc is here via >=1 should match,
            # whose BM25 contribution is strictly positive
            & ((F.col("n_must") > 0) | (F.col("score") > 0))
        )
        .select("query_id", "doc_id", "score")
    )


def boolean_topk(index: InvertedIndex, clauses: DataFrame, k: int = 10) -> DataFrame:
    """Top-k per query: (query_id, doc_id, score double, rank int)."""
    qualified = boolean_qualified(index, clauses)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        qualified.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )
