"""Hybrid retrieval: BM25 (lexical) fused with embedding cosine
(semantic) by Reciprocal Rank Fusion (Cormack et al. 2009, public):

    rrf(d) = sum over rankings r of 1 / (k_const + rank_r(d))

The reference ships BOTH retrieval modes as separate UI paths
(keyword/filter search, ui_premium.py:4751-4761, and semantic search
via find_similar_incidents, ui_premium.py:5047-5068) with no fusion;
production search stacks fuse them, so the engine provides the fused
form as a first-class operator.

Determinism/oracle shape: both input rankings carry integer ranks, so
every RRF score is a sum of at most two exact reciprocals — two-term
double addition is order-independent, making the fusion bit-identical
across engines. The vector side here is the BRUTE-FORCE cosine over
the deterministic hashed-n-gram encoder (operators/encode.py), which
is exactly SQL-replicable (catalog.ft_hybrid_rrf hash-checks the whole
text -> {BM25, encode+cosine} -> RRF pipeline against DuckDB); at
corpus scale the vector leg swaps to lsh_ann_topk / ivf_ann_topk —
RRF only consumes (query_id, doc_id, rank), so the fusion is
retrieval-strategy-agnostic.

The query-side cross join is an 18-row broadcast against the encoded
corpus — the deliberate bounded brute-force baseline, same class as
the thresholds x scores sweep; never the candidate path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alertsage_spark.operators.encode import encode_py, encode_text
from alertsage_spark.operators.similarity import dot_col
from alertsage_spark.query.bm25 import bm25_topk

RRF_K = 60  # the standard Cormack et al. constant


def rrf_fuse(
    a: DataFrame, b: DataFrame, k: int = 10, k_const: int = RRF_K
) -> DataFrame:
    """Fuse two (query_id, doc_id, rank int) rankings; returns
    (query_id, doc_id, rrf double, rank int), top-k per query."""
    # union + one hash-agg instead of a full-outer join (r6): each doc
    # has at most one contribution per leg and two-term double addition
    # is order-independent, so sum-over-union is bit-identical to the
    # joined coalesce(a)+coalesce(b) while costing one narrow exchange
    # instead of two exchanges + sorts.
    ca = a.select(
        "query_id", "doc_id",
        (F.lit(1.0) / (F.lit(k_const) + F.col("rank"))).alias("c"),
    )
    cb = b.select(
        "query_id", "doc_id",
        (F.lit(1.0) / (F.lit(k_const) + F.col("rank"))).alias("c"),
    )
    fused = (
        ca.unionByName(cb)
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c"), 9).alias("rrf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "rank")
    )


def hybrid_rrf_ann(
    docs: DataFrame,
    queries: DataFrame,
    rel_index,
    k: int = 10,
    k_each: int = 20,
    k_const: int = RRF_K,
    enc_docs: DataFrame | None = None,
    n_tables: int = 8,
    bits_per_table: int = 4,
    seed: int = 42,
    sig_docs: DataFrame | None = None,
    text_ranked: DataFrame | None = None,
) -> DataFrame:
    """hybrid_rrf with the vector leg on the sign-LSH ANN index instead
    of brute-force cosine (r4 verdict task 3: the ANN swap was claimed
    — "RRF only consumes ranks" — but never exercised; this is the
    exercised form, and catalog.ft_hybrid_rrf_ann hash-certifies it).

    The vector leg ranks each query's top-k_each among its LSH
    CANDIDATES only (lsh_ann_topk_batch: signature equi-join, never a
    corpus scan per query), so the leg — and therefore the fusion —
    scales to corpora where brute force cannot run. sig_docs: a
    signature-carrying (doc_id, vec, sig_*) table from
    with_lsh_signatures at ingest (the production shape); computed
    inline when omitted. text_ranked: a precomputed
    (query_id, doc_id, rank) lexical ranking — pass WAND output over
    the compressed segment index for the full production composition
    (catalog.ft_hybrid_rrf_segwand); defaults to BM25 over rel_index."""
    from alertsage_spark.operators.encode import DIM
    from alertsage_spark.operators.similarity import (
        lsh_ann_topk_batch,
        with_lsh_signatures,
    )

    if text_ranked is None:
        text_ranked = bm25_topk(rel_index, queries, k=k_each).select(
            "query_id", "doc_id", "rank"
        )
    if sig_docs is None:
        enc_d = enc_docs if enc_docs is not None else encode_text(docs)
        # cache: lsh_ann_topk_batch consumes the signature table TWICE
        # (signature unpivot + vector projection) — uncached, the whole
        # encode+signature mapInPandas chain would execute twice per
        # action. Production callers pass a stored sig_docs instead
        # (and own its lifecycle); this inline fallback keeps the cache
        # for the session.
        sig_docs = with_lsh_signatures(
            enc_d, n_tables, bits_per_table, seed,
            id_col="doc_id", vec_col="vec", dim=DIM,
        ).cache()
    qlist = [
        (r["query_id"], encode_py(r["query_text"])) for r in queries.collect()
    ]
    vec_ranked = lsh_ann_topk_batch(
        sig_docs, qlist, k=k_each, id_col="doc_id", vec_col="vec",
        n_tables=n_tables, bits_per_table=bits_per_table, seed=seed,
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse(text_ranked, vec_ranked, k=k, k_const=k_const)


def hybrid_rrf(
    docs: DataFrame,
    queries: DataFrame,
    rel_index,
    k: int = 10,
    k_each: int = 20,
    k_const: int = RRF_K,
    enc_docs: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k_each ⊕ encoder-cosine top-k_each -> RRF top-k.

    docs: (doc_id, text); queries: (query_id, query_text);
    rel_index: the uncompressed relational index over the same docs.
    enc_docs: precomputed (doc_id, vec) from encode_text — the
    production shape (vectors are ingest-time artifacts, stored with
    the corpus); when omitted they are computed inline.
    """
    spark = docs.sparkSession
    text_ranked = bm25_topk(rel_index, queries, k=k_each).select(
        "query_id", "doc_id", "rank"
    )
    enc_d = enc_docs if enc_docs is not None else encode_text(docs)
    import pandas as pd

    qrows = queries.collect()
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [r["query_id"] for r in qrows],
                "qv": [encode_py(r["query_text"]) for r in qrows],
            }
        ),
        "query_id string, qv array<double>",
    )
    scored = enc_d.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        "doc_id",
        F.round(dot_col(F.col("vec"), F.col("qv")), 5).alias("cos"),
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id").asc()
    )
    vec_ranked = (
        scored.withColumn("rank", F.row_number().over(wv).cast("int"))
        .filter(F.col("rank") <= k_each)
        .select("query_id", "doc_id", "rank")
    )
    return rrf_fuse(text_ranked, vec_ranked, k=k, k_const=k_const)
