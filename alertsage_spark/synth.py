"""Deterministic synthetic corpora (pure Spark expressions, no external
data, identical content at any parallelism — safe for scaling runs).

The driver fixture corpus (testdata documents.parquet) has a tiny, flat
vocabulary: median df is ~77% of n_docs, i.e. every term is a stop word.
That is the one distribution where block-max pruning can never win, so
benchmarking WAND there only measures overhead. `zipf_corpus` provides
the realistic complement: a Zipf(1) vocabulary (p(rank) ~ 1/rank via the
inverse-CDF rank = floor(V^u)), giving genuinely selective tail terms —
the workload profile block-max indexes exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 1000003  # prime modulus for the xxhash64 -> uniform(0,1) step


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 30_000,
    doclen: int = 60,
    seed: int = 7,
    n_partitions: int = 64,
) -> DataFrame:
    """documents(doc_id, text) with Zipf(1)-distributed tokens t1..tV.

    Token for (doc i, slot j) = 't' + floor(V^u) with
    u = (xxhash64(i, j, seed) mod M)/M — deterministic in (i, j, seed),
    independent of partitioning, all JVM-side expressions.
    """
    j = F.sequence(F.lit(1), F.lit(doclen))

    def tok(jj):
        u = F.pmod(F.xxhash64(F.col("id"), jj, F.lit(seed)), F.lit(_M)) / float(_M)
        return F.concat(
            F.lit("t"), F.floor(F.pow(F.lit(float(vocab)), u)).cast("long").cast("string")
        )

    return (
        spark.range(n_docs)
        .repartition(n_partitions)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.transform(j, tok)).alias("text"),
        )
    )


def zipf_needle_queries(n: int = 12) -> list[tuple[str, str]]:
    """Rare-tail + stop-head query mix — the canonical WAND workload:
    two selective terms (df ~ 40-120 at 160k docs) plus the two most
    common terms (df ~ n_docs)."""
    return [
        (f"Z{i}", f"t{20000 + i * 37} t{12000 + i * 11} t1 t2") for i in range(n)
    ]
