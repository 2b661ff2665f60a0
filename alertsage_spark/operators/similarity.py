"""Similarity search over dense embedding columns (array<float>).

Re-expresses the reference's numpy mat-vec cosine search
(/root/reference/src/triage/embeddings.py:118-145: corpus @ query,
argsort desc, top-k, threshold, exact-dup drop at 0.999) as Spark plans:

  * cosine_topk        — brute-force baseline: per-row dot product via
                         zip_with + aggregate (JVM higher-order fns,
                         float64 in-order accumulation), global
                         TakeOrderedAndProject top-k. Exact; O(N·d).
  * cosine_topk_pandas — Arrow-batched numpy variant (np.dot over the
                         batch matrix) for wide vectors; same results.
  * lsh_ann_topk       — random-hyperplane (sign) LSH buckets: probe only
                         rows sharing >= 1 of t hash-table buckets; the
                         scale path (candidates ~ buckets, not corpus).
  * pair/dup utilities — cosine >= threshold duplicate pairs (M5).

Vectors are expected L2-normalized (dot == cosine), matching the
reference contract (/root/reference/src/triage/embeddings.py:87-94).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """In-order float64 dot product of two array<float> columns —
    bit-identical to the DuckDB oracle's list_transform/list_sum form."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_exact: bool = False,
) -> DataFrame:
    """Brute-force top-k: (vec_id, score double) — exact baseline.

    The literal query vector is a constant folded into the plan (the
    broadcast degenerate case); orderBy+limit compiles to
    TakeOrderedAndProject: per-partition heaps, no global sort.
    ``exclude_exact`` reproduces the reference's self-match drop
    (score < 0.999, /root/reference/ui_premium.py:1360-1375).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(dot_col(F.col(vec_col), q), 5).alias("score"),
    )
    if exclude_exact:
        scored = scored.filter(F.col("score") < 0.999)
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(k)


def cosine_topk_pandas(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched numpy variant: per-batch matrix @ query (float64).

    Preferred for wide vectors (d >= 256) where per-element HOF expression
    evaluation loses to BLAS."""
    q = np.asarray(query_vec, dtype=np.float64)

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "score": np.round(mat @ q, 5)}
            )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        score_batches, schema="vec_id long, score double"
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-LSH signature as a long (bit i = sign(v · plane_i))."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(w)) for w in planes[i]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(planes.shape[0])
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    bits_per_table: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only rows colliding with the query in >= 1 of
    ``n_tables`` sign-LSH tables are scored.

    Defaults (8 tables x 4 bits) target weakly-clustered corpora (top-k
    cosines ~0.3): collision prob per table ~(1 - theta/pi)^bits, so
    fewer bits + more tables buys recall (measured 0.9-1.0 on the
    fixture) at the cost of larger candidate sets. For strongly clustered
    data raise bits_per_table to shrink candidates.

    At corpus scale the signature columns are precomputed and stored
    (partition/bucket by signature), so a query touches only matching
    buckets — candidate generation is a metadata filter, scoring is
    proportional to candidates. Here signatures are computed inline.
    """
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    cand = None
    for t in range(n_tables):
        planes = hyperplanes(dim, bits_per_table, seed=seed + 1000 * t)
        qsig = int(sum((1 << i) for i in range(bits_per_table) if float(planes[i] @ q) > 0))
        hit = embeddings.filter(signature_col(F.col(vec_col), planes) == F.lit(qsig))
        cand = hit if cand is None else cand.unionByName(hit)
    cand = cand.dropDuplicates([id_col])
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    bits_per_table: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the reference's M5 operator,
    sim >= 0.90) via LSH bucket self-join + exact cosine verify —
    no all-pairs crossJoin."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    pairs = None
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    for t in range(n_tables):
        planes = hyperplanes(dim, bits_per_table, seed=seed + 1000 * t)
        sig = base.select("vec_id", "emb", signature_col(F.col("emb"), planes).alias("sig"))
        x, y = sig.alias("x"), sig.alias("y")
        p = x.join(
            y,
            (F.col("x.sig") == F.col("y.sig")) & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            F.round(dot_col(F.col("x.emb"), F.col("y.emb")), 5).alias("cosine"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
