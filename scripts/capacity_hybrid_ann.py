#!/usr/bin/env python
"""Capacity probe: hybrid RRF retrieval with the ANN vector leg at the
1.28M-doc point (the corpus size where r4 established the serving
fast-path hands over to the distributed path).

Measures, at documents x 256 (sf0.1 -> 1,280,000 docs):
  * encode_throughput  — encode_text over the corpus (vectorized kernel)
  * signature_build    — with_lsh_signatures one-pass matmul
  * bm25_leg           — batch-18 BM25 over the relational index
  * ann_leg            — lsh_ann_topk_batch for all 18 queries
  * hybrid_rrf_ann     — the fused end-to-end query (both legs + fusion)

Prints one JSON line; run AFTER bench/scaling (nothing else on Spark).
Usage: python scripts/capacity_hybrid_ann.py [replicate=256]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from alertsage_spark.session import get_spark  # noqa: E402
from alertsage_spark.index.build import build_index  # noqa: E402
from alertsage_spark.operators.encode import DIM, encode_py, encode_text  # noqa: E402
from alertsage_spark.operators.similarity import (  # noqa: E402
    lsh_ann_topk_batch,
    with_lsh_signatures,
)
from alertsage_spark.query.bm25 import bm25_topk  # noqa: E402
from alertsage_spark.query.hybrid import hybrid_rrf_ann  # noqa: E402
from alertsage_spark.query.refqueries import REFERENCE_QUERIES, queries_df  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main() -> None:
    spark = get_spark(app_name="capacity_hybrid_ann", master="local[32]",
                      shuffle_partitions=64)
    out: dict = {"replicate": REPLICATE}
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n0 = docs0.count()
    reps = spark.range(REPLICATE).withColumnRenamed("id", "rep")
    docs = (
        docs0.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * F.lit(n0)).alias("doc_id"), "text")
        .repartition(128)
        .cache()
    )
    n_docs = docs.count()
    out["n_docs"] = n_docs
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]

    # small warm-up so JIT/Arrow costs stay out of the timed regions
    encode_text(docs0).select(F.sum(F.size("vec"))).collect()

    t0 = time.monotonic()
    enc = encode_text(docs).cache()
    enc.count()
    out["encode_sec"] = round(time.monotonic() - t0, 2)
    out["encode_mchars_per_sec"] = round(n_chars / out["encode_sec"] / 1e6, 1)

    t0 = time.monotonic()
    sig = with_lsh_signatures(enc, 8, 4, 42, id_col="doc_id", vec_col="vec",
                              dim=DIM).cache()
    sig.count()
    out["signature_build_sec"] = round(time.monotonic() - t0, 2)

    rel_index = build_index(docs, "doc_id", "text")
    qs = queries_df(spark)
    bm25_topk(rel_index, qs, k=20).collect()  # warm + materialize index
    t0 = time.monotonic()
    bm25_topk(rel_index, qs, k=20).collect()
    out["bm25_leg_sec"] = round(time.monotonic() - t0, 2)

    qlist = [(cid, encode_py(text)) for cid, _l, text in REFERENCE_QUERIES]
    lsh_ann_topk_batch(sig, qlist[:2], k=20, id_col="doc_id", vec_col="vec").collect()
    t0 = time.monotonic()
    ann = lsh_ann_topk_batch(sig, qlist, k=20, id_col="doc_id", vec_col="vec")
    n_ann = ann.count()
    out["ann_leg_sec"] = round(time.monotonic() - t0, 2)
    out["ann_rows"] = n_ann

    t0 = time.monotonic()
    fused = hybrid_rrf_ann(docs, qs, rel_index, k=10, k_each=20, sig_docs=sig)
    out["hybrid_rows"] = fused.count()
    out["hybrid_rrf_ann_sec"] = round(time.monotonic() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
