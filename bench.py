#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Workload at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:
  * index_build        — compressed segment build (two-pass, manifest)
                         over a deterministic 16x-replicated documents
                         corpus (so the job is big enough to measure);
                         reports docs/sec in `extra`.
  * bm25_batch18       — all 18 reference queries, one job (WAND path).
  * bm25_single_p50/p99— per-query latency over the 18 queries run
                         individually (compressed index, WAND).
  * exact_bm25_batch18 — the pure-JVM join+agg BM25 path (no UDFs).
  * rel_suite          — representative relational queries (join, agg,
                         window, rollup) at the bench SF.
  * dedup_minhash      — MinHash-LSH candidate pairs over documents.
  * sim_cosine_topk    — brute-force cosine top-10 over embeddings.
  * bm25_zipf_needle_* — WAND-vs-TAAT on a Zipf corpus (selective terms).
  * code_index_build / code_query_p50/p99 — the north-star code workload:
                         (repo, path, commit, lang, content) ingest,
                         code-mode (identifier+trigram) build, long-tail
                         identifier queries. Runs LAST: its 16k-identifier
                         trigram vocabulary pollutes JVM/session state for
                         anything timed after it.

Env:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_REPLICATE      corpus replication factor for index build (default 16)
  BENCH_JSON_EXTRA     if '1', include throughput details in the JSON
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from alertsage_spark.session import get_spark  # noqa: E402
from alertsage_spark.index.build import build_index  # noqa: E402
from alertsage_spark.index.segments import build_segments, load_index  # noqa: E402
from alertsage_spark.query.bm25 import bm25_topk  # noqa: E402
from alertsage_spark.query.refqueries import REFERENCE_QUERIES, queries_df  # noqa: E402
from alertsage_spark.query.wand import wand_topk  # noqa: E402
from alertsage_spark import catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "16"))


def replicated_corpus(spark):
    """Deterministic big corpus: documents x REPLICATE with distinct ids.
    Identical content regardless of parallelism (scaling-run input)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    reps = spark.range(REPLICATE).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"), "text")
        # the single parquet file reads as 1-2 partitions; spread the
        # synthesized corpus so every stage starts wide
        .repartition(128)
    ), n * REPLICATE


def main() -> None:
    spark = get_spark(app_name="alertsage_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---- index build (compressed segments, manifest) ----
    corpus, n_docs = replicated_corpus(spark)
    corpus = corpus.cache()
    corpus.count()  # materialize input outside the timed region
    idx_dir = tempfile.mkdtemp(
        prefix="bench_idx_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    t0 = time.monotonic()
    # n_shards FIXED (not a function of CPUS) so the N-vs-4N scaling runs
    # execute the identical job on the identical input
    build_segments(
        spark, corpus, idx_dir, n_shards=64, n_groups=1, resume=False
    )
    t_build = time.monotonic() - t0
    queries["index_build"] = round(t_build, 3)
    extra["index_docs_per_sec"] = round(n_docs / t_build, 1)
    extra["n_docs_indexed"] = n_docs
    seg_index = load_index(spark, idx_dir).prepare_for_queries()
    man = spark.read.parquet(seg_index.paths.manifest).agg(
        F.sum("n_postings").alias("p"), F.sum("doc_bytes").alias("db"),
        F.sum("tf_bytes").alias("tb")
    ).collect()[0]
    extra["postings_per_sec"] = round(int(man["p"]) / t_build, 1)
    extra["bytes_compressed"] = int(man["db"]) + int(man["tb"])

    ref_queries = [(cid, text) for cid, _l, text in REFERENCE_QUERIES]

    # ---- batch query latency (WAND over compressed segments) ----
    t0 = time.monotonic()
    wand_topk(spark, seg_index, ref_queries, k=10, algo="wand").collect()
    queries["bm25_batch18_wand"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    wand_topk(spark, seg_index, ref_queries, k=10, algo="taat").collect()
    queries["bm25_batch18_taat"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    wand_topk(spark, seg_index, ref_queries, k=10, algo="auto").collect()
    queries["bm25_batch18_auto"] = round(time.monotonic() - t0, 3)

    # ---- single-query latency distribution (auto scorer = prod path) ----
    lats = []
    for cid, text in ref_queries:
        t0 = time.monotonic()
        wand_topk(spark, seg_index, [(cid, text)], k=10, algo="auto").collect()
        lats.append(time.monotonic() - t0)
    queries["bm25_single_p50"] = round(float(np.percentile(lats, 50)), 3)
    queries["bm25_single_p99"] = round(float(np.percentile(lats, 99)), 3)

    # ---- Zipf needle workload (selective + stop terms: the WAND case;
    #      the fixture corpus is all-stopwords, where TAAT must win) ----
    from alertsage_spark.synth import zipf_corpus, zipf_needle_queries

    zc = zipf_corpus(spark, 160_000).cache()
    zc.count()
    zdir = tempfile.mkdtemp(
        prefix="bench_zipf_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    build_segments(spark, zc, zdir, n_shards=8, n_groups=1, resume=False)
    zidx = load_index(spark, zdir)
    zqs = zipf_needle_queries(12)
    for algo in ("taat", "wand"):  # warm both kernels
        wand_topk(spark, zidx, zqs, k=10, algo=algo).collect()
    for algo in ("wand", "taat", "auto"):
        t0 = time.monotonic()
        wand_topk(spark, zidx, zqs, k=10, algo=algo).collect()
        queries[f"bm25_zipf_needle_{algo}"] = round(time.monotonic() - t0, 3)
    zc.unpersist()
    shutil.rmtree(zdir, ignore_errors=True)

    # ---- exact join+agg BM25 (pure-JVM path, index built on the fly) ----
    t0 = time.monotonic()
    rel_index = build_index(corpus, "doc_id", "text")
    bm25_topk(rel_index, queries_df(spark), k=10).collect()
    queries["exact_bm25_build_and_batch18"] = round(time.monotonic() - t0, 3)

    # ---- relational suite ----
    rel = [
        "rel_join_chain", "rel_agg_count_avg", "rel_window_topk_group",
        "rel_agg_rollup", "rel_filter_range", "rel_time_window",
    ]
    t0 = time.monotonic()
    for name in rel:
        catalog.queries()[name](spark, SF_DIR).collect()
    queries["rel_suite"] = round(time.monotonic() - t0, 3)

    # ---- training-data pipeline ops ----
    t0 = time.monotonic()
    catalog.queries()["dedup_minhash_candidates"](spark, SF_DIR).count()
    queries["dedup_minhash"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    catalog.queries()["sim_cosine_topk"](spark, SF_DIR).collect()
    queries["sim_cosine_topk"] = round(time.monotonic() - t0, 3)

    # ---- code corpus (the north-star workload: code-aware tokenizer
    #      with trigram expansion over (repo, path, commit, lang,
    #      content) rows, then identifier + partial-identifier queries) ----
    from alertsage_spark.sources.code_corpus import prepare_code_corpus
    from alertsage_spark.synth import code_corpus

    cc = code_corpus(spark, 100_000).cache()
    cc.count()
    cdocs, cfid = prepare_code_corpus(cc)
    cdir = tempfile.mkdtemp(
        prefix="bench_code_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    t0 = time.monotonic()
    build_segments(
        spark, cdocs, cdir, n_shards=16, n_groups=1, mode="code",
        resume=False, fidelity_hashes=cfid,
    )
    t_code = time.monotonic() - t0
    queries["code_index_build"] = round(t_code, 3)
    extra["code_docs_per_sec"] = round(100_000 / t_code, 1)
    cidx = load_index(spark, cdir).prepare_for_queries()
    code_qs = [
        ("C1", "parseConfig17"), ("C2", "spark deltaEncode42"),
        ("C3", "blockMax"), ("C4", "read_buffer_7 mergeSegments101"),
        ("C5", "shardRouter250 token_norm_33"), ("C6", "queryPlanner499"),
    ]
    wand_topk(spark, cidx, code_qs, k=10, algo="auto").collect()  # warm
    lats = []
    for cq in code_qs:
        t0 = time.monotonic()
        wand_topk(spark, cidx, [cq], k=10, algo="auto").collect()
        lats.append(time.monotonic() - t0)
    queries["code_query_p50"] = round(float(np.percentile(lats, 50)), 3)
    queries["code_query_p99"] = round(float(np.percentile(lats, 99)), 3)
    cc.unpersist()
    shutil.rmtree(cdir, ignore_errors=True)


    shutil.rmtree(idx_dir, ignore_errors=True)

    out = {
        "metric": "alertsage_spark_bench_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
