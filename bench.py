#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Workload at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Every reported key is the MEDIAN of
$BENCH_REPS (default 3) repetitions, each rep re-deriving its plan
(Spark 4.1 can reuse results for a re-collected identical DataFrame),
so one noisy rep can't define the round.

Section discipline (the r02 lesson — a mid-bench synthetic build
inflated downstream keys up to 4.6x in the driver's run):
  1. an UNTIMED warm-up build+query first (JIT/codegen warm-up distorts
     first-run timings 2-4x on this host);
  2. all sf-based sections next (index build, WAND/TAAT batch + single,
     exact BM25, relational suite, dedup, cosine);
  3. synthetic-corpus sections LAST (Zipf needle, then the code corpus
     — its 16k-identifier trigram vocabulary is the worst polluter);
  4. spark.catalog.clearCache() + artifact cleanup between sections.

Keys:
  * index_build        — compressed segment build (two-pass, manifest)
                         over a deterministic 16x-replicated documents
                         corpus; docs/sec in `extra`.
  * bm25_batch18_{wand,taat,auto} — all 18 reference queries, one job.
  * bm25_single_p50/p99— per-query serving latency over the 18 queries
                         (fast-path hit rate in `extra`).
  * exact_bm25_build_and_batch18 — pure-JVM join+agg BM25 path.
  * rel_suite          — representative relational queries.
  * dedup_minhash / sim_cosine_topk — training-data pipeline ops.
  * bm25_zipf_needle_* — WAND-vs-TAAT on a Zipf corpus (selective terms).
  * code_index_build / code_query_p50/p99 — the north-star code workload.

Env:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_REPLICATE      corpus replication factor for index build (default 16)
  BENCH_REPS           repetitions per key (default 3, median reported)
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
from alertsage_spark.query import wand as wand_mod  # noqa: E402
from alertsage_spark.query.wand import wand_topk  # noqa: E402
from alertsage_spark import catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "16"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
TMP_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else None


def median(ts: list[float]) -> float:
    return round(float(np.median(ts)), 3)


def timed(fn, reps: int = REPS) -> list[float]:
    """Run fn reps times, return the raw durations (caller medians)."""
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return ts


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
    extra: dict[str, float | int] = {}
    ref_queries = [(cid, text) for cid, _l, text in REFERENCE_QUERIES]

    # ---- 0. UNTIMED warm-up: small build + both query kernels + the
    #      exact join path, so JIT/codegen/Arrow costs land here ----
    wdocs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    wdir = tempfile.mkdtemp(prefix="bench_warm_", dir=TMP_ROOT)
    build_segments(spark, wdocs, wdir, n_shards=8, n_groups=1, resume=False)
    widx = load_index(spark, wdir).prepare_for_queries()
    for algo in ("wand", "taat"):
        wand_topk(spark, widx, ref_queries[:4], k=10, algo=algo).collect()
    bm25_topk(build_index(wdocs, "doc_id", "text"), queries_df(spark), k=10).collect()
    widx.segments.unpersist()
    shutil.rmtree(wdir, ignore_errors=True)
    # code-mode warm-up too: the trigram vocab mapping + batch encoder
    # JIT separately (measured: first code build 29 s vs 8 s warm)
    from alertsage_spark.sources.code_corpus import prepare_code_corpus
    from alertsage_spark.synth import code_corpus

    wcc = code_corpus(spark, 4_000, doclen=40)
    wcdocs, _wfid = prepare_code_corpus(wcc)
    wcdir = tempfile.mkdtemp(prefix="bench_warmc_", dir=TMP_ROOT)
    build_segments(spark, wcdocs, wcdir, n_shards=4, n_groups=1,
                   mode="code", resume=False)
    shutil.rmtree(wcdir, ignore_errors=True)
    spark.catalog.clearCache()

    # ---- 1. index build (compressed segments, manifest) ----
    corpus, n_docs = replicated_corpus(spark)
    corpus = corpus.cache()
    corpus.count()  # materialize input outside the timed region
    build_dirs: list[str] = []

    def one_build():
        d = tempfile.mkdtemp(prefix="bench_idx_", dir=TMP_ROOT)
        build_dirs.append(d)
        # n_shards FIXED (not a function of CPUS) so the N-vs-4N scaling
        # runs execute the identical job on the identical input
        build_segments(spark, corpus, d, n_shards=64, n_groups=1, resume=False)

    t_builds = timed(one_build)
    t_build = float(np.median(t_builds))
    queries["index_build"] = round(t_build, 3)
    extra["index_docs_per_sec"] = round(n_docs / t_build, 1)
    extra["n_docs_indexed"] = n_docs
    extra["index_build_reps"] = [round(t, 3) for t in t_builds]
    # serve from the LAST build; delete the others
    idx_dir = build_dirs.pop()
    for d in build_dirs:
        shutil.rmtree(d, ignore_errors=True)
    seg_index = load_index(spark, idx_dir).prepare_for_queries()
    man = spark.read.parquet(seg_index.paths.manifest).agg(
        F.sum("n_postings").alias("p"), F.sum("doc_bytes").alias("db"),
        F.sum("tf_bytes").alias("tb")
    ).collect()[0]
    extra["postings_per_sec"] = round(int(man["p"]) / t_build, 1)
    extra["bytes_compressed"] = int(man["db"]) + int(man["tb"])

    # ---- 2. batch query latency, algos interleaved rep-by-rep ----
    batch: dict[str, list[float]] = {"wand": [], "taat": [], "auto": []}
    for _ in range(REPS):
        for algo in ("wand", "taat", "auto"):
            t0 = time.monotonic()
            wand_topk(spark, seg_index, ref_queries, k=10, algo=algo).collect()
            batch[algo].append(time.monotonic() - t0)
    for algo, ts in batch.items():
        queries[f"bm25_batch18_{algo}"] = median(ts)

    # ---- 3. single-query serving latency (auto = prod path) ----
    wand_mod.reset_serving_counters()
    lats = []
    for _ in range(REPS):
        for cid, text in ref_queries:
            t0 = time.monotonic()
            wand_topk(spark, seg_index, [(cid, text)], k=10, algo="auto").collect()
            lats.append(time.monotonic() - t0)
    queries["bm25_single_p50"] = round(float(np.percentile(lats, 50)), 3)
    queries["bm25_single_p99"] = round(float(np.percentile(lats, 99)), 3)
    counters = wand_mod.reset_serving_counters()
    extra["single_fast_path_hits"] = counters["fast_path"]
    extra["single_distributed"] = counters["distributed"]
    # staleness-guard cost (per-query group-dir listing): if this ever
    # becomes a visible share of p50, swap the glob for an mtime probe
    n_calls = counters["fast_path"] + counters["distributed"]
    extra["staleness_probe_ms_per_query"] = round(
        counters["probe_ns"] / 1e6 / max(n_calls, 1), 4
    )
    seg_index.segments.unpersist()
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.catalog.clearCache()

    # ---- 4. exact join+agg BM25 (pure-JVM path, index built on the fly) ----
    def one_exact():
        rel_index = build_index(corpus, "doc_id", "text")
        bm25_topk(rel_index, queries_df(spark), k=10).collect()

    queries["exact_bm25_build_and_batch18"] = median(timed(one_exact))
    corpus.unpersist()
    spark.catalog.clearCache()

    # ---- 5. relational suite ----
    rel = [
        "rel_join_chain", "rel_agg_count_avg", "rel_window_topk_group",
        "rel_agg_rollup", "rel_filter_range", "rel_time_window",
    ]

    def one_rel():
        for name in rel:
            catalog.queries()[name](spark, SF_DIR).collect()

    queries["rel_suite"] = median(timed(one_rel))

    # ---- 6. training-data pipeline ops ----
    queries["dedup_minhash"] = median(timed(
        lambda: catalog.queries()["dedup_minhash_candidates"](spark, SF_DIR).count()
    ))
    queries["sim_cosine_topk"] = median(timed(
        lambda: catalog.queries()["sim_cosine_topk"](spark, SF_DIR).collect()
    ))

    # training-pipeline suite (r3 ops), one pass each per rep.
    # dedup_components is excluded: its per-iteration label-propagation
    # jobs are scheduling-dominated at fixture scale (~8 s for 22
    # pairs), which would measure the Spark scheduler, not the operator.
    pipe = [
        "pipe_decontaminate", "pipe_repetition_filter",
        "pipe_split_train_val", "pipe_pack_sequences",
    ]

    def one_pipe():
        for name in pipe:
            catalog.queries()[name](spark, SF_DIR).collect()

    queries["pipeline_suite"] = median(timed(one_pipe))

    # fulltext query-surface suite (r3 ops), one pass each per rep:
    # boolean must/should/must_not, SymSpell fuzzy suggest, snippets,
    # trigram substring+prefix search, facets, BM25F (incl. its build).
    surface = [
        "ft_boolean_search", "ft_fuzzy_suggest", "ft_snippet_topdocs",
        "ft_substring_search", "ft_prefix_search", "ft_search_facets",
        "ft_bm25f_topk",
    ]

    def one_surface():
        for name in surface:
            catalog.queries()[name](spark, SF_DIR).collect()

    t_surface = timed(one_surface)
    queries["query_surface_suite"] = median(t_surface)
    extra["surface_reps"] = [round(t, 3) for t in t_surface]

    # hybrid BM25 ⊕ encoder-cosine RRF (r4) — its own key so the
    # cross-round query_surface_suite comparison stays apples-to-apples
    queries["hybrid_rrf"] = median(timed(
        lambda: catalog.queries()["ft_hybrid_rrf"](spark, SF_DIR).collect()
    ))
    spark.catalog.clearCache()

    # ---- 7. SYNTHETIC sections from here on (zipf, then code last):
    #      their builds/vocabularies pollute JVM/session state ----
    from alertsage_spark.synth import zipf_corpus, zipf_needle_queries

    zc = zipf_corpus(spark, 160_000).cache()
    zc.count()
    zdir = tempfile.mkdtemp(prefix="bench_zipf_", dir=TMP_ROOT)
    build_segments(spark, zc, zdir, n_shards=8, n_groups=1, resume=False)
    zidx = load_index(spark, zdir)
    zqs = zipf_needle_queries(12)
    for algo in ("taat", "wand"):  # warm both kernels on this corpus
        wand_topk(spark, zidx, zqs, k=10, algo=algo).collect()
    zbatch: dict[str, list[float]] = {"wand": [], "taat": [], "auto": []}
    for _ in range(REPS):
        for algo in ("wand", "taat", "auto"):
            t0 = time.monotonic()
            wand_topk(spark, zidx, zqs, k=10, algo=algo).collect()
            zbatch[algo].append(time.monotonic() - t0)
    for algo, ts in zbatch.items():
        queries[f"bm25_zipf_needle_{algo}"] = median(ts)
    zc.unpersist()
    shutil.rmtree(zdir, ignore_errors=True)
    spark.catalog.clearCache()

    # ---- 8. code corpus LAST (the north-star workload: code-aware
    #      tokenizer with trigram expansion over (repo, path, commit,
    #      lang, content) rows, then identifier queries) ----
    cc = code_corpus(spark, 100_000).cache()
    cc.count()
    cdocs, cfid = prepare_code_corpus(cc)
    code_build_dirs: list[str] = []

    def one_code_build():
        d = tempfile.mkdtemp(prefix="bench_code_", dir=TMP_ROOT)
        code_build_dirs.append(d)
        # 32 shards, FIXED: 16 left half the cores idle through the
        # fat applyInPandas shard stage and any straggler doubled the
        # tail (measured 9-17 s unstable); 32 is one task per core and
        # stable ~6.7 s; 64 pays two waves + per-task overhead (13 s)
        build_segments(spark, cdocs, d, n_shards=32, n_groups=1, mode="code",
                       resume=False, fidelity_hashes=cfid)

    # One UNTIMED full-size build first: the section-0 code warm-up is
    # 25x smaller and ~30 s of other workloads old by now — the hot
    # applyInPandas/encoder loops only reach steady-state JIT at this
    # corpus size (measured reps without this: 22/13/8 s; the 22 is
    # warm-up, not the engine).
    one_code_build()
    shutil.rmtree(code_build_dirs.pop(), ignore_errors=True)

    t_codes = timed(one_code_build)
    t_code = float(np.median(t_codes))
    queries["code_index_build"] = round(t_code, 3)
    extra["code_docs_per_sec"] = round(100_000 / t_code, 1)
    extra["code_build_reps"] = [round(t, 3) for t in t_codes]
    cdir = code_build_dirs.pop()
    for d in code_build_dirs:
        shutil.rmtree(d, ignore_errors=True)
    cidx = load_index(spark, cdir).prepare_for_queries()
    code_qs = [
        ("C1", "parseConfig17"), ("C2", "spark deltaEncode42"),
        ("C3", "blockMax"), ("C4", "read_buffer_7 mergeSegments101"),
        ("C5", "shardRouter250 token_norm_33"), ("C6", "queryPlanner499"),
    ]
    wand_topk(spark, cidx, code_qs, k=10, algo="auto").collect()  # warm
    wand_mod.reset_serving_counters()
    clats = []
    for _ in range(REPS):
        for cq in code_qs:
            t0 = time.monotonic()
            wand_topk(spark, cidx, [cq], k=10, algo="auto").collect()
            clats.append(time.monotonic() - t0)
    queries["code_query_p50"] = round(float(np.percentile(clats, 50)), 3)
    queries["code_query_p99"] = round(float(np.percentile(clats, 99)), 3)
    ccount = wand_mod.reset_serving_counters()
    extra["code_fast_path_hits"] = ccount["fast_path"]
    extra["code_distributed"] = ccount["distributed"]
    cc.unpersist()
    shutil.rmtree(cdir, ignore_errors=True)

    out = {
        "metric": "alertsage_spark_bench_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "reps": REPS,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
