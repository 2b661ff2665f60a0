#!/usr/bin/env python
"""One scaling-run worker: build the index at a fixed parallelism level.

Invoked by run_scaling.py under `taskset -c 0-(N-1)` so the WHOLE process
tree (JVM threads, GC, Python workers) is bounded to N cores — the
sandbox stand-in for an N-executor cluster. Prints one JSON line per
trial plus a BEST line.

Usage: scale_worker.py <cpus> <replicate> <trials> [mode]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from alertsage_spark.session import get_spark
from alertsage_spark.index.segments import build_segments

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# shard count scales with corpus size (bounded shard size, like any real
# deployment); overridable for experiments
N_SHARDS = int(os.environ.get("SCALE_SHARDS", "0"))


def replicated(spark, rep: int, salt: str):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n0 = docs.count()
    reps = spark.range(rep).withColumnRenamed("id", "rep")
    c = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n0)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(salt)).alias("text"),
        )
        .repartition(128)
        .cache()
    )
    return c, n0 * rep


def main() -> None:
    cpus = int(sys.argv[1])
    rep = int(sys.argv[2])
    trials = int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "text"
    spark = get_spark(
        app_name=f"scale{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # warm up JIT + python workers with a small but complete build
    warm, _ = replicated(spark, 8, "w")
    warm.count()
    n_shards = N_SHARDS or max(64, (rep // 4) // 16 * 16 or 64)
    wd = tempfile.mkdtemp(dir="/dev/shm", prefix="warm_idx_")
    build_segments(spark, warm, wd, n_shards=n_shards, n_groups=1, resume=False, mode=mode)
    shutil.rmtree(wd, ignore_errors=True)
    warm.unpersist()

    corpus, n = replicated(spark, rep, "x")
    corpus.count()
    # ONE timed build per process: within-session shuffle-file buildup on
    # tmpfs distorts later trials, so run_scaling.py launches one process
    # per trial instead
    d = tempfile.mkdtemp(dir="/dev/shm", prefix="scale_idx_")
    t0 = time.monotonic()
    build_segments(
        spark, corpus, d, n_shards=n_shards, n_groups=1, resume=False, mode=mode
    )
    dt = time.monotonic() - t0
    shutil.rmtree(d, ignore_errors=True)
    r = {"cpus": cpus, "n_docs": n, "sec": round(dt, 2),
         "docs_per_sec": round(n / dt, 1)}
    print("BEST " + json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
