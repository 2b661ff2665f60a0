#!/usr/bin/env python
"""Per-operator isolation bench (guide §1.4): times single catalog ops
with the noop sink and dumps .explain("formatted") plans.

This file is SEPARATE from the frozen bench.py (the driver times that);
numbers here are cited in OPTIMIZATION_r06.md only.

Usage:
  python bench_extra.py ops ft_substring_search ft_bm25f_topk   # time ops
  python bench_extra.py plan ft_bm25f_topk out.txt              # dump plan
  python bench_extra.py exact                                    # exact bm25 section probe
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def _spark():
    from alertsage_spark.session import get_spark

    return get_spark(
        app_name="alertsage_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_ops(names: list[str]) -> None:
    from alertsage_spark import catalog

    spark = _spark()
    out = {}
    for name in names:
        fn = catalog.queries()[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).collect()  # warm (JIT, fills the catalog caches)
        ts = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).collect()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = ts
        print(json.dumps({name: ts}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


def dump_plan(name: str, path: str) -> None:
    from alertsage_spark import catalog

    spark = _spark()
    fn = catalog.queries()[name]
    fn(spark, SF_DIR).collect()  # fill caches so the plan is the hot-path plan
    df = fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


def exact_probe() -> None:
    """Replicates bench.py sec_exact: build_index + bm25 batch18 on the
    16x replicated corpus, with per-phase splits."""
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from alertsage_spark.index.build import build_index
    from alertsage_spark.query.bm25 import bm25_topk
    from alertsage_spark.query.refqueries import queries_df

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    reps = spark.range(16).withColumnRenamed("id", "rep")
    corpus = (
        docs.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"), "text")
        .repartition(128)
    ).cache()
    corpus.count()

    def one_exact():
        t0 = time.monotonic()
        rel_index = build_index(corpus, "doc_id", "text")
        t1 = time.monotonic()
        bm25_topk(rel_index, queries_df(spark), k=10).collect()
        t2 = time.monotonic()
        return (round(t1 - t0, 3), round(t2 - t1, 3))

    one_exact()  # warm
    splits = [one_exact() for _ in range(REPS)]
    print("RESULT " + json.dumps({"exact_build_query_splits": splits}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "ops":
        time_ops(sys.argv[2:])
    elif cmd == "plan":
        dump_plan(sys.argv[2], sys.argv[3])
    elif cmd == "exact":
        exact_probe()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
