"""SparkSession factory tuned for the engine.

Local mode is the test harness; the conf set is chosen to also be correct
on a real multi-executor cluster (AQE on, Arrow on, sane shuffle
parallelism). On a 1000-executor cluster the same builder is used with
``master`` unset (picked up from spark-submit) and shuffle partitions
sized to ~2-3x total cores.
"""

from __future__ import annotations

import os
from collections import deque

from pyspark.sql import SparkSession


def local_df(spark: SparkSession, rows, schema: str):
    """Small driver-side literal relation as ONE Arrow local batch.

    ``createDataFrame(list)`` parallelizes even an 18-row query set into
    a defaultParallelism-task RDD scan: every action pays ~0.3s of pure
    task scheduling on local[32], and every join/broadcast whose child
    is the literal relation pays the same stage again. The pandas path
    plans as a LocalTableScan (~25ms, measured 11x faster to collect)
    and broadcasts without a scan stage. Schema names/types apply
    positionally to the row tuples, exactly like createDataFrame(list).
    Callers pass fixed NON-EMPTY literal sets (an empty pandas frame
    falls back to the parallelize path, same as an empty list)."""
    import pandas as pd

    rows = list(rows)
    if not rows:  # empty pandas frames can't carry the schema — keep
        # the createDataFrame([]) semantics for the degenerate case
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.DataFrame(rows), schema)


def spread_small_scan(df, probe=None):
    """Round-robin repartition to defaultParallelism — ONLY when the
    input has fewer partitions (r6): a single-file parquet fixture scans
    as 1-2 partitions, which serializes every map-side-heavy consumer
    (tokenize, shingle explode, minhash kernels) onto 1-2 cores while
    the rest idle. At corpus scale inputs already carry >= parallelism
    partitions and this is a no-op — never a blanket shuffle.

    ``probe``: DataFrame whose partition count to inspect (default
    ``df``). Pass the underlying plain SCAN when ``df`` contains joins:
    .rdd on an adaptive plan with exchanges materializes its query
    stages eagerly — the probe must stay a metadata-only question."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def persist_bounded(df, registry: deque, keep: int = 2):
    """persist() with a bounded per-site registry: operators that
    materialize a per-call intermediate (postings at build, minhash
    bands, shingle tables) call this so repeated invocations in one
    process do not accumulate storage without bound — the oldest entry
    beyond ``keep`` is unpersisted (correctness-safe: an evicted
    DataFrame silently recomputes if still referenced). Registries are
    module-level deques, one per persist site."""
    df = df.persist()
    registry.append(df)
    while len(registry) > keep:
        old = registry.popleft()
        try:
            old.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def get_spark(
    app_name: str = "alertsage_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same code path serves tests, bench, and the N-vs-4N scaling
    runs. On a cluster, pass ``master=None`` with an externally configured
    session (spark-submit) and this returns the active session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match local parallelism; on a real cluster override to 2-3x cores
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
        # shuffle/spill on tmpfs: the sandbox's /tmp is one spinning disk,
        # which serializes shuffle I/O; a real cluster's shuffle dirs scale
        # with the number of nodes
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/alertsage-warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
