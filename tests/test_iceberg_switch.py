"""Pin the config-only Iceberg claim of sources/code_corpus.py: the
engine touches only DataFrames, so pointing ingestion at an Iceberg
table needs catalog conf, not code. This sandbox ships no Iceberg
runtime jar, so the test SKIPS here — any environment that has the jar
(spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...)
exercises the full round trip: CTAS the north-rule corpus into an
Iceberg table, re-ingest via spark.read.table, and build an index
byte-identical in stats to the DataFrame-sourced build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.index.segments import build_segments, load_index
from alertsage_spark.sources.code_corpus import prepare_code_corpus


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_ingest_from_iceberg_table(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the Spark classpath")
    from alertsage_spark.synth import code_corpus

    # catalog confs are lazily resolved, so they can be set at runtime
    spark.conf.set(
        "spark.sql.catalog.it_local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_local.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.it_local.warehouse", str(tmp_path / "iceberg_wh")
    )
    cc = code_corpus(spark, 1_000, doclen=30)
    cc.writeTo("it_local.db.code_corpus").using("iceberg").createOrReplace()

    # ingest from the Iceberg table — identical code path to parquet
    tbl = spark.read.table("it_local.db.code_corpus")
    docs_a, fid_a = prepare_code_corpus(tbl)
    docs_b, _fid_b = prepare_code_corpus(cc)

    da, db = str(tmp_path / "idx_iceberg"), str(tmp_path / "idx_df")
    build_segments(spark, docs_a, da, n_shards=4, n_groups=1, mode="code",
                   fidelity_hashes=fid_a)
    build_segments(spark, docs_b, db, n_shards=4, n_groups=1, mode="code")
    sa, sb = load_index(spark, da).stats, load_index(spark, db).stats
    for key in ("n_docs", "avgdl", "mode", "n_shards"):
        assert sa[key] == sb[key]
    # partition-pruned scan: Iceberg hidden partitioning applies to the
    # same declarative filter the parquet path uses
    pruned = tbl.filter(F.col("lang") == "python")
    assert pruned.count() == cc.filter(F.col("lang") == "python").count()
