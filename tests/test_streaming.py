"""Structured Streaming demo (SURVEY §2.10): file-source stream ->
watermark -> tumbling window agg -> memory sink, checked against the
equivalent batch aggregation on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.streaming import windows as sw

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_stream_tumbling_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "stream_in"
    events.coalesce(2).write.json(str(src))

    stream = sw.stream_events_json(spark, str(src))
    assert stream.isStreaming
    agg = sw.tumbling_counts(stream, window="1 hour", watermark="2 hours")
    sw.run_to_memory(spark, agg, "tumbling_test", str(tmp_path / "ckpt"))

    got = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == expected
