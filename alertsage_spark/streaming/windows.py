"""Structured Streaming analogs of the reference's streaming-shaped
concepts (SURVEY §2.10).

The reference is batch-only; its closest analogs are the chunked
checkpointed generator (micro-batch + exactly-once-ish resume,
/root/reference/generator/generate_cyber_incidents.py:3016-3047), the
sliding-window rate limiter (/root/reference/src/triage/llm_client.py:
82-103) and the 7d/30d trend windows (/root/reference/ui_premium.py:
3923-3936). The north rule targets batch spark-submit jobs, so these are
OPTIONAL demos — but they are real Structured Streaming plans
(readStream -> watermark -> window agg -> sink) and tested end-to-end on
a file source.

Scale notes: the same plan shape serves a Kafka source at cluster scale;
state store size is bounded by (watermark horizon / window) x key
cardinality; `availableNow` triggers give batch-like reprocessing with
streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_json(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of events rows (JSONL dumped by tests/writers)."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    return spark.readStream.schema(schema).json(input_dir)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling window counts per event_type with late-data
    handling via watermark — the streaming form of the batch
    rel_time_window catalog query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def run_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain all available input (availableNow trigger) into a memory
    sink; blocks until done. Default complete-mode because window aggs
    finalize only when the watermark passes — availableNow batch drains
    want the full picture; stateful non-agg operators (dropDuplicates)
    require append."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
