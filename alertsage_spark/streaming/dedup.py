"""Streaming deduplication (SURVEY §2.10 x training-data pipeline).

Two state shapes, both real Structured Streaming stateful operators:

  * ``dedup_exact``   — dropDuplicates on the key columns: EXACT
    streaming dedup, semantically identical to batch ``SELECT
    DISTINCT`` over everything ever streamed. State = one entry per
    distinct key, forever — correct when the key space is bounded
    (entity ids) or runs are availableNow drains; the catalog entry
    (stream_dedup_exact) hash-matches the batch DISTINCT oracle.
  * ``dedup_within_watermark`` — dropDuplicatesWithinWatermark: state
    is evicted once the watermark passes a key's event time, so memory
    is bounded by (watermark horizon x arrival rate). The trade is the
    contract: only duplicates arriving within the horizon collapse —
    re-occurrences farther apart both survive
    (tests/test_streaming_dedup.py pins exactly that divergence from
    batch DISTINCT).

At 100 TB/day the watermark variant is the production path (bounded
state store, RocksDB-backed); the exact variant is for bounded key
spaces and backfills. Output is restricted to the key columns: which
physical row survives per key is arrival-order-dependent, so emitting
non-key columns would be nondeterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact(stream: DataFrame, keys: list[str]) -> DataFrame:
    return stream.select(*keys).dropDuplicates(keys)


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .select(*keys, ts_col)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
