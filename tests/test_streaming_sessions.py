"""applyInPandasWithState sessionization: both close paths (inline
gap-close and event-time timeout) against the batch rel_sessionize
semantics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from alertsage_spark.streaming.sessions import sessionize_stream

GAP = 1800
BASE = 1_700_000_000  # epoch anchor


def _iso(t):
    import datetime

    return datetime.datetime.fromtimestamp(BASE + t, datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )


def test_sessionize_stream_inline_and_timeout_paths(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "events_stream"
    os.makedirs(src)
    # file 1 (batch 1): user1 has two sessions (second stays open),
    # user2 one session that stays open; user1's later events push the
    # watermark past user2's timeout
    f1 = [
        {"user_id": 1, "ts": _iso(0)}, {"user_id": 1, "ts": _iso(50)},
        {"user_id": 1, "ts": _iso(3000)}, {"user_id": 1, "ts": _iso(4000)},
        {"user_id": 2, "ts": _iso(0)}, {"user_id": 2, "ts": _iso(100)},
    ]
    # file 2 (batch 2): sentinel for user1 only -> closes their open
    # session INLINE; user2's closes via EVENT-TIME TIMEOUT (watermark
    # from batch 1 = t 4000 > 100 + 1800)
    f2 = [{"user_id": 1, "ts": _iso(100000)}]
    with open(src / "f1.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in f1))
    with open(src / "f2.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in f2))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_sec=GAP)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["sess_start"] - BASE, r["sess_end"] - BASE, r["n_events"])
        for r in spark.table("sess_out").collect()
    }
    # sentinel's own session stays open (never emitted)
    expected = {
        (1, 0, 50, 2),        # closed inline by t=3000
        (1, 3000, 4000, 2),   # closed inline by the sentinel
        (2, 0, 100, 2),       # closed by event-time TIMEOUT
    }
    assert got == expected, got

    # cross-check vs the batch sessionize semantics on the real events
    rows = [(r["user_id"], int(_to_epoch(r["ts"]))) for r in f1_rows(f1)]
    batch = (
        spark.createDataFrame(rows, "user_id long, t long")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t")
    m = batch.withColumn(
        "new_sess",
        F.when(F.lag("t").over(w).isNull() | ((F.col("t") - F.lag("t").over(w)) > GAP), 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    bs = {
        (r["user_id"], r["sess_start"] - BASE, r["sess_end"] - BASE, r["n_events"])
        for r in m.groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"), F.min("t").alias("sess_start"), F.max("t").alias("sess_end"))
        .collect()
    }
    assert got <= bs  # every emitted session is a true batch session
    assert bs - got == set()  # and none missing (all real sessions closed)


def f1_rows(f1):
    return f1


def _to_epoch(iso_or_ts):
    import datetime

    if isinstance(iso_or_ts, str):
        return datetime.datetime.fromisoformat(iso_or_ts.replace("Z", "+00:00")).timestamp()
    return iso_or_ts.replace(tzinfo=datetime.timezone.utc).timestamp()
