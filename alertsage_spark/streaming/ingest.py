"""Structured-Streaming index ingestion: micro-batches append LSM
segment groups (SURVEY §2.10 meets §4.2 — the streaming twin of the
reference's chunked checkpointed generator loop,
/root/reference/generator/generate_cyber_incidents.py:2779-3047).

Shape:

    readStream(docs) -> writeStream.foreachBatch(ingest_batch)

Each micro-batch builds its own segment group in a staging directory
and renames it into ``segments/`` (the same crash-safe commit as
append_group), then refreshes global stats. EXACTLY-ONCE per batch:
Structured Streaming re-delivers a batch after a crash between the
sink's side effect and the checkpoint commit, so every group directory
carries a ``_stream_batch.json`` marker with its batch id — a
re-delivered batch whose id is already committed is skipped before any
work. The rename IS the commit point; a crash mid-build leaves only an
invisible staging dir (underscore-prefixed, ignored by the segment
glob and parquet discovery). Compaction (merge_segments) drops the
marker-carrying groups but carries their batch ids into a root
``_stream_batches.json`` sidecar, so the skip survives a
stop -> compact -> restart window (segments.stream_committed_batch_ids
reads markers UNION sidecar).

At scale each micro-batch is one bounded build (the batch's docs
shuffle once on shard_id into n_shards single-shard tasks); group count
grows with stream time, so run ``merge_segments`` /
``maybe_compact`` out-of-band to bound query-time read amplification —
the standard LSM background-compaction split. Queries against the
serving snapshot raise the staleness error after an append
(SegmentIndex.assert_serving_fresh), forcing an explicit re-load — no
silent drift.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from alertsage_spark.index.segments import (
    STREAM_MARKER as _MARKER,
)
from alertsage_spark.index.segments import (
    IndexPaths,
    build_segments,
    refresh_stats,
    refresh_stats_incremental,
    stream_committed_batch_ids,
)

# written into a group dir only AFTER its stats refresh completed; a
# committed group missing it marks a crash in the commit->refresh gap
_STATS_OK = "_stats_ok"


def committed_batch_ids(index_dir: str) -> set[int]:
    """Batch ids already durably appended: marker files inside committed
    group dirs UNION the root sidecar that merge_segments carries when
    it compacts marker-carrying groups away (segments.py)."""
    return stream_committed_batch_ids(index_dir)


def _repair_stats_if_needed(spark: SparkSession, index_dir: str) -> bool:
    """If any STREAM-committed group (it carries a batch marker) lacks
    its _STATS_OK stamp — a crash landed between the group rename and
    the stats refresh — rerun the FULL stats recompute (idempotent over
    all groups) and stamp the marker groups. Scoped to marker groups:
    delete_docs/append_group/merge groups have their own stats
    contract, and an unstamped tombstone group must not trigger a
    full-corpus rescan on every stream restart."""
    stream_groups = [
        os.path.dirname(p)
        for p in _glob.glob(
            os.path.join(index_dir, "segments", "group=*", _MARKER)
        )
    ]
    missing = [
        g for g in stream_groups
        if not os.path.exists(os.path.join(g, _STATS_OK))
    ]
    if not missing:
        return False
    refresh_stats(spark, index_dir)
    for g in stream_groups:
        with open(os.path.join(g, _STATS_OK), "w") as f:
            f.write("{}")
    return True


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    n_shards: int = 8,
    mode: str = "text",
) -> bool:
    """Append one micro-batch as a new segment group. Returns True if a
    group was committed, False if the batch was empty or already
    committed (re-delivery). Safe to call directly (batch twin)."""
    paths = IndexPaths(index_dir)
    adopting = not os.path.exists(paths.config_json)
    if adopting and os.path.isdir(index_dir) and os.listdir(index_dir):
        # checked BEFORE the batch build: the refusal is permanent, so
        # discovering it after building the whole group would re-waste
        # the build on every streaming retry
        raise ValueError(
            f"{index_dir} exists, is non-empty, and is not an "
            "index (no build_config.json) — refusing to adopt"
        )
    if not adopting:
        # unconditional: a crash in the commit->stats gap must be
        # repaired even when the NEXT call carries a new batch id (the
        # direct batch-twin usage has no re-delivery guarantee)
        _repair_stats_if_needed(spark, index_dir)
    if batch_id in committed_batch_ids(index_dir):
        return False
    rows = batch_df.limit(1).count()
    if rows == 0:
        return False
    # build the batch's group in its own staging index, then adopt the
    # group dir. The staging build uses the SAME n_shards/mode so the
    # doc->shard layout matches (append_group's compatibility rule).
    if os.path.exists(paths.config_json):
        with open(paths.config_json) as f:
            cfg = json.load(f)
        if (cfg["n_shards"], cfg.get("mode", "text")) != (n_shards, mode):
            raise ValueError(
                "stream_ingest config mismatch with existing index: "
                f"{cfg} vs n_shards={n_shards} mode={mode}"
            )
    # stage on the SAME filesystem as index_dir: shutil.move is then an
    # atomic rename, never a crashable cross-device copy (the adopt
    # path's commit point); '_' prefix keeps it invisible to parquet
    parent = os.path.dirname(os.path.abspath(index_dir.rstrip("/")))
    os.makedirs(parent, exist_ok=True)
    stage_root = tempfile.mkdtemp(prefix="_stream_ingest_", dir=parent)
    try:
        build_segments(
            spark,
            batch_df,
            stage_root,
            n_shards=n_shards,
            n_groups=1,
            mode=mode,
            resume=False,
            build_id=f"stream-batch-{batch_id}",
        )
        src_group = IndexPaths(stage_root).group_dir(0)
        with open(os.path.join(src_group, _MARKER), "w") as f:
            json.dump({"batch_id": int(batch_id)}, f)
        if not os.path.exists(paths.config_json):
            # first batch: adopt the staging index wholesale (config,
            # manifest, termstats, stats all already consistent — stamp
            # the group's stats as done up front)
            with open(os.path.join(src_group, _STATS_OK), "w") as f:
                f.write("{}")
            if os.path.isdir(index_dir):
                # shutil.move into an EXISTING dir would nest the
                # staging index inside it; the entry guard proved the
                # dir empty, so drop it and rename into place
                os.rmdir(index_dir)
            shutil.move(stage_root, index_dir)
            stage_root = None
            return True
        existing = _glob.glob(os.path.join(index_dir, "segments", "group=*"))
        g = 1 + max((int(p.rsplit("=", 1)[1]) for p in existing), default=-1)
        final = paths.group_dir(g)
        tmp = os.path.join(os.path.dirname(final), f"_staging_group_{g}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.move(src_group, tmp)
        os.rename(tmp, final)  # <- commit point
        # O(vocab + batch) incremental stats merge — identical result to
        # the full recompute (exact integer sums), without the
        # O(total corpus) rescan that would invert the LSM cost model.
        # The _STATS_OK stamp lands only after it completes; a crash in
        # between is repaired on re-delivery (_repair_stats_if_needed).
        refresh_stats_incremental(spark, index_dir, stage_root)
        with open(os.path.join(final, _STATS_OK), "w") as f:
            f.write("{}")
        return True
    finally:
        if stage_root is not None:
            shutil.rmtree(stage_root, ignore_errors=True)


def stream_ingest(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    mode: str = "text",
    available_now: bool = True,
):
    """Start the ingestion query. ``stream_docs``: a STREAMING DataFrame
    with (doc_id, text). ``available_now=True`` drains the current
    backlog and stops (the batch-test trigger); pass False for a
    continuous micro-batch query."""
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, index_dir, n_shards, mode)

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
