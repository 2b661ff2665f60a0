"""Streaming index ingestion (streaming/ingest.py): micro-batches
append LSM groups exactly-once; restart with a shared checkpoint picks
up only new files; streamed index is rank-identical to the oracle over
everything ingested so far."""

from __future__ import annotations

import glob
import os

import pytest

from alertsage_spark.index.segments import load_index
from alertsage_spark.query.oracle import BM25Oracle
from alertsage_spark.query.wand import wand_topk
from alertsage_spark.streaming.ingest import committed_batch_ids, ingest_batch, stream_ingest
from alertsage_spark.synth import zipf_corpus

QUERIES = [("Q1", "t1 t2"), ("Q2", "t200 t5")]


def _check_rank_identity(spark, index_dir, docs_rows):
    idx = load_index(spark, index_dir)
    oracle = BM25Oracle(docs_rows)
    for qid, text in QUERIES:
        got = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in wand_topk(spark, idx, [(qid, text)], k=10, algo="auto").collect()
        )
        expected = oracle.topk(text, k=10)
        assert [g[1] for g in got] == [e[0] for e in expected], qid
        assert [g[2] for g in got] == [e[1] for e in expected], qid


def _drop_files(df, src_dir: str, tag: str, tmp_root: str) -> None:
    """Write df as FLAT parquet part-files into src_dir (the file
    source lists files at the top level)."""
    import shutil

    staging = os.path.join(tmp_root, f"stage_{tag}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    i = 0
    for p in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
        shutil.move(p, os.path.join(src_dir, f"{tag}_{i}.parquet"))
        i += 1
    shutil.rmtree(staging, ignore_errors=True)


def _run_stream(spark, src_dir, index_dir, ckpt):
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = stream_ingest(stream, index_dir, ckpt, n_shards=4)
    q.awaitTermination()


def test_stream_ingest_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    part1 = zipf_corpus(spark, 800, seed=31).cache()
    _drop_files(part1, src, "p1", str(tmp_path))
    _run_stream(spark, src, idx_dir, ckpt)
    rows1 = [(r["doc_id"], r["text"]) for r in part1.collect()]
    _check_rank_identity(spark, idx_dir, rows1)
    n_groups_1 = len(glob.glob(os.path.join(idx_dir, "segments", "group=*")))
    assert n_groups_1 >= 1
    batches_1 = committed_batch_ids(idx_dir)
    assert batches_1

    # restart with NEW files against the same checkpoint: only the new
    # data is appended, and the index now answers over everything
    from pyspark.sql import functions as F

    part2 = (
        zipf_corpus(spark, 300, seed=32)
        .select((F.col("doc_id") + 800).alias("doc_id"), "text")
        .cache()
    )
    _drop_files(part2, src, "p2", str(tmp_path))
    _run_stream(spark, src, idx_dir, ckpt)
    rows2 = rows1 + [(r["doc_id"], r["text"]) for r in part2.collect()]
    _check_rank_identity(spark, idx_dir, rows2)
    n_groups_2 = len(glob.glob(os.path.join(idx_dir, "segments", "group=*")))
    assert n_groups_2 > n_groups_1
    assert load_index(spark, idx_dir).stats["n_docs"] == 1_100


def test_redelivered_batch_is_skipped(spark, tmp_path):
    idx_dir = str(tmp_path / "ridx")
    docs = zipf_corpus(spark, 200, seed=33)
    assert ingest_batch(spark, docs, 0, idx_dir, n_shards=4) is True
    groups_before = sorted(glob.glob(os.path.join(idx_dir, "segments", "group=*")))
    # crash-then-redeliver: same batch id arrives again
    assert ingest_batch(spark, docs, 0, idx_dir, n_shards=4) is False
    assert sorted(glob.glob(os.path.join(idx_dir, "segments", "group=*"))) == groups_before
    # an empty batch is a no-op too
    assert ingest_batch(spark, docs.limit(0), 1, idx_dir, n_shards=4) is False
    # config drift is rejected, not silently mixed
    with pytest.raises(ValueError, match="config mismatch"):
        ingest_batch(spark, docs, 2, idx_dir, n_shards=8)


def test_redelivery_skip_survives_compaction(spark, tmp_path):
    """merge_segments drops the marker-carrying groups; the batch ids
    must carry into the root sidecar so a batch re-delivered across a
    stop -> compact -> restart window is still skipped (the ADVICE r3
    double-count scenario)."""
    from alertsage_spark.index.merge import merge_segments
    from alertsage_spark.index.segments import STREAM_SIDECAR

    idx_dir = str(tmp_path / "cidx")
    merged = str(tmp_path / "cmerged")
    b1 = zipf_corpus(spark, 200, seed=61)
    b2 = zipf_corpus(spark, 100, seed=62).selectExpr(
        "doc_id + 1000 AS doc_id", "text"
    )
    assert ingest_batch(spark, b1, 0, idx_dir, n_shards=2)
    assert ingest_batch(spark, b2, 1, idx_dir, n_shards=2)
    assert committed_batch_ids(idx_dir) == {0, 1}

    merge_segments(spark, idx_dir, merged)
    # merged dir has ONE group and no per-group markers, but the sidecar
    # carries the lineage
    assert os.path.exists(os.path.join(merged, STREAM_SIDECAR))
    assert committed_batch_ids(merged) == {0, 1}

    # re-delivered batch 1 against the compacted index: skipped, docs
    # not double-counted
    assert ingest_batch(spark, b2, 1, merged, n_shards=2) is False
    assert load_index(spark, merged).stats["n_docs"] == 300

    # a second compaction keeps carrying the union (sidecar + any new
    # markers)
    assert ingest_batch(spark, b2.selectExpr("doc_id + 9000 AS doc_id", "text"),
                        2, merged, n_shards=2) is True
    merged2 = str(tmp_path / "cmerged2")
    merge_segments(spark, merged, merged2)
    assert committed_batch_ids(merged2) == {0, 1, 2}


def test_incremental_stats_match_full_recompute(spark, tmp_path):
    """refresh_stats_incremental (O(vocab+batch)) must produce EXACTLY
    the same stats.json and termstats as the full O(corpus) recompute —
    all inputs are integer sums, so not even float drift is allowed."""
    import json

    from pyspark.sql import functions as F

    from alertsage_spark.index.segments import IndexPaths, refresh_stats

    idx_dir = str(tmp_path / "inc")
    b1 = zipf_corpus(spark, 400, seed=41)
    b2 = (zipf_corpus(spark, 250, seed=42)
          .select((F.col("doc_id") + 400).alias("doc_id"), "text"))
    assert ingest_batch(spark, b1, 0, idx_dir, n_shards=4)
    assert ingest_batch(spark, b2, 1, idx_dir, n_shards=4)
    paths = IndexPaths(idx_dir)
    with open(paths.stats_json) as f:
        stats_inc = json.load(f)
    ts_inc = sorted(
        (r["term"], int(r["df"]), int(r["cf"]))
        for r in spark.read.parquet(paths.termstats).collect()
    )
    refresh_stats(spark, idx_dir)  # full recompute over every group
    with open(paths.stats_json) as f:
        stats_full = json.load(f)
    ts_full = sorted(
        (r["term"], int(r["df"]), int(r["cf"]))
        for r in spark.read.parquet(paths.termstats).collect()
    )
    assert stats_inc == stats_full
    assert ts_inc == ts_full
    assert stats_full["n_docs"] == 650


def test_adopt_into_precreated_empty_dir(spark, tmp_path):
    """The README pattern: user mkdir -p's the index dir first. The
    first-batch adopt must land the index AT that path, never nested
    inside it (shutil.move semantics when dst exists)."""
    idx_dir = str(tmp_path / "pre")
    os.makedirs(idx_dir)
    docs = zipf_corpus(spark, 200, seed=7)
    assert ingest_batch(spark, docs, 0, idx_dir, n_shards=2)
    assert os.path.exists(os.path.join(idx_dir, "build_config.json"))
    idx = load_index(spark, idx_dir)
    assert int(idx.stats["n_docs"]) == 200


def test_adopt_refuses_nonempty_non_index_dir(spark, tmp_path):
    idx_dir = str(tmp_path / "occupied")
    os.makedirs(idx_dir)
    with open(os.path.join(idx_dir, "somefile.txt"), "w") as f:
        f.write("x")
    docs = zipf_corpus(spark, 50, seed=8)
    with pytest.raises(ValueError, match="refusing to adopt"):
        ingest_batch(spark, docs, 0, idx_dir, n_shards=2)


def test_crash_between_commit_and_stats_is_repaired_on_redelivery(spark, tmp_path):
    """A crash AFTER the group rename but BEFORE the stats refresh must
    be repaired when Structured Streaming re-delivers the batch — the
    marker skip alone would make the stats gap permanent."""
    import json as _json

    from alertsage_spark.streaming.ingest import _STATS_OK

    idx_dir = str(tmp_path / "gap")
    d1 = zipf_corpus(spark, 300, seed=9)
    d2 = zipf_corpus(spark, 200, seed=10).selectExpr(
        "doc_id + 1000 AS doc_id", "text"
    )
    assert ingest_batch(spark, d1, 0, idx_dir, n_shards=2)
    assert ingest_batch(spark, d2, 1, idx_dir, n_shards=2)
    good = _json.load(open(os.path.join(idx_dir, "stats.json")))

    # simulate the crash window: batch 1's group committed (marker
    # present) but its stats stamp missing and stats.json stale
    groups = sorted(glob.glob(os.path.join(idx_dir, "segments", "group=*")))
    os.remove(os.path.join(groups[-1], _STATS_OK))
    stale = dict(good)
    stale["n_docs"] = 300  # pretend batch 1 never reached the stats
    with open(os.path.join(idx_dir, "stats.json"), "w") as f:
        _json.dump(stale, f)

    # re-delivery of batch 1: skipped (exactly-once) AND repaired
    assert ingest_batch(spark, d2, 1, idx_dir, n_shards=2) is False
    repaired = _json.load(open(os.path.join(idx_dir, "stats.json")))
    assert repaired["n_docs"] == good["n_docs"] == 500
    assert abs(repaired["avgdl"] - good["avgdl"]) < 1e-9
    assert os.path.exists(os.path.join(groups[-1], _STATS_OK))


def test_stats_gap_repaired_even_on_new_batch_id(spark, tmp_path):
    """The direct batch-twin usage has no re-delivery guarantee: a crash
    in the commit->stats gap followed by a NEW batch id must still
    repair before the new batch's incremental merge compounds on the
    gapped stats."""
    import json as _json

    from alertsage_spark.streaming.ingest import _STATS_OK

    idx_dir = str(tmp_path / "gap2")
    d1 = zipf_corpus(spark, 300, seed=21)
    d2 = zipf_corpus(spark, 150, seed=22).selectExpr("doc_id + 1000 AS doc_id", "text")
    d3 = zipf_corpus(spark, 100, seed=23).selectExpr("doc_id + 5000 AS doc_id", "text")
    assert ingest_batch(spark, d1, 0, idx_dir, n_shards=2)
    assert ingest_batch(spark, d2, 1, idx_dir, n_shards=2)
    # simulate crash window on batch 1, then continue with batch 2
    groups = sorted(glob.glob(os.path.join(idx_dir, "segments", "group=*")))
    os.remove(os.path.join(groups[-1], _STATS_OK))
    stats = _json.load(open(os.path.join(idx_dir, "stats.json")))
    stats["n_docs"] = 300
    with open(os.path.join(idx_dir, "stats.json"), "w") as f:
        _json.dump(stats, f)
    assert ingest_batch(spark, d3, 2, idx_dir, n_shards=2)
    final = _json.load(open(os.path.join(idx_dir, "stats.json")))
    assert final["n_docs"] == 550  # 300 + 150 (repaired) + 100


def test_tombstone_group_does_not_trigger_stats_repair(spark, tmp_path):
    """delete_docs groups carry no batch marker; their (deliberate)
    missing stamp must not cause a full-corpus refresh on re-delivery —
    and the LSM staleness contract (stats untouched until merge) must
    survive the repair scoping."""
    import json as _json

    from alertsage_spark.index.segments import delete_docs

    idx_dir = str(tmp_path / "tomb")
    d1 = zipf_corpus(spark, 200, seed=24)
    assert ingest_batch(spark, d1, 0, idx_dir, n_shards=2)
    before = _json.load(open(os.path.join(idx_dir, "stats.json")))
    delete_docs(spark, idx_dir, [1, 2, 3])
    # re-delivery of batch 0: skipped, and NO repair fires (stats
    # byte-identical — the tombstone group is out of repair scope)
    assert ingest_batch(spark, d1, 0, idx_dir, n_shards=2) is False
    after = _json.load(open(os.path.join(idx_dir, "stats.json")))
    assert after == before


def test_merge_into_reused_dir_clears_stale_sidecar(spark, tmp_path):
    """A merge destination that previously hosted a streamed index must
    not inherit its sidecar: stale committed-batch claims would make a
    later streaming sink silently DROP re-used batch ids."""
    from alertsage_spark.index.merge import merge_segments
    from alertsage_spark.index.segments import STREAM_SIDECAR, build_segments

    dst = str(tmp_path / "reused")
    # first life: streamed index at dst
    assert ingest_batch(spark, zipf_corpus(spark, 120, seed=71), 0, dst, n_shards=2)
    assert committed_batch_ids(dst) == {0}
    import shutil

    shutil.rmtree(dst)

    # second life: dst becomes the merge target of a PLAIN batch index
    os.makedirs(dst)
    # simulate the stale leftover surviving an incomplete cleanup
    with open(os.path.join(dst, STREAM_SIDECAR), "w") as f:
        f.write('{"batch_ids": [0, 1]}')
    src = str(tmp_path / "plain")
    build_segments(spark, zipf_corpus(spark, 150, seed=72), src,
                   n_shards=2, n_groups=1)
    merge_segments(spark, src, dst)
    assert committed_batch_ids(dst) == set()
    # batch 0 against the merged index must INGEST, not be skipped
    assert ingest_batch(spark, zipf_corpus(spark, 50, seed=73).selectExpr(
        "doc_id + 5000 AS doc_id", "text"), 0, dst, n_shards=2) is True
