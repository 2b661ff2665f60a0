"""LSM segment merge + hot-term skew (SURVEY phase 3).

Skew fixture: Zipfian corpus where one term ('spark') hits ~30% of docs
(tests/conftest.py synth_corpus) — the merge and the build must spread it
across shards, and queries on the hot term must stay rank-identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.index.segments import build_segments, load_index
from alertsage_spark.index.merge import merge_segments
from alertsage_spark.query.oracle import BM25Oracle
from alertsage_spark.query.wand import wand_topk


@pytest.fixture(scope="module")
def code_docs(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows)
    return df.select(
        F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2**62)).alias("doc_id"),
        F.col("content").alias("text"),
    ).cache()


def test_merge_preserves_rank_identity(spark, code_docs, tmp_path):
    src = tmp_path / "src"
    build_segments(spark, code_docs, str(src), n_shards=8, n_groups=4)
    merged = merge_segments(spark, str(src), str(tmp_path / "merged"))

    # merged index has exactly one row per (shard, term)
    dup = merged.segments.groupBy("shard_id", "term").count().filter("count > 1")
    assert dup.count() == 0

    oracle = BM25Oracle([(r["doc_id"], r["text"]) for r in code_docs.collect()])
    queries = [("HOT", "spark"), ("MIX", "spark deltaEncode"), ("COLD", "blockMaxWand")]
    got = {}
    for r in wand_topk(spark, merged, queries, k=10, algo="wand").collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, text in queries:
        expected = oracle.topk(text, k=10)
        hits = sorted(got.get(qid, []))
        assert [h[1] for h in hits] == [e[0] for e in expected], qid
        for h, e in zip(hits, expected):
            assert abs(h[2] - e[1]) <= 1e-6


def test_incremental_append_then_merge(spark, code_docs, tmp_path):
    """LSM lifecycle: build A over half the corpus, append build B's
    groups for the other half (disjoint docs), merge, re-finalize stats —
    queries over the merged index are rank-identical to an oracle over
    the UNION corpus."""
    import json

    from pyspark.sql import functions as F

    from alertsage_spark.index.segments import (
        IndexPaths,
        salted_termstats_from_segments,
    )

    half_a = code_docs.filter(F.col("doc_id") % 2 == 0)
    half_b = code_docs.filter(F.col("doc_id") % 2 == 1)
    d = tmp_path / "incr"
    build_segments(spark, half_a, str(d), n_shards=4, n_groups=1, build_id="A")
    # second ingest: same layout, committed as a second segment group
    paths = IndexPaths(str(d))
    import os
    import shutil

    b_dir = tmp_path / "b"
    build_segments(spark, half_b, str(b_dir), n_shards=4, n_groups=1, build_id="B")
    shutil.copytree(IndexPaths(str(b_dir)).group_dir(0), paths.group_dir(1))
    # merged compaction + recomputed global stats/termstats
    merged_dir = tmp_path / "merged"
    # refresh stats/termstats over both groups before merge
    segs = spark.read.option("basePath", os.path.join(str(d), "segments")).parquet(
        os.path.join(str(d), "segments", "group=*")
    )
    salted_termstats_from_segments(segs).write.mode("overwrite").parquet(paths.termstats)
    dl = segs.filter(F.col("term").isNull()).agg(
        F.sum("df_local").alias("n"), F.sum("cf_local").alias("s")
    ).collect()[0]
    stats = json.load(open(paths.stats_json))
    stats["n_docs"] = int(dl["n"])
    stats["avgdl"] = int(dl["s"]) / int(dl["n"])
    json.dump(stats, open(paths.stats_json, "w"))

    oracle = BM25Oracle([(r["doc_id"], r["text"]) for r in code_docs.collect()])
    queries = [("Q1", "spark postingList"), ("Q2", "read_buffer segmentMerge")]

    def check(index, label):
        got = {}
        for r in wand_topk(spark, index, queries, k=10, algo="wand").collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
        for qid, text in queries:
            expected = oracle.topk(text, k=10)
            hits = sorted(got.get(qid, []))
            assert [h[1] for h in hits] == [e[0] for e in expected], (label, qid)
            for h, e in zip(hits, expected):
                assert abs(h[2] - e[1]) <= 1e-6

    # un-compacted multi-run index is already exact for disjoint appends
    from alertsage_spark.index.segments import load_index as _load

    check(_load(spark, str(d)), "pre-merge")

    merged = merge_segments(spark, str(d), str(merged_dir))
    assert merged.segments.groupBy("shard_id", "term").count().filter("count > 1").count() == 0
    check(merged, "post-merge")


def test_hot_term_spread_across_shards(spark, code_docs, tmp_path):
    """Doc-sharding must spread a term that hits ~30% of docs over all
    shards — no shard holds more than ~3x its fair share."""
    d = tmp_path / "skew"
    build_segments(spark, code_docs, str(d), n_shards=8, n_groups=2)
    idx = load_index(spark, str(d))
    rows = idx.segments.filter(F.col("term") == "spark").select(
        "shard_id", "n_postings"
    ).collect()
    assert len(rows) == 8  # present in every shard
    counts = [r["n_postings"] for r in rows]
    fair = sum(counts) / len(counts)
    assert max(counts) <= 3 * fair
