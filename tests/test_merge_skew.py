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
