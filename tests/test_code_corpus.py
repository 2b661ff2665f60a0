"""North-rule input-shape ingest: (repo, path, commit, lang, content)
-> code-mode index, fidelity-gated, rank-identical to the oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.index.segments import build_segments, load_index
from alertsage_spark.query.oracle import BM25Oracle
from alertsage_spark.query.wand import wand_topk
from alertsage_spark.sources.code_corpus import prepare_code_corpus


def test_prepare_rejects_wrong_shape(spark):
    bad = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="missing columns"):
        prepare_code_corpus(bad)


def test_ingest_build_query_end_to_end(spark, corpus_df, tmp_path):
    docs, fidelity = prepare_code_corpus(corpus_df)
    # doc ids: deterministic, non-negative, unique per file version
    ids = docs.select("doc_id").collect()
    assert all(r["doc_id"] >= 0 for r in ids)
    assert len({r["doc_id"] for r in ids}) == corpus_df.count()
    d = tmp_path / "code_idx"
    build_segments(
        spark, docs, str(d), n_shards=4, n_groups=2, mode="code",
        fidelity_hashes=fidelity,  # north-rule sha256 gate exercised
    )
    idx = load_index(spark, str(d))
    oracle = BM25Oracle(
        [(r["doc_id"], r["text"]) for r in docs.collect()], mode="code"
    )
    for qid, text in [("Q1", "parseConfig"), ("Q2", "spark deltaEncode")]:
        got = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in wand_topk(spark, idx, [(qid, text)], k=8).collect()
        )
        expected = oracle.topk(text, k=8)
        assert [g[1] for g in got] == [e[0] for e in expected], qid


def test_lang_filter_prunes_before_ingest(spark, corpus_df):
    langs = [r["lang"] for r in corpus_df.select("lang").distinct().collect()]
    keep = langs[:1]
    docs, _f = prepare_code_corpus(corpus_df, langs=keep)
    assert docs.count() == corpus_df.filter(F.col("lang").isin(keep)).count()
