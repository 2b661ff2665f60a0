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


def test_exact_identifier_short_circuit(spark, tmp_path):
    """Code-mode query expansion (tokenizer.code_query_terms): a query
    token present in the vocabulary contributes ONLY its exact postings
    (no trigram fan-out — the r02 code-query cost); an unknown partial
    identifier falls back to trigram terms and still matches. Both paths
    rank-identical to the Python oracle, which applies the same rule."""
    from alertsage_spark.synth import code_corpus
    from alertsage_spark.tokenizer import code_query_terms

    cc = code_corpus(spark, 1_500, doclen=40)
    docs, fid = prepare_code_corpus(cc)
    d = tmp_path / "sc_idx"
    build_segments(spark, docs, str(d), n_shards=4, n_groups=1, mode="code",
                   fidelity_hashes=fid)
    idx = load_index(spark, str(d)).prepare_for_queries()
    oracle = BM25Oracle(
        [(r["doc_id"], r["text"]) for r in docs.collect()], mode="code"
    )

    # exact path: a known identifier expands WITHOUT trigram terms
    exact_q = "parseConfig17"
    terms = code_query_terms(exact_q, idx.df_map.__contains__)
    assert any(idx.df_map.get(t, 0) > 0 for t in terms)
    assert not any(t.startswith("#") for t in terms), terms

    # fallback path: an unknown partial identifier expands WITH trigrams
    partial_q = "parseconfzz"
    pterms = code_query_terms(partial_q, idx.df_map.__contains__)
    assert any(t.startswith("#") for t in pterms), pterms

    for qid, text in [("EXACT", exact_q), ("PARTIAL", partial_q),
                      ("MIXED", "blockMaxWand3 flushqzz")]:
        got = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in wand_topk(spark, idx, [(qid, text)], k=10).collect()
        )
        expected = oracle.topk(text, k=10)
        assert [g[1] for g in got] == [e[0] for e in expected], (qid, got[:3])
        assert [g[2] for g in got] == [e[1] for e in expected], qid
    # the partial query must actually match via trigrams (fuzzy hit)
    assert oracle.topk(partial_q, k=10), "trigram fallback found nothing"


def test_lang_filter_prunes_before_ingest(spark, corpus_df):
    langs = [r["lang"] for r in corpus_df.select("lang").distinct().collect()]
    keep = langs[:1]
    docs, _f = prepare_code_corpus(corpus_df, langs=keep)
    assert docs.count() == corpus_df.filter(F.col("lang").isin(keep)).count()
