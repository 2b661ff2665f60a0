"""BM25 rank-identity: Spark engine vs independent Python oracle.

North-rule gate: top-k docIDs AND scores rank-identical on the reference
query set (the 18 SOC scenarios of
/root/reference/notebooks/07_scenario_based_evaluation.ipynb cell 2) over
the fixture corpus, plus property checks on random corpora.
"""

from __future__ import annotations

import pytest

from alertsage_spark.index.build import build_index
from alertsage_spark.query.bm25 import bm25_topk
from alertsage_spark.query.oracle import BM25Oracle
from alertsage_spark.query.refqueries import REFERENCE_QUERIES, queries_df

K = 10


@pytest.fixture(scope="module")
def doc_index(documents_df):
    return build_index(documents_df, id_col="doc_id", text_col="text").cache()


@pytest.fixture(scope="module")
def doc_oracle(documents_df):
    rows = documents_df.select("doc_id", "text").collect()
    return BM25Oracle([(r["doc_id"], r["text"]) for r in rows])


def _engine_results(index, spark_queries, k=K, min_score=None):
    out = bm25_topk(index, spark_queries, k=k, min_score=min_score).collect()
    res: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        res.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    return res


def test_rank_identity_reference_queries(spark, doc_index, doc_oracle):
    engine = _engine_results(doc_index, queries_df(spark))
    n_with_hits = 0
    for case_id, _label, text in REFERENCE_QUERIES:
        expected = doc_oracle.topk(text, k=K)
        got = engine.get(case_id, [])
        assert [g[0] for g in got] == [e[0] for e in expected], case_id
        assert [g[2] for g in got] == [e[2] for e in expected], case_id
        for g, e in zip(got, expected):
            assert abs(g[1] - e[1]) <= 1e-6, (case_id, g, e)
        if expected:
            n_with_hits += 1
    assert n_with_hits > 0  # fixture corpus must actually match something


def test_rank_identity_synthetic_code_corpus(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows)
    from pyspark.sql import functions as F

    docs = df.withColumn("doc_id", F.xxhash64("repo", "path", "commit")).select(
        "doc_id", F.col("content").alias("text")
    )
    index = build_index(docs)
    oracle = BM25Oracle([(r["doc_id"], r["text"]) for r in docs.collect()])
    queries = spark.createDataFrame(
        [("q1", "spark parseConfig"), ("q2", "blockMaxWand postingList deltaEncode"),
         ("q3", "read_buffer flushQueue"), ("q4", "nonexistentterm")],
        "query_id string, query_text string",
    )
    engine = _engine_results(index, queries)
    for qid, text in [("q1", "spark parseConfig"), ("q2", "blockMaxWand postingList deltaEncode"),
                      ("q3", "read_buffer flushQueue"), ("q4", "nonexistentterm")]:
        expected = oracle.topk(text, k=K)
        got = engine.get(qid, [])
        assert [g[0] for g in got] == [e[0] for e in expected], qid
        for g, e in zip(got, expected):
            assert abs(g[1] - e[1]) <= 1e-6


def test_min_score_threshold_gate(spark, doc_index, doc_oracle):
    """Engine analog of the reference's uncertainty threshold
    (/root/reference/src/triage/cli.py:1254)."""
    text = "data stream merge join window"  # fixture-vocabulary query
    q = spark.createDataFrame([("t", text)], "query_id string, query_text string")
    full = doc_oracle.topk(text, k=K)
    assert len(full) >= 2
    cutoff = full[1][1]  # keep ranks 1..j where score >= second-best
    engine = _engine_results(doc_index, q, min_score=cutoff)
    expected = doc_oracle.topk(text, k=K, min_score=cutoff)
    assert [g[0] for g in engine.get("t", [])] == [e[0] for e in expected]


def test_topk_contract(doc_index, spark):
    """Result contract per the reference's pipeline-structure tests
    (/root/reference/tests/test_cli.py:7-37): k rows max, scores sorted
    desc, ranks contiguous from 1."""
    res = _engine_results(doc_index, queries_df(spark))
    for qid, hits in res.items():
        assert len(hits) <= K
        scores = [h[1] for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert [h[2] for h in hits] == list(range(1, len(hits) + 1))
