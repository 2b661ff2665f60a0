"""Similarity-search operators vs numpy brute force (the reference's own
engine semantics: /root/reference/src/triage/embeddings.py:118-164)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from alertsage_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


def _brute_topk(ids, mat, q, k):
    scores = np.round(mat @ np.asarray(q, dtype=np.float64), 5)
    order = np.lexsort((ids, -scores))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[ids == 0][0]
    got = [(r["vec_id"], r["score"]) for r in similarity.cosine_topk(emb, list(q), k=10).collect()]
    assert got == _brute_topk(ids, mat, q, 10)


def test_cosine_topk_pandas_matches_sql_expr(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[ids == 7][0]
    a = [(r["vec_id"], r["score"]) for r in similarity.cosine_topk(emb, list(q), k=10).collect()]
    b = [(r["vec_id"], r["score"]) for r in similarity.cosine_topk_pandas(emb, list(q), k=10).collect()]
    assert a == b == _brute_topk(ids, mat, q, 10)


def test_lsh_ann_recall(spark, emb, emb_np):
    """ANN must find most of the true top-10 (recall >= 0.5 with 4 tables
    x 8 bits on 64-dim vectors) and every returned score must be the true
    cosine for that id."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    truth = dict(_brute_topk(ids, mat, q, 10))
    got = {r["vec_id"]: r["score"] for r in similarity.lsh_ann_topk(emb, list(q), k=10).collect()}
    scores = np.round(mat @ q, 5)
    by_id = dict(zip(ids.tolist(), scores.tolist()))
    for vid, s in got.items():
        assert abs(s - by_id[vid]) <= 1e-5
    recall = len(set(truth) & set(got)) / 10
    assert recall >= 0.5, recall


def test_embedding_dup_pairs_threshold(spark, emb, emb_np):
    """Every reported pair's cosine must be exact and >= threshold; the
    exact-duplicate planted pair (if any vec equals another) is found via
    identical signatures. Use a low threshold so buckets yield pairs."""
    ids, mat = emb_np
    out = similarity.embedding_dup_pairs(emb, threshold=0.5)
    rows = out.collect()
    by_id = {int(i): mat[k] for k, i in enumerate(ids)}
    for r in rows:
        true_cos = round(float(by_id[r["id_a"]] @ by_id[r["id_b"]]), 5)
        assert abs(r["cosine"] - true_cos) <= 1e-5
        assert r["cosine"] >= 0.5
        assert r["id_a"] < r["id_b"]


def test_cosine_dup_pairs_exact_vs_numpy(spark, emb, emb_np):
    """Blocked exact all-pairs kernel == numpy brute force (pairs AND
    values), at a threshold that yields a non-trivial set."""
    ids, mat = emb_np
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in similarity.cosine_dup_pairs_exact(emb, threshold=0.5).collect()}
    cos = np.round(mat @ mat.T, 5)
    truth = {}
    n = len(ids)
    iu, ju = np.triu_indices(n, k=1)
    for i, j in zip(iu, ju):
        if cos[i, j] >= 0.5:
            a, b = sorted((int(ids[i]), int(ids[j])))
            truth[(a, b)] = float(cos[i, j])
    assert got == truth


def test_cosine_dup_pairs_exact_string_ids(spark, emb, emb_np):
    """String id columns work (hash-based blocking, ADVICE r02): same
    pair set as the numeric run, ids ordered lexicographically."""
    ids, mat = emb_np
    semb = emb.select(
        F.format_string("v%05d", "vec_id").alias("vec_id"), "embedding"
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in similarity.cosine_dup_pairs_exact(semb, threshold=0.5).collect()}
    cos = np.round(mat @ mat.T, 5)
    truth = {}
    iu, ju = np.triu_indices(len(ids), k=1)
    for i, j in zip(iu, ju):
        if cos[i, j] >= 0.5:
            a, b = sorted((f"v{int(ids[i]):05d}", f"v{int(ids[j]):05d}"))
            truth[(a, b)] = float(cos[i, j])
    assert got == truth


def test_lsh_signatures_single_pass_and_stored_pushdown(spark, emb, emb_np, tmp_path):
    """Signatures are computed in one pass; when stored, ANN candidate
    generation is ONE FileScan with the sig filters pushed to parquet."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    sig = similarity.with_lsh_signatures(emb)
    p = str(tmp_path / "sigs")
    sig.write.parquet(p)
    stored = spark.read.parquet(p)
    out = similarity.lsh_ann_topk(emb, list(q), k=10, signatures=stored)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "PushedFilters: [" in plan and "sig_" in plan.split("PushedFilters")[1][:200], plan
    # stored-signature path returns the same candidates as inline
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, similarity.lsh_ann_topk(emb, list(q), k=10).collect()))
    assert a == b
    # signature determinism: recompute == stored
    again = similarity.with_lsh_signatures(emb)
    assert sorted(map(tuple, again.drop("embedding").collect())) == \
           sorted(map(tuple, stored.drop("embedding").collect()))


def test_ivf_ann_recall_and_exactness(spark, emb, emb_np):
    """IVF ANN: every returned score is the true cosine; recall >= 0.5
    at 4/16 probes on the fixture; stored-assignment path identical."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    truth = dict(_brute_topk(ids, mat, q, 10))
    got = {r["vec_id"]: r["score"] for r in
           similarity.ivf_ann_topk(emb, list(q), k=10, n_probe=6).collect()}
    scores = dict(zip(ids.tolist(), np.round(mat @ q, 5).tolist()))
    for vid, s in got.items():
        assert abs(s - scores[vid]) <= 1e-5
    assert len(set(truth) & set(got)) / 10 >= 0.5
    assigned, cents = similarity.with_ivf_lists(emb)
    again = {r["vec_id"]: r["score"] for r in
             similarity.ivf_ann_topk(emb, list(q), k=10, n_probe=6,
                                     assigned=assigned, centroids=cents).collect()}
    assert again == got


def test_embedding_dup_pairs_production_params(spark):
    """Production near-dup setting (threshold 0.9, b=16 bits, t=32
    tables — predicted recall ~0.94 by the collision math): on a
    synthetic corpus with planted >=0.9-cosine duplicate pairs, recall
    must clear 0.85 and every reported pair must be a true pair."""
    rng = np.random.RandomState(11)
    n_base, dim = 400, 64
    base = rng.randn(n_base, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, planted = [], set()
    vid = 0
    for i in range(n_base):
        rows.append((vid, base[i].tolist())); a = vid; vid += 1
        if i % 4 == 0:  # plant a near-duplicate (cosine ~0.95-0.99)
            dup = base[i] + rng.randn(dim) * 0.03
            dup /= np.linalg.norm(dup)
            if float(dup @ base[i]) >= 0.9:
                rows.append((vid, dup.tolist())); planted.add((a, vid)); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_dup_pairs(
        emb, threshold=0.9, n_tables=32, bits_per_table=16
    ).collect()
    mat = {r[0]: np.array(r[1]) for r in rows}
    got = set()
    for r in out:
        true_cos = float(mat[r["id_a"]] @ mat[r["id_b"]])
        assert round(true_cos, 5) == r["cosine"] and true_cos >= 0.9
        got.add((r["id_a"], r["id_b"]))
    recall = len(got & planted) / len(planted)
    assert recall >= 0.85, (recall, len(planted))


def test_lsh_ann_topk_batch_matches_per_query(spark, emb, emb_np):
    """The batched signature-equi-join path must return EXACTLY the
    per-query lsh_ann_topk results (same candidates, cosines, ranks)
    for every query in the batch."""
    ids, mat = emb_np
    qids = [0, 7, 13]
    sigdf = similarity.with_lsh_signatures(emb, 8, 4, 42, dim=64).cache()
    try:
        batch = similarity.lsh_ann_topk_batch(
            sigdf,
            [(f"q{q}", list(mat[ids == q][0])) for q in qids],
            k=10,
        ).collect()
        got = {}
        for r in batch:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"], r["cos"])
            )
        for q in qids:
            single = similarity.lsh_ann_topk(
                emb, list(mat[ids == q][0]), k=10, signatures=sigdf
            ).collect()
            want = [
                (i + 1, r["vec_id"], r["score"]) for i, r in enumerate(single)
            ]
            assert sorted(got[f"q{q}"]) == want, q
    finally:
        sigdf.unpersist()


def test_lsh_ann_topk_batch_plan_is_equi_join(spark, emb):
    """Candidate generation must be a broadcast EQUI-join on (tbl, s) —
    never a nested-loop OR-of-signature-columns, never a cartesian."""
    sigdf = similarity.with_lsh_signatures(emb, 8, 4, 42, dim=64)
    df = similarity.lsh_ann_topk_batch(sigdf, [("q", [0.1] * 64)], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
