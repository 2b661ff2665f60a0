"""Dedup operators vs brute-force oracles.

Upgrades the reference's single duplicate rule (cosine >= 0.90,
/root/reference/src/triage/embeddings.py:147-164) to the corpus-dedup
suite; every approximate path is checked against an exact
driver-side computation on a corpus with PLANTED near-duplicates.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from alertsage_spark.operators import dedup
from alertsage_spark.tokenizer import tokenize_py

N_BASE = 60


def _planted_corpus(seed: int = 11):
    """Docs 0..N_BASE-1 unique; each doc i in 0..9 gets a near-dup
    (id 1000+i, a few tokens changed) and doc 0 gets an exact dup 2000."""
    rng = random.Random(seed)
    vocab = [f"tok{j}" for j in range(150)]
    rows = []
    texts = {}
    for i in range(N_BASE):
        words = [rng.choice(vocab) for _ in range(60)]
        texts[i] = " ".join(words)
        rows.append((i, texts[i]))
    for i in range(10):
        words = texts[i].split()
        for _ in range(3):  # ~5% token edits -> jaccard(shingles) high
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((1000 + i, " ".join(words)))
    rows.append((2000, texts[0]))
    return rows


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = tokenize_py(text)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _true_jaccard_pairs(rows, threshold: float):
    out = {}
    for i, (ida, ta) in enumerate(rows):
        sa = _shingles(ta)
        for idb, tb in rows[i + 1 :]:
            sb = _shingles(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                a, b = min(ida, idb), max(ida, idb)
                out[(a, b)] = j
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rows = _planted_corpus()
    return rows, spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, planted):
    rows, df = planted
    out = dedup.exact_dedup(df, "text", "doc_id")
    kept = {r["doc_id"] for r in out.collect()}
    assert len(kept) == len(rows) - 1  # one exact dup dropped
    assert 0 in kept and 2000 not in kept  # min-id survivor


def test_minhash_recall_and_jaccard_verify(spark, planted):
    rows, df = planted
    truth = _true_jaccard_pairs(rows, threshold=0.7)
    assert len(truth) >= 10  # the planted pairs are really near-dups

    cands = dedup.minhash_lsh_pairs(df, "doc_id", "text")
    cand_pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # LSH must recover (almost) all true pairs: >= 90% recall
    hit = sum(1 for p in truth if p in cand_pairs)
    assert hit / len(truth) >= 0.9, (hit, len(truth))

    verified = dedup.ngram_jaccard_pairs(
        df, cands.select("id_a", "id_b"), "doc_id", "text", threshold=0.7
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    # verification computes EXACT jaccard: every reported pair matches
    # the brute-force value and clears the threshold
    for pair, j in got.items():
        assert pair in truth
        assert abs(j - truth[pair]) <= 1e-6
    assert len(got) == hit


def test_simhash_finds_planted_dups(spark, planted):
    rows, df = planted
    pairs = dedup.simhash_dup_pairs(df, "doc_id", "text", max_hamming=12)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dup pair must collide at hamming 0
    assert (0, 2000) in got
    # most planted near-dups (5% token edits) fall within the ball
    planted_pairs = {(i, 1000 + i) for i in range(10)}
    assert len(planted_pairs & got) >= 5


def test_simhash_identical_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    vals = [r["simhash"] for r in df.select(
        dedup.simhash_col(F.col("text")).alias("simhash")
    ).collect()]
    assert vals[0] == vals[1]


def test_connected_components_shapes(spark):
    from alertsage_spark.operators.dedup import connected_components, dedup_survivors

    # two chains + a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {
        int(r["doc_id"]): int(r["component_id"])
        for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    kept = sorted(
        int(r["doc_id"]) for r in dedup_survivors(docs, pairs).collect()
    )
    # losers: 2,3,4,11,21,22; singletons (0,5..9,...) survive
    assert set(range(30)) - set(kept) == {2, 3, 4, 11, 21, 22}


def test_connected_components_nonconvergence_raises(spark):
    from alertsage_spark.operators.dedup import connected_components

    # a long chain needs ~length iterations under min-propagation
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    ok = {
        int(r["doc_id"]): int(r["component_id"])
        for r in connected_components(chain, max_iter=20).collect()
    }
    assert set(ok.values()) == {0} and len(ok) == 9


def test_components_chain_converges_in_log_rounds(spark):
    """Adversarial worst case for plain min-propagation: one length-n
    chain (diameter n-1). Pointer jumping must converge in O(log n)
    iterations, and every node must still land on the component min."""
    import math

    from alertsage_spark.operators.dedup import connected_components

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = {r["doc_id"]: r["component_id"]
            for r in connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(n)}
    iters = connected_components.last_iterations
    # propagate+jump: distance-to-root shrinks ~geometrically; allow a
    # small constant over log2(n) but far below the linear n-1 bound
    assert iters <= 2 * int(math.log2(n)) + 4, iters


def test_components_last_iterations_reflects_failed_call(spark):
    from alertsage_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # telemetry must reflect THIS call, not a previous convergent one
    assert connected_components.last_iterations == 2
