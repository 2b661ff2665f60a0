"""Round-3 training-data pipeline ops: packing exactness (the rows-only
entry's pytest oracle) plus semantic checks for the oracled entries
(their hash parity is covered by tests/test_catalog_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alertsage_spark import catalog
from alertsage_spark.operators.packing import pack_assignments, pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def _greedy_reference(items: list[tuple[int, int]], cap: int) -> list[list[int]]:
    """Independent first-fit re-implementation: list of bins of doc ids."""
    bins: list[tuple[int, list[int]]] = []
    for doc, n in sorted(items):
        for i, (used, members) in enumerate(bins):
            if used + n <= cap:
                bins[i] = (used + n, members + [doc])
                break
        else:
            bins.append((n, [doc]))
    return [m for _u, m in bins]


def test_pack_sequences_matches_reference_greedy(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(300)) + 20).cast("int").alias("n_tokens"),
    )
    cap, shards = 256, 4
    rows = [(int(r["doc_id"]), int(r["n_tokens"])) for r in docs.collect()]
    assign = {
        int(r["doc_id"]): int(r["bin_id"])
        for r in pack_assignments(docs, capacity=cap, n_shards=shards).collect()
    }
    assert set(assign) == {d for d, _n in rows}  # every doc exactly once

    # mirror the operator's routing rule in one pass
    shard_of = {
        int(r["doc_id"]): int(r["sid"])
        for r in docs.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(shards)).cast("int").alias("sid"),
        ).collect()
    }
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for d, n in rows:
        by_shard.setdefault(shard_of[d], []).append((d, n))
    for sid, items in by_shard.items():
        expected_bins = _greedy_reference(items, cap)
        for local, members in enumerate(expected_bins):
            want_bin = (sid << 32) | local
            for doc in members:
                assert assign[doc] == want_bin, (sid, local, doc)

    # stats view agrees with the assignment view
    stats = pack_sequences(docs, capacity=cap, n_shards=shards).collect()
    tok = dict(rows)
    per_bin: dict[int, list[int]] = {}
    for d, b in assign.items():
        per_bin.setdefault(b, []).append(d)
    for r in stats:
        members = per_bin[int(r["bin_id"])]
        assert int(r["n_docs"]) == len(members)
        assert int(r["total_tokens"]) == sum(tok[d] for d in members)
        assert int(r["total_tokens"]) <= cap or len(members) == 1


def test_pack_capacity_invariants(spark):
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        # one oversized doc (id 7) — must land alone in its own bin
        F.when(F.col("id") == 7, F.lit(999)).otherwise(F.lit(100)).cast("int").alias("n_tokens"),
    )
    stats = pack_sequences(docs, capacity=300, n_shards=2).collect()
    for r in stats:
        assert int(r["total_tokens"]) <= 300 or int(r["n_docs"]) == 1
    big = [r for r in stats if int(r["total_tokens"]) == 999]
    assert len(big) == 1 and int(big[0]["n_docs"]) == 1


def test_split_is_deterministic_and_leakage_safe(spark):
    a = catalog.queries()["pipe_split_train_val"](spark, SF_DIR).collect()
    b = catalog.queries()["pipe_split_train_val"](spark, SF_DIR).collect()
    assert [(r["doc_id"], r["split"]) for r in a] == [
        (r["doc_id"], r["split"]) for r in b
    ]
    frac_val = sum(1 for r in a if r["split"] == "val") / len(a)
    assert 0.02 < frac_val < 0.25  # ~10% by construction


def test_decontaminate_flags_benchmark_members(spark):
    out = {
        int(r["doc_id"]): int(r["n_hit_grams"])
        for r in catalog.queries()["pipe_decontaminate"](spark, SF_DIR).collect()
    }
    # every benchmark doc with >= 5 tokens self-matches
    assert all(d % 10 == 0 or v > 0 for d, v in out.items())
    assert any(d % 10 == 0 for d in out)
