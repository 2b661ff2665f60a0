"""Sequence packing for training pipelines: greedy first-fit of
documents into fixed-capacity token bins (context-window packing).

The distributed shape mirrors how packing actually runs at scale: docs
hash-route to shards (one narrow shuffle), each shard packs its own
docs greedily in deterministic doc_id order inside an Arrow batch, and
bins never span shards — per-worker packing with no global
coordination, the same contract as a training data-loader's per-worker
packer. Bin ids are (shard_id << 32) | local_bin so they are globally
unique and reproducible.

Greedy first-fit (in id order): place each doc into the FIRST open bin
with room; open a new bin when none fits. A doc longer than capacity
gets a bin of its own (real loaders then truncate — that is the
consumer's policy, not the packer's).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shard_col(
    shard_expr: Column | None, id_col: str, n_shards: int
) -> Column:
    """Default routing is pmod(xxhash64(id), n_shards) — balanced even
    under skewed/clustered id ranges, the right choice at scale. An
    explicit ``shard_expr`` swaps it (catalog.pipe_pack_sequences routes
    by id % n so the DuckDB oracle can replicate the shards exactly;
    packing semantics are identical either way and both routings are
    test-covered)."""
    if shard_expr is not None:
        return shard_expr.cast("int")
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")


def pack_sequences(
    doc_tokens: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_expr: Column | None = None,
) -> DataFrame:
    """``doc_tokens``: (doc_id, n_tokens). Returns one row per bin:
    (bin_id, shard_id, n_docs, total_tokens, fill_ratio)."""
    cap = int(capacity)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        pdf = pdf.sort_values(id_col)
        bins: list[tuple[int, int]] = []  # (used_tokens, n_docs)
        for n in pdf[tokens_col].astype(int):
            placed = False
            for i, (used, cnt) in enumerate(bins):
                if used + n <= cap:
                    bins[i] = (used + n, cnt + 1)
                    placed = True
                    break
            if not placed:
                bins.append((n, 1))
        return pd.DataFrame(
            {
                "bin_id": [(shard_id << 32) | i for i in range(len(bins))],
                "shard_id": shard_id,
                "n_docs": [c for _u, c in bins],
                "total_tokens": [u for u, _c in bins],
                # raw u/cap, NOT round(u/cap, 5): one IEEE divide of the
                # same two integers is bit-identical across engines,
                # while Python round is half-even vs SQL half-away (u
                # ≡ 8 mod 16 at cap=512 lands exactly on a .5 tail and
                # would diverge)
                "fill_ratio": [u / cap for u, _c in bins],
            }
        )

    sharded = doc_tokens.select(
        F.col(id_col),
        F.col(tokens_col),
        _shard_col(shard_expr, id_col, n_shards).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandas(
        pack,
        schema="bin_id long, shard_id int, n_docs long, total_tokens long, fill_ratio double",
    )


def pack_assignments(
    doc_tokens: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Same greedy packing, but returns the per-document assignment
    (doc_id, bin_id) — the form a loader consumes."""
    cap = int(capacity)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        pdf = pdf.sort_values(id_col)
        used: list[int] = []
        out_doc, out_bin = [], []
        for doc, n in zip(pdf[id_col].astype(int), pdf[tokens_col].astype(int)):
            placed = None
            for i, u in enumerate(used):
                if u + n <= cap:
                    used[i] = u + n
                    placed = i
                    break
            if placed is None:
                used.append(n)
                placed = len(used) - 1
            out_doc.append(doc)
            out_bin.append((shard_id << 32) | placed)
        return pd.DataFrame({"doc_id": out_doc, "bin_id": out_bin})

    sharded = doc_tokens.select(
        F.col(id_col),
        F.col(tokens_col),
        _shard_col(shard_expr, id_col, n_shards).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, bin_id long"
    )
