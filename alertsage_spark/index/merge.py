"""LSM-style segment merge (SURVEY §4.2-4).

Incremental builds append new segment groups (new docs -> new shards'
rows or additional rows for existing (shard, term) pairs). The merge
compacts every (shard_id, term) to ONE row with a single sorted,
delta+varbyte re-encoded posting list and fresh block metadata, and
every shard's doclen rows to one row.

Plan: segments.groupBy(shard_id) -> applyInPandas(shard merger). Each
task first merges ITS shard's doclen rows (partition-local — no
driver-side corpus map, no broadcast), then linear-merges every term's
decoded runs against that local doc-length array. Document-sharding
keeps this balanced: a hot term contributes at most one run per
(group, shard), and task memory is corpus/n_shards — the same memory
shape as the build stage itself, with n_shards as the scaling knob
(at 10^12 docs you raise n_shards, exactly as for the build).

Determinism on re-ingested docs (same doc_id in several runs): the
posting merge keeps max-tf per (term, doc) and the doclen merge keeps
max-dl per doc — both run-order-independent, so repeated merges of the
same groups are byte-identical. For BYTE-IDENTICAL re-ingests this
reproduces the document exactly. For a re-ingest with CHANGED content
the result is a deterministic per-term/per-doc upper envelope, not
either single version: tf can come from one version and dl from the
other, and terms present only in the old version persist. Replacing a
document's content therefore goes through the tombstone path:
``delete_docs`` (segments.py) -> ``merge_segments`` (this merge drops
tombstoned doclens/postings and recomputes stats) -> append the new
version. Plain append + merge assumes appends carry new doc_ids or
identical bytes — the invariant build_segments' fidelity gate enforces
upstream.

Global stats are RECOMPUTED from the merged segments (salted termstats
+ doclen re-aggregation), never copied from the source index: the
source's df/cf/n_docs/avgdl double-count re-ingested docs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from alertsage_spark.index.compress import (
    decode_posting_list,
    encode_posting_lists_batch,
)
from alertsage_spark.index.segments import (
    _SEG_COLS,
    SEGMENT_SCHEMA,
    TOMBSTONE_TERM,
    IndexPaths,
    SegmentIndex,
    _doclen_row,
    decode_doclen_row,
    load_index,
    persist_stream_batch_ids,
    salted_termstats_from_segments,
    stream_committed_batch_ids,
)


def _shard_merger():
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        isnull = pdf["term"].isna()
        # 0) the shard's tombstone rows (delete_docs): these doc ids are
        #    physically dropped from doclens and postings below, and the
        #    tombstone rows themselves are not re-emitted — after the
        #    merge the deletion is durable and stats are recomputed
        #    without the deleted docs
        istomb = pdf["term"] == TOMBSTONE_TERM
        deleted = np.empty(0, dtype=np.int64)
        if istomb.any():
            deleted = np.unique(np.concatenate(
                [decode_doclen_row(r)[0] for _, r in pdf[istomb].iterrows()]
            ))
        # 1) merge the shard's doclen rows; re-ingested docs keep MAX dl
        #    (the same deterministic rule as the max-tf posting merge)
        docs_all, dls_all = [], []
        for _, r in pdf[isnull].iterrows():
            d, l = decode_doclen_row(r)
            docs_all.append(d)
            dls_all.append(l)
        if not docs_all:
            # shard holds only tombstones (ids that never existed here)
            return pd.DataFrame(columns=_SEG_COLS)
        docs = np.concatenate(docs_all)
        dls = np.concatenate(dls_all)
        uniq_docs = np.unique(docs)
        dl_merged = np.zeros(len(uniq_docs), dtype=np.int64)
        np.maximum.at(dl_merged, np.searchsorted(uniq_docs, docs), dls)
        if len(deleted):
            live = np.isin(uniq_docs, deleted, invert=True)
            uniq_docs, dl_merged = uniq_docs[live], dl_merged[live]
        out = [_doclen_row(shard_id, uniq_docs, dl_merged)]
        # 2) merge each term's runs against the local doc-length array,
        #    accumulating all merged lists for ONE batch encode (two
        #    vectorized varbyte passes for the whole shard — same
        #    optimization as the segment builder)
        terms: list[str] = []
        docs_cat, tfs_cat, dls_cat = [], [], []
        term_starts = [0]
        for term, grp in pdf[~isnull & ~istomb].groupby("term", sort=False):
            docs_runs, tfs_runs = [], []
            for _, r in grp.iterrows():
                d, t = decode_posting_list(r)
                docs_runs.append(d)
                tfs_runs.append(t)
            d = np.concatenate(docs_runs)
            t = np.concatenate(tfs_runs)
            order = np.argsort(d, kind="stable")
            d, t = d[order], t[order]
            u = np.unique(d)
            if len(u) != len(d):
                # same doc in two runs (re-ingested): deterministic max-tf
                agg = np.zeros(len(u), dtype=np.int64)
                np.maximum.at(agg, np.searchsorted(u, d), t)
                d, t = u, agg
            if len(deleted):
                live = np.isin(d, deleted, invert=True)
                d, t = d[live], t[live]
                if not len(d):
                    continue
            idx = np.searchsorted(uniq_docs, d)
            if idx.max(initial=-1) >= len(uniq_docs) or not np.array_equal(
                uniq_docs[idx], d
            ):
                raise ValueError(
                    f"shard {shard_id} term {term!r}: posting doc_id absent from "
                    "the shard's doclen rows — groups built with a different "
                    "n_shards/layout were appended to this index"
                )
            terms.append(term)
            docs_cat.append(d)
            tfs_cat.append(t)
            dls_cat.append(dl_merged[idx])
            term_starts.append(term_starts[-1] + len(d))
        if terms:
            encs = encode_posting_lists_batch(
                np.concatenate(docs_cat),
                np.concatenate(tfs_cat),
                np.concatenate(dls_cat),
                np.asarray(term_starts, dtype=np.int64),
            )
            for term, t, enc in zip(terms, tfs_cat, encs):
                out.append(
                    {
                        "shard_id": shard_id,
                        "term": term,
                        "df_local": enc["n_postings"],
                        "cf_local": int(t.sum()),
                        **enc,
                    }
                )
        return pd.DataFrame(out, columns=_SEG_COLS)

    return fn


def merge_segments(spark: SparkSession, index_dir: str, out_dir: str) -> SegmentIndex:
    """Compact all groups of ``index_dir`` into one merged segment set at
    ``out_dir``; termstats and stats.json are RECOMPUTED from the merged
    rows (re-ingested docs counted once). The manifest (build lineage)
    carries over."""
    idx = load_index(spark, index_dir)
    src = IndexPaths(index_dir)
    n_shards = int(idx.stats.get("n_shards", 0)) or None
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # one shard per reduce task, same conf dance as the build (AQE's
    # coalescer would otherwise pack shards into uneven fat tasks)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    if n_shards:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shards))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        merged = idx.segments.groupBy("shard_id").applyInPandas(
            _shard_merger(), schema=SEGMENT_SCHEMA
        )
        merged.sortWithinPartitions("term").write.mode("overwrite").parquet(
            paths.group_dir(0)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
        )

    segs = spark.read.option(
        "basePath", os.path.join(paths.root, "segments")
    ).parquet(*paths.group_dirs())
    salted_termstats_from_segments(segs).write.mode("overwrite").parquet(
        paths.termstats
    )
    dl_row = segs.filter(F.col("term").isNull()).agg(
        F.sum("df_local").alias("n"), F.sum("cf_local").alias("s")
    ).collect()[0]
    n = int(dl_row["n"] or 0)
    stats = dict(idx.stats)
    stats.update(
        {
            "n_docs": n,
            "sum_dl": int(dl_row["s"] or 0),
            "avgdl": (int(dl_row["s"] or 0) / n) if n else 0.0,
            "n_groups": 1,
        }
    )
    with open(paths.stats_json, "w") as f:
        json.dump(stats, f)
    config = {
        "n_shards": stats.get("n_shards"),
        "n_groups": 1,
        "mode": stats.get("mode", "text"),
    }
    with open(paths.config_json, "w") as f:
        json.dump(config, f)
    if os.path.exists(src.manifest):
        spark.read.parquet(src.manifest).write.mode("overwrite").parquet(paths.manifest)
    # Carry streaming exactly-once lineage: the merged group has no
    # per-group batch markers, so the union of the source's markers and
    # sidecar moves into the destination sidecar — a micro-batch
    # re-delivered after a stop -> compact -> restart window is still
    # recognized as committed and skipped (streaming/ingest.py).
    persist_stream_batch_ids(out_dir, stream_committed_batch_ids(index_dir))
    return load_index(spark, out_dir)


def maybe_compact(
    spark: SparkSession, index_dir: str, out_dir: str, max_groups: int = 4
):
    """LSM compaction policy: compact once the index accumulates
    ``max_groups`` segment groups. Group count bounds query-time read
    amplification (a query touches up to one row per (term, group,
    shard)) and re-ingest memory in the scorers, so the policy keeps it
    constant while appends stream in — the same trigger shape as the
    reference generator's chunk-compaction checkpoint
    (/root/reference/generator/generate_cyber_incidents.py:2779-3047).
    Returns the merged SegmentIndex, or None when below the threshold."""
    import glob

    n = len(glob.glob(os.path.join(index_dir, "segments", "group=*")))
    if n < max_groups:
        return None
    return merge_segments(spark, index_dir, out_dir)
