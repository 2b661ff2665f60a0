"""LSM-style segment merge (SURVEY §4.2-4).

Incremental builds append new segment groups (new docs -> new shards'
rows or additional rows for existing (shard, term) pairs). The merge
compacts every (shard_id, term) to ONE row with a single sorted,
delta+varbyte re-encoded posting list and fresh block metadata, and
every shard's doclen rows to one row.

Plan: segments.groupBy(shard_id, term) -> applyInPandas(linear merge of
decoded sorted runs, re-encode). The group key is (shard, term), so a
hot term is still spread over all shards — no single reducer sees more
than one shard's slice of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from alertsage_spark.index.compress import decode_posting_list, encode_posting_list
from alertsage_spark.index.segments import (
    _SEG_COLS,
    SEGMENT_SCHEMA,
    IndexPaths,
    SegmentIndex,
    _doclen_row,
    decode_doclen_row,
    load_index,
)


def _merge_builder(dl_map_bc):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        term = key[1]
        if term is None or (isinstance(term, float) and np.isnan(term)):
            # merge the shard's doclen rows
            docs_all, dls_all = [], []
            for _, r in pdf.iterrows():
                d, l = decode_doclen_row(r)
                docs_all.append(d)
                dls_all.append(l)
            docs = np.concatenate(docs_all)
            dls = np.concatenate(dls_all)
            uniq, idx = np.unique(docs, return_index=True)
            return pd.DataFrame(
                [_doclen_row(shard_id, uniq, dls[idx])], columns=_SEG_COLS
            )
        docs_runs, tfs_runs = [], []
        for _, r in pdf.iterrows():
            d, t = decode_posting_list(r)
            docs_runs.append(d)
            tfs_runs.append(t)
        docs = np.concatenate(docs_runs)
        tfs = np.concatenate(tfs_runs)
        order = np.argsort(docs, kind="stable")
        docs, tfs = docs[order], tfs[order]
        uniq = np.unique(docs)
        if len(uniq) != len(docs):
            # same doc in two runs (re-ingested): deterministic max-tf wins
            agg = np.zeros(len(uniq), dtype=np.int64)
            np.maximum.at(agg, np.searchsorted(uniq, docs), tfs)
            docs, tfs = uniq, agg
        dl_map = dl_map_bc.value
        dls = np.array([dl_map[int(d)] for d in docs], dtype=np.int64)
        enc = encode_posting_list(docs, tfs, dls)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "term": term,
                    "df_local": int(len(docs)),
                    "cf_local": int(tfs.sum()),
                    "n_postings": enc["n_postings"],
                    "doc_bytes": enc["doc_bytes"],
                    "tf_bytes": enc["tf_bytes"],
                    "block_last_docs": enc["block_last_docs"],
                    "block_max_tfs": enc["block_max_tfs"],
                    "block_min_dls": enc["block_min_dls"],
                    "block_doc_offsets": enc["block_doc_offsets"],
                    "block_tf_offsets": enc["block_tf_offsets"],
                }
            ],
            columns=_SEG_COLS,
        )

    return fn


def merge_segments(spark: SparkSession, index_dir: str, out_dir: str) -> SegmentIndex:
    """Compact all groups of ``index_dir`` into one merged segment set at
    ``out_dir`` (stats/termstats/manifest are carried over)."""
    import os
    import shutil

    idx = load_index(spark, index_dir)
    # doc lengths: broadcast a corpus-wide map at fixture scale; at 10^12
    # docs the merge would cogroup each shard's doclen row instead (same
    # shape as the wand.py scorer)
    dl_map: dict[int, int] = {}
    for r in idx.doclen_rows.collect():
        d, l = decode_doclen_row(r)
        dl_map.update(zip(d.tolist(), l.tolist()))
    dl_map_bc = spark.sparkContext.broadcast(dl_map)
    merged = idx.segments.groupBy("shard_id", "term").applyInPandas(
        _merge_builder(dl_map_bc), schema=SEGMENT_SCHEMA
    )
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    merged.sortWithinPartitions("term").write.mode("overwrite").parquet(
        paths.group_dir(0)
    )
    idx.termstats.write.mode("overwrite").parquet(paths.termstats)
    shutil.copyfile(IndexPaths(index_dir).stats_json, paths.stats_json)
    src = IndexPaths(index_dir)
    if os.path.exists(src.config_json):
        shutil.copyfile(src.config_json, paths.config_json)
    if os.path.exists(src.manifest):
        spark.read.parquet(src.manifest).write.mode("overwrite").parquet(paths.manifest)
    return load_index(spark, out_dir)
