"""Doc-sharded compressed index segments + manifest checkpoint/resume.

Physical design (for 10^12-file corpora; tested at fixture scale):

  * **document-sharded**: shard_id = pmod(xxhash64-derived doc_id,
    n_shards). Each shard holds the full term->postings map for ITS docs.
    This defuses hot-term build skew structurally — a stop-word's
    postings are spread across all shards instead of landing on one
    term-partition — and lets the query side run block-max WAND per
    shard with only a final top-k merge (queries broadcast; no doc-side
    shuffle at query time).
  * **segments**: one parquet row per (shard_id, term): delta+varbyte
    doc_ids, varbyte tfs, per-block (last_doc, max_norm, offsets) —
    see compress.py. Written sorted by term within files so parquet
    row-group min/max stats prune term lookups.
  * **two-pass build**: pass 1 computes global stats (doclen table,
    avgdl, term->df via salted two-stage aggregation); pass 2 encodes
    segments per shard-group. idf needs global df; block-max norms need
    only the avgdl scalar, so pass 2 never broadcasts the vocabulary.
  * **manifest checkpoint/resume** (the Spark-native analog of the
    reference's chunked generator checkpoint
    /root/reference/generator/generate_cyber_incidents.py:2779-3047:
    JSON {last_completed_event, chunks_written} + append resume):
    shards are processed in groups; each group commits its parquet
    directory THEN appends a manifest row with lineage + build metrics
    (n_docs, n_postings, bytes, wall_ms, docs/sec). Resume anti-joins
    pending groups against the manifest and reprocesses only those;
    a half-written uncommitted group directory is overwritten
    idempotently, so the final index is byte-identical to an
    uninterrupted build (asserted in tests/test_segments.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertsage_spark.index.compress import encode_posting_list
from alertsage_spark.tokenizer import tokenize_col

SEGMENT_SCHEMA = (
    "shard_id int, term string, df_local int, n_postings long, "
    "doc_bytes binary, tf_bytes binary, "
    "block_last_docs array<long>, block_max_norms array<double>, "
    "block_doc_offsets array<int>, block_tf_offsets array<int>"
)

MANIFEST_SCHEMA = (
    "build_id string, group_id int, n_shards int, n_groups int, "
    "n_docs long, n_terms long, n_postings long, "
    "doc_bytes long, tf_bytes long, wall_ms double, "
    "docs_per_sec double, postings_per_sec double, committed_at string"
)


def shard_col(doc_id_col, n_shards: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_shards)).cast("int")


@dataclass
class IndexPaths:
    root: str

    @property
    def stats_json(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def doclen(self) -> str:
        return os.path.join(self.root, "doclen")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    def group_dir(self, g: int) -> str:
        return os.path.join(self.root, "segments", f"group={g}")

    @property
    def segments_glob(self) -> str:
        return os.path.join(self.root, "segments", "group=*")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")


def _salted_termstats(tokens: DataFrame, n_salts: int = 16) -> DataFrame:
    """term -> (df, cf) via EXPLICIT two-stage salted aggregation
    (north rule §4.2-3): partial agg on (term, salt), final on term.
    Salt = pmod(xxhash64(doc_id), n_salts) so a hot term's partial rows
    spread over n_salts reducers before the tiny final combine. (Spark's
    partial aggregation gives map-side combine anyway; the explicit salt
    guards the reduce side when one term dominates a whole stage.)"""
    exploded = tokens.select(
        "doc_id",
        F.explode("toks").alias("term"),
        F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).alias("salt"),
    )
    partial = exploded.groupBy("term", "salt", "doc_id").agg(F.count("*").alias("tf"))
    per_salt = partial.groupBy("term", "salt").agg(
        F.count("*").alias("df_p"), F.sum("tf").alias("cf_p")
    )
    return per_salt.groupBy("term").agg(
        F.sum("df_p").alias("df"), F.sum("cf_p").alias("cf")
    )


def build_stats_pass(
    spark: SparkSession,
    docs: DataFrame,
    paths: IndexPaths,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "text",
) -> dict:
    """Pass 1: doclen parquet (with shard_id), global scalars, termstats."""
    tokens = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col), mode=mode).alias("toks")
    )
    doclen = tokens.select(
        "doc_id", shard_col(F.col("doc_id"), n_shards).alias("shard_id"), F.size("toks").alias("dl")
    )
    doclen.write.mode("overwrite").partitionBy("shard_id").parquet(paths.doclen)
    _salted_termstats(tokens).write.mode("overwrite").parquet(paths.termstats)
    row = spark.read.parquet(paths.doclen).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        "n_shards": n_shards,
        "mode": mode,
    }
    tmp = paths.stats_json + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, paths.stats_json)
    return stats


def _segment_builder(avgdl: float):
    """applyInPandas group fn: one shard's (doc_id, toks) -> segment rows."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        tok_lists = pdf["toks"].tolist()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
        if lens.sum() == 0:
            return pd.DataFrame(
                columns=[
                    "shard_id", "term", "df_local", "n_postings", "doc_bytes", "tf_bytes",
                    "block_last_docs", "block_max_norms", "block_doc_offsets", "block_tf_offsets",
                ]
            )
        flat_terms = np.concatenate(
            [np.asarray(t, dtype=object) for t in tok_lists if len(t)]
        )
        flat_docs = np.repeat(doc_ids, lens)
        flat_dls = np.repeat(lens, lens)
        tf = (
            pd.DataFrame({"term": flat_terms, "doc_id": flat_docs, "dl": flat_dls})
            .groupby(["term", "doc_id", "dl"], sort=True)
            .size()
            .reset_index(name="tf")
        )
        out = []
        for term, grp in tf.groupby("term", sort=True):
            enc = encode_posting_list(
                grp["doc_id"].to_numpy(),
                grp["tf"].to_numpy(),
                grp["dl"].to_numpy(),
                avgdl,
            )
            out.append(
                {
                    "shard_id": shard_id,
                    "term": term,
                    "df_local": len(grp),
                    "n_postings": enc["n_postings"],
                    "doc_bytes": enc["doc_bytes"],
                    "tf_bytes": enc["tf_bytes"],
                    "block_last_docs": enc["block_last_docs"],
                    "block_max_norms": enc["block_max_norms"],
                    "block_doc_offsets": enc["block_doc_offsets"],
                    "block_tf_offsets": enc["block_tf_offsets"],
                }
            )
        return pd.DataFrame(out)

    return fn


def committed_groups(spark: SparkSession, paths: IndexPaths) -> set[int]:
    if not os.path.exists(paths.manifest):
        return set()
    try:
        rows = spark.read.parquet(paths.manifest).select("group_id").distinct().collect()
        return {r["group_id"] for r in rows}
    except Exception:
        return set()


def build_segments(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_shards: int = 32,
    n_groups: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "text",
    resume: bool = True,
    build_id: str = "build-0",
    fail_after_group: int | None = None,
) -> dict:
    """Full checkpointed build. Returns the stats dict + metrics list.

    ``fail_after_group`` injects a crash for the resume test (kill after
    committing that many groups).
    """
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    if resume and os.path.exists(paths.stats_json):
        with open(paths.stats_json) as f:
            stats = json.load(f)
        if stats.get("n_shards") != n_shards or stats.get("mode") != mode:
            raise ValueError("resume with different n_shards/mode; wipe index_dir first")
    else:
        stats = build_stats_pass(spark, docs, paths, n_shards, id_col, text_col, mode)

    done = committed_groups(spark, paths) if resume else set()
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        shard_col(F.col(id_col), n_shards).alias("shard_id"),
        tokenize_col(F.col(text_col), mode=mode).alias("toks"),
    )
    metrics = []
    n_committed = 0
    for g in range(n_groups):
        if g in done:
            continue
        t0 = time.monotonic()
        part = tokens.filter(F.pmod(F.col("shard_id"), F.lit(n_groups)) == g)
        seg = part.groupBy("shard_id").applyInPandas(
            _segment_builder(stats["avgdl"]), schema=SEGMENT_SCHEMA
        )
        # sort by term within files so parquet row-group stats prune lookups
        seg.repartition("shard_id").sortWithinPartitions("term").write.mode(
            "overwrite"
        ).parquet(paths.group_dir(g))
        wall_ms = (time.monotonic() - t0) * 1000.0
        written = spark.read.parquet(paths.group_dir(g))
        m = written.agg(
            F.count("*").alias("n_terms"),
            F.sum("n_postings").alias("n_postings"),
            F.sum(F.length("doc_bytes")).alias("doc_bytes"),
            F.sum(F.length("tf_bytes")).alias("tf_bytes"),
        ).collect()[0]
        n_docs_g = part.count()
        row = {
            "build_id": build_id,
            "group_id": g,
            "n_shards": n_shards,
            "n_groups": n_groups,
            "n_docs": n_docs_g,
            "n_terms": int(m["n_terms"] or 0),
            "n_postings": int(m["n_postings"] or 0),
            "doc_bytes": int(m["doc_bytes"] or 0),
            "tf_bytes": int(m["tf_bytes"] or 0),
            "wall_ms": wall_ms,
            "docs_per_sec": n_docs_g / (wall_ms / 1000.0) if wall_ms else 0.0,
            "postings_per_sec": int(m["n_postings"] or 0) / (wall_ms / 1000.0) if wall_ms else 0.0,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        spark.createDataFrame([row], MANIFEST_SCHEMA).write.mode("append").parquet(
            paths.manifest
        )
        metrics.append(row)
        n_committed += 1
        if fail_after_group is not None and n_committed >= fail_after_group:
            raise RuntimeError(f"injected failure after group {g}")
    return {"stats": stats, "metrics": metrics}


@dataclass
class SegmentIndex:
    segments: DataFrame
    doclen: DataFrame
    termstats: DataFrame
    stats: dict
    paths: IndexPaths


def load_index(spark: SparkSession, index_dir: str) -> SegmentIndex:
    paths = IndexPaths(index_dir)
    with open(paths.stats_json) as f:
        stats = json.load(f)
    return SegmentIndex(
        segments=spark.read.option("basePath", os.path.join(paths.root, "segments")).parquet(paths.segments_glob),
        doclen=spark.read.parquet(paths.doclen),
        termstats=spark.read.parquet(paths.termstats),
        stats=stats,
        paths=paths,
    )
