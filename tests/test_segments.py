"""Segment build, manifest checkpoint/resume, and compressed-index
integrity (north-rule gates: resume from last committed segment manifest;
sum(tf) per doc == doc length; postings sorted & delta-decodable)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from alertsage_spark.index.build import build_index
from alertsage_spark.index.compress import decode_posting_list
from alertsage_spark.index.segments import build_segments, load_index

N_SHARDS = 8
N_GROUPS = 4


@pytest.fixture()
def docs(documents_df):
    return documents_df.select("doc_id", "text")


def _build(spark, docs, d, **kw):
    return build_segments(
        spark, docs, str(d), n_shards=N_SHARDS, n_groups=N_GROUPS, **kw
    )


def _index_fingerprint(spark, d):
    """Order-insensitive content hash over all segment rows."""
    idx = load_index(spark, str(d))
    rows = idx.segments.select(
        "shard_id", "term", "n_postings",
        F.md5(F.base64("doc_bytes")).alias("dh"),
        F.md5(F.base64("tf_bytes")).alias("th"),
        F.col("block_last_docs").cast("string").alias("bl"),
    ).collect()
    return sorted(
        (r["shard_id"], r["term"] or "", r["n_postings"], r["dh"], r["th"], r["bl"])
        for r in rows
    )


def test_build_and_integrity(spark, docs, tmp_path):
    d = tmp_path / "idx"
    out = _build(spark, docs, d)
    assert len(out["metrics"]) == N_GROUPS
    idx = load_index(spark, str(d))
    term_rows = idx.segments.filter(F.col("term").isNotNull())

    # postings count == uncompressed relational index
    rel = build_index(docs, "doc_id", "text")
    n_seg_postings = term_rows.agg(F.sum("n_postings")).collect()[0][0]
    n_rel_postings = rel.postings.count()
    assert n_seg_postings == n_rel_postings

    # avgdl / n_docs match the relational build
    assert idx.stats["n_docs"] == rel.n_docs
    assert abs(idx.stats["avgdl"] - rel.avgdl) < 1e-9

    # per-term df: sum of shard-local df == global termstats df
    seg_df = term_rows.groupBy("term").agg(F.sum("df_local").alias("df_seg"))
    joined = seg_df.join(idx.termstats, "term")
    assert joined.filter(F.col("df_seg") != F.col("df")).count() == 0

    # decode every posting list: sorted doc_ids; sum(tf) per doc == dl
    from alertsage_spark.index.segments import decode_doclen_row

    tf_by_doc: dict[int, int] = {}
    for r in term_rows.collect():
        doc_ids, tfs = decode_posting_list(r.asDict())
        assert (np.diff(doc_ids) > 0).all()  # strictly ascending
        assert len(doc_ids) == r["n_postings"]
        for did, tf in zip(doc_ids.tolist(), tfs.tolist()):
            tf_by_doc[did] = tf_by_doc.get(did, 0) + tf
    dls: dict[int, int] = {}
    for r in idx.doclen_rows.collect():
        dd, ll = decode_doclen_row(r)
        dls.update(zip(dd.tolist(), ll.tolist()))
    assert len(dls) == docs.count()
    for did, total in tf_by_doc.items():
        assert total == dls[did], did
    # docs with dl>0 all appear
    assert set(tf_by_doc) == {d_ for d_, l in dls.items() if l > 0}


def test_resume_after_failure_is_identical(spark, docs, tmp_path):
    full = tmp_path / "full"
    _build(spark, docs, full)

    crashed = tmp_path / "crashed"
    with pytest.raises(RuntimeError, match="injected failure"):
        _build(spark, docs, crashed, fail_after_group=2)
    # resume completes only the missing groups
    out = _build(spark, docs, crashed, resume=True)
    assert len(out["metrics"]) == N_GROUPS - 2

    assert _index_fingerprint(spark, crashed) == _index_fingerprint(spark, full)


def test_corpus_fidelity_gate(spark, docs, tmp_path):
    """North-rule per-row invariant: sha2(content,256) equality vs the
    reference hashes; a single tampered row aborts the build."""
    from pyspark.sql import functions as F2

    from alertsage_spark.index.segments import verify_corpus_fidelity

    good = docs.select("doc_id", F2.sha2("text", 256).alias("content_sha256"))
    verify_corpus_fidelity(docs, good)  # passes

    tampered = docs.withColumn(
        "text",
        F2.when(F2.col("doc_id") == 3, F2.concat(F2.col("text"), F2.lit("x"))).otherwise(
            F2.col("text")
        ),
    )
    with pytest.raises(ValueError, match="fidelity"):
        verify_corpus_fidelity(tampered, good)
    # and the gate wires into the build entrypoint
    with pytest.raises(ValueError, match="fidelity"):
        build_segments(
            spark, tampered, str(tmp_path / "f"), n_shards=2, n_groups=1,
            fidelity_hashes=good,
        )


def test_manifest_metrics(spark, docs, tmp_path):
    d = tmp_path / "m"
    _build(spark, docs, d)
    man = spark.read.parquet(str(d / "manifest"))
    rows = man.collect()
    assert len(rows) == N_GROUPS
    for r in rows:
        assert r["n_docs"] > 0 and r["n_postings"] > 0
        assert r["docs_per_sec"] > 0
        assert r["doc_bytes"] > 0 and r["tf_bytes"] > 0
    # lineage covers the whole corpus exactly once
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_suggest_n_shards_sizing_rule():
    from alertsage_spark.index.segments import suggest_n_shards

    assert suggest_n_shards(80_000, 60.0) == 1
    assert suggest_n_shards(1_000_000_000, 200.0) == 10_000
    assert suggest_n_shards(10**12, 200.0) == 10_000_000
    assert suggest_n_shards(0) == 1


def test_arrow_builder_matches_pandas_builder(spark, docs):
    """r6: build_segments switched to the applyInArrow builder; its
    output (zero-copy buffer views + vectorized block metadata) must be
    byte-identical to the row-oriented pandas builder, both modes."""
    import pyarrow as pa

    from alertsage_spark.index.segments import (
        _SEG_COLS,
        _segment_builder,
        _segment_builder_arrow,
    )

    pdf = docs.toPandas()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    for mode in ("text", "code"):
        fp = _segment_builder(mode)((5,), pdf)
        fa = _segment_builder_arrow(mode)((5,), tbl).to_pandas()
        assert list(fp.columns) == list(fa.columns) == _SEG_COLS
        assert len(fp) == len(fa)
        fp2 = fp.sort_values("term", na_position="first").reset_index(drop=True)
        fa2 = fa.sort_values("term", na_position="first").reset_index(drop=True)
        for col in _SEG_COLS:
            for i in range(len(fp2)):
                a, b = fp2[col][i], fa2[col][i]
                if isinstance(a, (bytes, bytearray)) or isinstance(b, (bytes, bytearray)):
                    assert bytes(a) == bytes(b), (mode, col, i)
                elif hasattr(a, "__len__") and not isinstance(a, str):
                    assert list(a) == list(b), (mode, col, i)
                else:
                    assert a == b or str(a) == str(b), (mode, col, i)
