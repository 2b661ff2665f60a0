"""Multimodal plumbing: binary columns + metadata + Arrow-batched decode
kernels (decode itself stubbed — libs absent in this container)."""

from __future__ import annotations

import hashlib

import pytest

from alertsage_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=64).cache()


def test_schema_and_binary_roundtrip(media):
    rows = media.orderBy("media_id").collect()
    assert len(rows) == 64
    r = rows[0]
    assert isinstance(bytes(r["data"]), bytes) and len(bytes(r["data"])) > 0
    assert set(media.columns) == {
        "media_id", "kind", "codec", "width", "height", "duration_ms", "data"
    }


def test_real_decoder_is_stubbed():
    with pytest.raises(mm.DecoderUnavailable):
        mm.real_decode(b"xx", "png")


def test_extract_features_with_stub_marks_failures(media):
    out = mm.extract_features(media, decoder=mm.real_decode).collect()
    assert len(out) == 64
    assert all(not r["decode_ok"] and r["feature"] is None for r in out)
    # hashes/sizes computed regardless of decoder availability
    by_id = {r["media_id"]: r for r in media.collect()}
    for r in out:
        assert r["sha256"] == hashlib.sha256(bytes(by_id[r["media_id"]]["data"])).hexdigest()
        assert r["n_bytes"] == len(bytes(by_id[r["media_id"]]["data"]))


def test_extract_features_fake_decoder(media):
    out = mm.extract_features(media, decoder=mm.fake_decode).collect()
    assert all(r["decode_ok"] for r in out)
    for r in out:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # deterministic: same blob -> same feature
    a = {r["media_id"]: tuple(r["feature"]) for r in out}
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in mm.extract_features(media, decoder=mm.fake_decode).collect()
    }
    assert a == b


def test_metadata_filter_prunes_before_decode(media, spark):
    """Filtering on metadata must not touch the blob column: the plan
    prunes `data` out of the scan for a metadata-only query."""
    q = media.filter(media.width >= 128).select("media_id", "width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "data" not in plan.split("ReadSchema")[-1] if "ReadSchema" in plan else True
    assert q.count() > 0


def test_frame_sample_plan(media):
    out = mm.frame_sample_plan(media, every_ms=500)
    rows = out.collect()
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    vids = {r["media_id"] for r in rows}
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[v] == "video" for v in vids)
