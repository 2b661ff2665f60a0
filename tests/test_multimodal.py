"""Multimodal plumbing: binary columns + metadata + Arrow-batched decode
kernels. PNG decode is REAL (pure-stdlib codec, operators/png.py);
audio/video remain honestly stubbed (no codec libs in this container)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from alertsage_spark.operators import multimodal as mm
from alertsage_spark.operators.png import decode_png, encode_png


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


def test_png_roundtrip_all_filters_all_colour_types():
    rng = np.random.RandomState(3)
    for shape in [(1, 1, 1), (5, 7, 3), (16, 16, 4), (9, 2, 3), (2, 33, 1)]:
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for mode in ("none", "cycle"):
            assert np.array_equal(decode_png(encode_png(a, mode)), a), (shape, mode)


def test_png_rejects_corruption():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(encode_png(a))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + bytes(b))
    b[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_png_cross_validated_against_jvm_imageio(spark, tmp_path):
    """Independent spec check: Java ImageIO (Spark's `image` source)
    must decode our filter-cycling PNGs to the same pixels (ImageSchema
    is BGR row-major)."""
    rng = np.random.RandomState(7)
    arrs = {}
    for i, shape in enumerate([(5, 7, 3), (16, 9, 3), (3, 3, 3)]):
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        arrs[f"im{i}.png"] = a
        (tmp_path / f"im{i}.png").write_bytes(encode_png(a, "cycle"))
    rows = spark.read.format("image").load(str(tmp_path)).select("image.*").collect()
    assert len(rows) == len(arrs)
    for r in rows:
        a = arrs[os.path.basename(r.origin)]
        got = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, r.nChannels
        )
        assert (r.height, r.width) == a.shape[:2]
        assert np.array_equal(got, a[:, :, ::-1])  # BGR


def test_real_decode_png_and_stub_for_others(media):
    img = media.filter("kind = 'image'").orderBy("media_id").first()
    arr = mm.real_decode(bytes(img["data"]), "png")
    assert arr.shape == (img["height"], img["width"], 3)
    assert np.array_equal(arr, mm.img_pixels(img["media_id"]))
    # wav decodes for real now (operators/wav.py); video stays stubbed
    from alertsage_spark.operators.wav import audio_samples

    aud = media.filter("kind = 'audio'").orderBy("media_id").first()
    samples = mm.real_decode(bytes(aud["data"]), "wav")
    assert np.array_equal(samples, audio_samples(aud["media_id"]))
    with pytest.raises(mm.DecoderUnavailable):
        mm.real_decode(b"xx", "mkv")


def test_extract_features_real_decoder_mixed_outcomes(media):
    """PNG and WAV rows decode for real (stat features); mkv rows are
    marked failed; hashes/sizes computed regardless."""
    from alertsage_spark.operators.wav import audio_n_channels, audio_n_samples

    out = mm.extract_features(media, decoder=mm.real_decode).collect()
    assert len(out) == 64
    by_id = {r["media_id"]: r for r in media.collect()}
    for r in out:
        src = by_id[r["media_id"]]
        assert r["sha256"] == hashlib.sha256(bytes(src["data"])).hexdigest()
        assert r["n_bytes"] == len(bytes(src["data"]))
        if src["kind"] == "image":
            assert r["decode_ok"]
            h, w, ch = r["feature"][0], r["feature"][1], r["feature"][2]
            assert (h, w, ch) == (src["height"], src["width"], 3)
        elif src["kind"] == "audio":
            assert r["decode_ok"]
            n, ch = r["feature"][0], r["feature"][1]
            mid = r["media_id"]
            assert (n, ch) == (audio_n_samples(mid), audio_n_channels(mid))
        else:
            assert not r["decode_ok"] and r["feature"] is None


def test_extract_features_fake_decoder(media):
    out = mm.extract_features(media, decoder=mm.fake_decode).collect()
    assert all(r["decode_ok"] for r in out)
    for r in out:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    a = {r["media_id"]: tuple(r["feature"]) for r in out}
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in mm.extract_features(media, decoder=mm.fake_decode).collect()
    }
    assert a == b


def test_decode_image_stats_matches_closed_form(spark):
    ids = spark.range(0, 30, 3).selectExpr("id AS doc_id")
    got = {
        r["media_id"]: r
        for r in mm.decode_image_stats(mm.synth_png_corpus(ids)).collect()
    }
    assert len(got) == 10
    for mid, r in got.items():
        px = mm.img_pixels(mid).astype(np.int64)
        h, w, _ = px.shape
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        for k, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
            assert r[k] == float(px[:, :, c].sum()) / (w * h)
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        assert r["checksum"] == int((px * (1 + x + y * w + c * w * h)).sum())


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


def test_resize_image_stats_matches_manual_resample(spark):
    ids = spark.range(0, 30, 3).selectExpr("id AS doc_id")
    got = {
        r["media_id"]: r
        for r in mm.resize_image_stats(mm.synth_png_corpus(ids), 16, 12).collect()
    }
    assert len(got) == 10
    for mid, r in got.items():
        px = mm.img_pixels(mid).astype(np.int64)
        h, w, _ = px.shape
        sy = (np.arange(12) * h) // 12
        sx = (np.arange(16) * w) // 16
        rs = px[sy[:, None], sx[None, :], :]
        assert (r["width"], r["height"]) == (16, 12)
        for k, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
            assert r[k] == float(rs[:, :, c].sum()) / (16 * 12)
        x = np.arange(16)[None, :, None]
        y = np.arange(12)[:, None, None]
        c = np.arange(3)[None, None, :]
        assert r["checksum"] == int((rs * (1 + x + y * 16 + c * 16 * 12)).sum())


def test_image_stats_handle_greyscale(spark):
    """decode_image_stats must not crash on 1-channel PNGs the codec
    legitimately decodes (gray replicates into r/g/b)."""
    import pandas as pd

    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    blob = encode_png(gray, "cycle")
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "data": [blob]}),
        "media_id long, data binary",
    )
    r = mm.decode_image_stats(media).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (8, 6, 1)
    exp = float(gray.astype(np.int64).sum()) / 48
    assert r["mean_r"] == r["mean_g"] == r["mean_b"] == exp
    rr = mm.resize_image_stats(media, 4, 3).collect()[0]
    assert rr["mean_r"] == rr["mean_g"] == rr["mean_b"]


# ---- property-based codec checks (hypothesis) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, mode, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(a, mode)), a)


def test_png_decoder_rejects_garbage_controlled():
    """Same rejection contract as the WAV fuzz: arbitrary/truncated/
    bit-flipped bytes raise ValueError only — never struct.error or
    zlib.error out of the kernel."""
    import random

    from alertsage_spark.operators.png import decode_png, encode_png

    rng = random.Random(5)
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    blobs = [b"", b"\x89PNG", good[:20], good[:33], good[:-5]]
    for _ in range(300):
        blobs.append(bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 150))))
    for pos in (1, 9, 17, 26, 34, 41, len(good) - 6):
        b = bytearray(good)
        b[pos % len(good)] ^= 0xFF
        blobs.append(bytes(b))
    for blob in blobs:
        try:
            arr = decode_png(blob)
            assert arr.ndim == 3
        except ValueError:
            pass
