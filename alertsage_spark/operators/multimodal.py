"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The image/audio codec libraries are not in this container, so the decode
kernels are STUBBED behind ``DecoderUnavailable`` with a deterministic
fake decoder used by tests — but the Spark-side plumbing is real and
tested: schemas, binary-column synthesis, partition-size control for
large blobs, Arrow batch shapes through mapInPandas, and the
feature-extract output contract.

Design notes for 100 TB of media:
  * blobs ride as parquet BinaryType; `spark.sql.files.maxPartitionBytes`
    and the row-group size keep task inputs bounded (a task must hold
    only its batch of blobs, never the column);
  * decode/resize/frame-sample are mapInPandas kernels (Arrow-batched,
    one Python process per task — media codecs release the GIL anyway);
  * metadata (width/height/duration/codec) is a plain struct column so
    filters like `width >= 512` prune BEFORE any decode happens (filter
    pushdown works on the metadata, never on the blob).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, codec string, width int, height int, "
    "duration_ms int, data binary"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, "
    "feature array<float>, decode_ok boolean"
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode kernels for codecs with no library in
    this environment. Substitute `fake_decode` (deterministic) in tests."""


def real_decode(data: bytes, codec: str) -> np.ndarray:
    """REAL decode for PNG (pure-stdlib codec, operators/png.py —
    spec-compliant: cross-validated against Java ImageIO in
    tests/test_multimodal.py) returning the (H, W, C) uint8 pixel
    array, and for WAV (pure-stdlib RIFF/PCM codec, operators/wav.py)
    returning the (n_samples, n_channels) int16 sample array; video
    codecs remain honestly unavailable (no av lib in this
    environment — install av and extend this kernel)."""
    if codec == "png":
        from alertsage_spark.operators.png import decode_png

        return decode_png(data)
    if codec == "wav":
        from alertsage_spark.operators.wav import decode_wav

        return decode_wav(data)[0]
    raise DecoderUnavailable(
        f"no codec library available for {codec!r} in this environment; "
        "install av and extend this kernel"
    )


def fake_decode(data: bytes, codec: str) -> np.ndarray:
    """Deterministic stand-in: 8 float32 'pixels' derived from sha256."""
    h = hashlib.sha256(data).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1).astype(
        np.float32
    ) / 255.0


def img_dims(media_id: int) -> tuple[int, int]:
    """Closed-form synthetic image dimensions (width, height) — shared
    by the Spark synthesizer and the DuckDB ground-truth oracle."""
    return 8 + media_id % 24, 8 + (media_id * 7) % 16


def img_pixels(media_id: int) -> np.ndarray:
    """Closed-form synthetic RGB pixels, uint8 (H, W, 3):
    p(x, y, c) = (media_id*3 + x*7 + y*11 + c*13) % 256 — expressible in
    ANSI SQL, so decoded-pixel statistics have an exact oracle."""
    w, h = img_dims(media_id)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((media_id * 3 + x * 7 + y * 11 + c * 13) % 256).astype(np.uint8)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table (no external data). Image rows carry
    REAL PNG blobs (filter-cycling encoder) with metadata matching the
    actual encoded dimensions; audio rows carry REAL RIFF/PCM WAV blobs
    (operators/wav.py) with the true duration; video remains an opaque
    stand-in (no codec library in this environment)."""
    from alertsage_spark.operators.png import encode_png
    from alertsage_spark.operators.wav import (
        audio_n_samples,
        audio_rate,
        synth_audio_blob,
    )

    rows = []
    kinds = [("image", "png"), ("audio", "wav"), ("video", "mkv")]
    for i in range(n):
        kind, codec = kinds[i % 3]
        dur = 1000 * (i % 7)
        if kind == "image":
            px = img_pixels(i)
            blob = encode_png(px, filter_mode="cycle")
            w, h = px.shape[1], px.shape[0]
        elif kind == "audio":
            blob = synth_audio_blob(i)
            w, h = 0, 0
            dur = audio_n_samples(i) * 1000 // audio_rate(i)
        else:
            blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
            w, h = 64 * (1 + i % 4), 64 * (1 + i % 3)
        rows.append((i, kind, codec, w, h, dur, bytearray(blob)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, decoder=real_decode, batch_size: int = 16
) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Yields bounded-size output batches regardless of input batch size so
    a task's Arrow buffers stay small even with multi-MB blobs.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size]
                feats, oks, hashes, sizes = [], [], [], []
                for blob, codec in zip(chunk["data"], chunk["codec"]):
                    b = bytes(blob)
                    sizes.append(len(b))
                    hashes.append(hashlib.sha256(b).hexdigest())
                    try:
                        arr = decoder(b, codec)
                        if arr.ndim >= 2:
                            # pixel decode -> compact stat features
                            h, w = arr.shape[0], arr.shape[1]
                            ch = arr.shape[2] if arr.ndim == 3 else 1
                            means = arr.reshape(h * w, ch).mean(axis=0)
                            arr = np.concatenate(
                                [[float(h), float(w), float(ch)], means]
                            ).astype(np.float32)
                        feats.append(arr.tolist())
                        oks.append(True)
                    except DecoderUnavailable:
                        feats.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": np.asarray(sizes, dtype=np.int64),
                        "sha256": hashes,
                        "feature": feats,
                        "decode_ok": oks,
                    }
                )

    return media.select("media_id", "codec", "data").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def synth_png_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) -> (media_id, data binary): one real PNG per id with
    closed-form pixels (img_pixels) and the filter-CYCLING encoder, so a
    downstream decode exercises every PNG filter type. The blob column
    materializes through Arrow — the same binary-column path ingest
    would use."""
    from alertsage_spark.operators.png import encode_png

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "data": [
                        encode_png(img_pixels(int(m)), filter_mode="cycle")
                        for m in mids
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(kernel, schema="media_id long, data binary")


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL decode -> per-image statistics, all exactly computable by a
    SQL oracle from the closed-form pixel function: dimensions, exact
    per-channel means (integer sums -> one float divide), and a
    position-weighted integer checksum sum(p * (1 + x + y*W + c*W*H))
    that catches any transposition/filter-reconstruction bug."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "checksum": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                arr = real_decode(bytes(blob), "png").astype(np.int64)
                h, w, ch = arr.shape
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(ch)[None, None, :]
                weight = 1 + x + y * w + c * w * h
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                # integer sum -> ONE float divide: bit-identical to the
                # SQL oracle with no rounding (Python round is
                # half-even, DuckDB round is half-away — a .5 boundary
                # would diverge, so don't round at all). Greyscale PNGs
                # (ch=1) replicate their channel into r/g/b — the
                # standard gray->RGB semantic — instead of crashing on
                # a missing channel index.
                for k, cc in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    out[k].append(
                        float(arr[:, :, min(cc, ch - 1)].sum()) / (w * h)
                    )
                out["checksum"].append(int((arr * weight).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(
        kernel,
        schema=(
            "media_id long, width int, height int, channels int, "
            "mean_r double, mean_g double, mean_b double, checksum long"
        ),
    )


def resize_image_stats(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL decode -> nearest-neighbour RESIZE -> per-image stats.

    The resize uses pure integer source mapping
    ``src = (dst * src_dim) // dst_dim`` so the resized pixel grid — and
    therefore the stats — is exactly computable by a SQL oracle from
    the closed-form pixel function (catalog.mm_resize_stats). The same
    kernel shape (decode + numpy fancy-indexing per Arrow batch) is the
    production resize path; swapping in area/bilinear filtering changes
    only the kernel body."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "checksum": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                arr = real_decode(bytes(blob), "png").astype(np.int64)
                h, w, ch = arr.shape
                src_y = (np.arange(out_h) * h) // out_h
                src_x = (np.arange(out_w) * w) // out_w
                r = arr[src_y[:, None], src_x[None, :], :]  # (out_h, out_w, ch)
                x = np.arange(out_w)[None, :, None]
                y = np.arange(out_h)[:, None, None]
                c = np.arange(ch)[None, None, :]
                weight = 1 + x + y * out_w + c * out_w * out_h
                out["media_id"].append(int(mid))
                out["width"].append(out_w)
                out["height"].append(out_h)
                # gray (ch=1) replicates into r/g/b, as in decode_image_stats
                for k, cc in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    out[k].append(
                        float(r[:, :, min(cc, ch - 1)].sum()) / (out_w * out_h)
                    )
                out["checksum"].append(int((r * weight).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(
        kernel,
        schema=(
            "media_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double, checksum long"
        ),
    )


def synth_wav_corpus(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) -> (media_id, data binary): one real RIFF/PCM WAV per id
    with closed-form int16 samples (wav.audio_samples), materialized
    through Arrow — the same binary-column path audio ingest would use."""
    from alertsage_spark.operators.wav import synth_audio_blob

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "data": [synth_audio_blob(int(m)) for m in mids],
                }
            )

    return ids.select(id_col).mapInPandas(kernel, schema="media_id long, data binary")


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> per-clip statistics, all exactly computable by
    a SQL oracle from the closed-form sample function: frame/channel
    counts, the header sample rate, the exact mean amplitude (integer
    sum -> one float divide, no rounding — Python/DuckDB round modes
    diverge on .5), and a position-weighted integer checksum
    sum(s * (1 + i + c*n)) that catches interleave/endianness bugs."""
    from alertsage_spark.operators.wav import decode_wav

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "n_samples": [], "n_channels": [],
                "sample_rate": [], "mean_amp": [], "checksum": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                arr, rate = decode_wav(bytes(blob))
                arr = arr.astype(np.int64)
                n, ch = arr.shape
                i = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                weight = 1 + i + c * n
                out["media_id"].append(int(mid))
                out["n_samples"].append(n)
                out["n_channels"].append(ch)
                out["sample_rate"].append(rate)
                out["mean_amp"].append(float(arr.sum()) / (n * ch))
                out["checksum"].append(int((arr * weight).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(
        kernel,
        schema=(
            "media_id long, n_samples int, n_channels int, "
            "sample_rate int, mean_amp double, checksum long"
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (pure Spark expressions — the actual frame grab would be a
    decode kernel). Demonstrates metadata-driven explode before decode."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
