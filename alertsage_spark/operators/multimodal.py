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
    """Raised by the real decode kernels: codec libs absent in this
    environment. Substitute `fake_decode` (deterministic) in tests."""


def real_decode(data: bytes, codec: str) -> np.ndarray:  # pragma: no cover
    raise DecoderUnavailable(
        f"no codec library available for {codec!r} in this environment; "
        "install pillow/av and swap this kernel"
    )


def fake_decode(data: bytes, codec: str) -> np.ndarray:
    """Deterministic stand-in: 8 float32 'pixels' derived from sha256."""
    h = hashlib.sha256(data).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1).astype(
        np.float32
    ) / 255.0


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table (no external data)."""
    rows = []
    kinds = [("image", "png"), ("audio", "wav"), ("video", "mkv")]
    for i in range(n):
        kind, codec = kinds[i % 3]
        blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                codec,
                64 * (1 + i % 4),
                64 * (1 + i % 3),
                1000 * (i % 7),
                bytearray(blob),
            )
        )
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
                        feats.append(decoder(b, codec).tolist())
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
