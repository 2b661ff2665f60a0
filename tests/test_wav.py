"""WAV codec (operators/wav.py): stdlib-encode vs manual-decode
cross-validation, 8-bit path, chunk-walker robustness, closed-form
sample synthesis — the audio analog of the PNG codec tests."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from alertsage_spark.operators.wav import (
    audio_n_channels,
    audio_n_samples,
    audio_rate,
    audio_samples,
    decode_wav,
    encode_wav,
    synth_audio_blob,
)


def test_roundtrip_16bit_mono_and_stereo():
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        s = rng.integers(-32768, 32768, size=(777, ch), dtype=np.int16)
        arr, rate = decode_wav(encode_wav(s, 12345))
        assert rate == 12345
        assert arr.dtype == np.int16 and arr.shape == (777, ch)
        assert np.array_equal(arr, s)


def test_manual_decoder_agrees_with_stdlib_reader():
    """The manual RIFF walker and the stdlib ``wave`` module must read
    identical frames from the same bytes — neither is its own oracle."""
    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    blob = encode_wav(s, 8000)
    arr, rate = decode_wav(blob)
    with stdlib_wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getnchannels() == 2 and w.getframerate() == 8000
        ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2").reshape(-1, 2)
    assert np.array_equal(arr, ref) and rate == 8000


def test_8bit_unsigned_path():
    """8-bit PCM is unsigned, biased by 128; decode widens by <<8.
    Hand-build the container so the 8-bit branch is actually exercised."""
    raw = bytes([0, 127, 128, 129, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + b"\x00"  # pad byte
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    arr, rate = decode_wav(blob)
    assert rate == 8000
    expect = ((np.array([0, 127, 128, 129, 255], dtype=np.int16) - 128) << 8)
    assert np.array_equal(arr[:, 0], expect)


def test_extra_chunks_and_odd_sizes_are_walked():
    """Real-world WAVs carry LIST/fact chunks before data; odd-sized
    chunks are word-aligned. The walker must skip them."""
    s = np.arange(-5, 5, dtype=np.int16)[:, None]
    blob = encode_wav(s, 8000)
    # splice a 3-byte (odd) junk chunk between fmt and data
    fmt_end = blob.index(b"data")
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, _ = decode_wav(spliced)
    assert np.array_equal(arr, s)


def test_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not a wav")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_closed_form_samples_match_formula():
    for mid in (0, 1, 7, 64, 191):
        arr = audio_samples(mid)
        n, ch = audio_n_samples(mid), audio_n_channels(mid)
        assert arr.shape == (n, ch)
        for i, c in [(0, 0), (n - 1, ch - 1), (n // 2, 0)]:
            assert arr[i, c] == ((mid * 7 + i * 13 + c * 31) % 4096) - 2048


def test_synth_blob_roundtrips_exactly():
    for mid in (1, 4, 190):
        arr, rate = decode_wav(synth_audio_blob(mid))
        assert rate == audio_rate(mid)
        assert np.array_equal(arr, audio_samples(mid))


def test_decoder_never_crashes_on_garbage():
    """Arbitrary bytes must raise ValueError (or decode, for inputs that
    happen to be valid RIFF) — never an unhandled struct/numpy error.
    The decoder sits in a mapInPandas kernel; an uncontrolled exception
    class would poison whole-task error handling."""
    import random

    rng = random.Random(99)
    blobs = [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"RIFFxxxxWAVE" + b"\x01" * 40]
    for _ in range(200):
        n = rng.randint(0, 200)
        blobs.append(bytes(rng.getrandbits(8) for _ in range(n)))
    # mutate a valid wav: truncations + byte flips
    good = encode_wav(np.arange(-100, 100, dtype=np.int16), 8000)
    for cut in (4, 11, 12, 20, 36, len(good) - 1):
        blobs.append(good[:cut])
    for pos in (0, 3, 8, 13, 21, 40):
        b = bytearray(good)
        b[pos] ^= 0xFF
        blobs.append(bytes(b))
    for blob in blobs:
        try:
            arr, rate = decode_wav(blob)
            assert arr.dtype == np.int16 and arr.ndim == 2 and rate > 0
        except ValueError:
            pass  # the contract: controlled rejection only


def test_truncated_fmt_chunk_rejected_controlled():
    """A declared fmt chunk shorter than 16 bytes with a valid data
    chunk after it must raise ValueError, not struct.error."""
    body = b"WAVE" + b"fmt " + struct.pack("<I", 10) + b"\x00" * 10
    body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
