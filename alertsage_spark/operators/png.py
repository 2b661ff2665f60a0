"""Minimal pure-stdlib PNG codec (public spec: RFC 2083 / ISO 15948).

No imaging library ships in this environment, so the multimodal decode
kernel (multimodal.real_decode) uses this zlib+struct implementation:
8-bit greyscale / RGB / RGBA, no interlacing, all five scanline filter
types on decode. The encoder can CYCLE filter types per row
(filter_mode="cycle") so a round-trip exercises every decode filter
path — the catalog oracle (mm_extract_features) leans on this: if any
filter reconstruction were wrong, the decoded pixel statistics would
not hash-match the closed-form ground truth.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # colour type -> samples per pixel


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed row -> raw bytes to emit."""
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prior.astype(np.int64)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        out = r - _paeth(left, up, upleft)
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 array (H, W) | (H, W, 1|3|4) -> PNG bytes.

    filter_mode: "none" emits filter 0 everywhere; "cycle" uses
    row_index % 5 so decoders must implement every filter type.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    bpp = ch
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        ftype = 0 if filter_mode == "none" else y % 5
        raw.append(ftype)
        raw.extend(_filter_row(ftype, row, prior, bpp).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C). 8-bit depth, colour types
    0/2/6, no interlace; CRCs verified; all five filters reconstructed."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        # controlled rejection of truncation (struct.error on a short
        # slice would leak an uncontrolled exception class out of the
        # mapInPandas kernels)
        if pos + 12 > len(data):
            raise ValueError("truncated PNG chunk")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"bad IHDR length {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} colour={ctype} interlace={interlace})"
        )
    ch = _CHANNELS[ctype]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    bpp = ch
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int64
        )
        if ftype == 0:
            recon = line
        elif ftype == 2:
            recon = (line + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are inherently sequential per pixel
            recon = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                up = prior[i]
                upleft = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    recon[i] = (line[i] + left) % 256
                elif ftype == 3:
                    recon[i] = (line[i] + (left + up) // 2) % 256
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                    recon[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad filter byte {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(h, w, ch)
