"""Posting-list compression: docID-delta + varbyte, block-max metadata.

The reference's sparse representation is a scipy CSR TF-IDF matrix
(>99% zeros, /root/reference/notebooks/02 cell 16;
/root/reference/src/triage/cli.py:1234-1246). The engine's analog is the
classic IR posting-list format (public literature: varbyte a la Scholer
et al., block-max metadata a la Ding & Suel's Block-Max WAND):

  * doc_ids sorted ascending, delta-encoded (first value absolute),
    then varbyte: little-endian 7-bit groups, high bit = continuation.
  * term frequencies varbyte'd alongside.
  * fixed-size blocks (BLOCK_SIZE postings); per block we keep
    (last_doc_id, max_norm, byte offsets) where
    max_norm = max over block of (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl))
    — the idf-free part of the BM25 term score, so the query-time upper
    bound for a term's block is idf(term) * max_norm (idf is per-term,
    applied at query time; avgdl is a build-time global scalar).

All encode/decode paths are numpy-vectorized (no per-value Python loops)
because they run inside Arrow-batched UDFs on the executors.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


# ------------------------------------------------------------- varbyte
def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int64/uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v < 128).all():
        return v.astype(np.uint8).tobytes()  # single-group fast path
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    ngroups = np.maximum(nbits, 1)
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    # fill each group position g (g < max groups)
    max_g = int(ngroups.max())
    for g in range(max_g):
        mask = ngroups > g
        pos = starts[mask] + g
        vals = (v[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)
        cont = (ngroups[mask] - 1 > g).astype(np.uint8) << 7
        out[pos] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """varbyte_encode + per-value byte counts (for batch slicing).
    Byte-identical to varbyte_encode on the same values."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    if (v < 128).all():
        # single-group fast path (tf streams and most delta streams):
        # every byte is the value itself, no continuation bits — one
        # astype instead of the group-sizing/packing passes (r6)
        return v.astype(np.uint8).tobytes(), np.ones(v.size, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    ngroups = np.maximum(nbits, 1)
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    for g in range(int(ngroups.max())):
        mask = ngroups > g
        pos = starts[mask] + g
        vals = (v[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)
        cont = (ngroups[mask] - 1 > g).astype(np.uint8) << 7
        out[pos] = vals.astype(np.uint8) | cont
    return out.tobytes(), ngroups


def encode_posting_lists_columnar(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_starts: np.ndarray,
) -> dict:
    """Encode MANY terms' posting lists in TWO vectorized varbyte passes,
    returning COLUMNAR arrays (no per-term Python objects):

      doc_all/tf_all   one bytes buffer each for the whole shard
      doc_cum/tf_cum   per-posting byte-offset prefix sums (len n+1)
      bstart           global posting index of every block start
      blk_last/blk_max_tf/blk_min_dl  per-block metadata
      term_blk         per-term slice bounds into the block arrays
                       (len n_terms+1)
      term_starts      echoed back (int64)

    ``doc_ids/tfs/dls`` are the concatenation of every term's postings
    (sorted by doc_id within each term); ``term_starts`` (len n_terms+1)
    delimits the ranges. The encoded bytes are identical to calling
    encode_posting_list per term (unit-tested via the batch wrapper).
    Per-value work — delta computation, varbyte group sizing, byte
    packing, per-BLOCK metadata — runs once over the whole shard
    (r6: the former per-term loop made 2 reduceat + 1 np.append call per
    term, tens of thousands of numpy dispatches per shard). Slices never
    cross a term because every term start IS a block start."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = len(doc_ids)
    if n and doc_ids.min() < 0:
        raise ValueError("doc_ids must be non-negative")
    term_starts = np.asarray(term_starts, dtype=np.int64)
    # block starts: every B-th posting WITHIN its term (term starts are
    # block starts by construction)
    within = np.arange(n) - np.repeat(term_starts[:-1], np.diff(term_starts))
    is_bstart = (within % BLOCK_SIZE) == 0
    delta = doc_ids.astype(np.uint64).copy()
    if n > 1:
        delta[1:] = delta[1:] - doc_ids[:-1].astype(np.uint64)
    delta[is_bstart] = doc_ids[is_bstart].astype(np.uint64)
    doc_all, doc_nbytes = varbyte_encode_with_lengths(delta)
    tf_all, tf_nbytes = varbyte_encode_with_lengths(tfs.astype(np.uint64))
    doc_cum = np.concatenate(([0], np.cumsum(doc_nbytes)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_nbytes)))
    bstart = np.flatnonzero(is_bstart)  # sorted global block starts
    blk_end = np.empty(len(bstart), dtype=np.int64)
    if len(bstart):
        blk_end[:-1] = bstart[1:]  # next block start == this block's end
        blk_end[-1] = n  # (term-contiguous, so also correct at term ends)
        blk_last = doc_ids[blk_end - 1]
        blk_max_tf = np.maximum.reduceat(tfs, bstart)
        blk_min_dl = np.minimum.reduceat(dls, bstart)
    else:
        blk_last = blk_max_tf = blk_min_dl = np.empty(0, dtype=np.int64)
    return {
        "doc_all": doc_all,
        "tf_all": tf_all,
        "doc_cum": doc_cum,
        "tf_cum": tf_cum,
        "bstart": bstart,
        "blk_last": blk_last,
        "blk_max_tf": blk_max_tf,
        "blk_min_dl": blk_min_dl,
        "term_blk": np.searchsorted(bstart, term_starts, side="left"),
        "term_starts": term_starts,
    }


def encode_posting_lists_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_starts: np.ndarray,
) -> list[dict]:
    """Per-term dict view over encode_posting_lists_columnar — the
    row-oriented API used by the pandas-based merge path and tests.
    Byte-identical to encode_posting_list per term (unit-tested)."""
    c = encode_posting_lists_columnar(doc_ids, tfs, dls, term_starts)
    term_starts = c["term_starts"]
    doc_cum, tf_cum, bstart, term_blk = (
        c["doc_cum"], c["tf_cum"], c["bstart"], c["term_blk"]
    )
    out = []
    for t in range(len(term_starts) - 1):
        s, e = int(term_starts[t]), int(term_starts[t + 1])
        b0, b1 = int(term_blk[t]), int(term_blk[t + 1])
        bounds = np.concatenate((bstart[b0:b1], (e,)))
        out.append(
            {
                "doc_bytes": c["doc_all"][doc_cum[s] : doc_cum[e]],
                "tf_bytes": c["tf_all"][tf_cum[s] : tf_cum[e]],
                "block_last_docs": c["blk_last"][b0:b1].tolist(),
                "block_max_tfs": c["blk_max_tf"][b0:b1].tolist(),
                "block_min_dls": c["blk_min_dl"][b0:b1].tolist(),
                "block_doc_offsets": (doc_cum[bounds] - doc_cum[s]).tolist(),
                "block_tf_offsets": (tf_cum[bounds] - tf_cum[s]).tolist(),
                "n_postings": e - s,
            }
        )
    return out


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # group index of each byte: 0,1,2.. within its value
    # starts: first byte of each value = byte after a last-byte (or index 0)
    starts = np.empty(b.shape, dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts)
    grp_pos = np.arange(b.size) - np.repeat(start_idx, np.diff(np.append(start_idx, b.size)))
    vals = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * grp_pos.astype(np.uint64))
    return np.add.reduceat(vals, start_idx)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_ids, dtype=np.uint64).copy()
    d[1:] = d[1:] - d[:-1]
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


# -------------------------------------------------------------- blocks
def bm25_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """(k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)) — float64."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def block_norm_bounds(
    max_tfs: np.ndarray, min_dls: np.ndarray, avgdl: float
) -> np.ndarray:
    """Query-time per-block upper bound on the BM25 tf-norm.

    norm(tf, dl) is increasing in tf and decreasing in dl, so
    norm(block_max_tf, block_min_dl) >= norm(tf_i, dl_i) for every
    posting i in the block — a valid (slightly loose) block-max bound
    that does NOT bake avgdl into the stored index, letting the build run
    in a single pass with no global-stats barrier."""
    return bm25_norm(np.asarray(max_tfs), np.asarray(min_dls), avgdl)


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> dict:
    """Encode one term's postings (sorted by doc_id) into compressed
    blocks + block-max metadata.

    Returns dict with: doc_bytes, tf_bytes, block_last_docs (list[int]),
    block_max_tfs, block_min_dls (per-block bound inputs — see
    block_norm_bounds), block_doc_offsets, block_tf_offsets (byte offset
    of each block's start), n_postings.

    doc_ids must fit uint63 (we store raw int64 ids; negative ids are
    rejected — the builder hashes ids into the non-negative range).
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    if doc_ids.size and doc_ids[0] < 0:
        raise ValueError("doc_ids must be non-negative")
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    n = doc_ids.size
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    last_docs: list[int] = []
    max_tfs: list[int] = []
    min_dls: list[int] = []
    doc_offsets: list[int] = [0]
    tf_offsets: list[int] = [0]
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        blk_docs = doc_ids[s:e]
        doc_chunks.append(varbyte_encode(delta_encode(blk_docs.astype(np.uint64))))
        tf_chunks.append(varbyte_encode(tfs[s:e].astype(np.uint64)))
        last_docs.append(int(blk_docs[-1]))
        max_tfs.append(int(tfs[s:e].max()))
        min_dls.append(int(dls[s:e].min()))
        doc_offsets.append(doc_offsets[-1] + len(doc_chunks[-1]))
        tf_offsets.append(tf_offsets[-1] + len(tf_chunks[-1]))
    return {
        "doc_bytes": b"".join(doc_chunks),
        "tf_bytes": b"".join(tf_chunks),
        "block_last_docs": last_docs,
        "block_max_tfs": max_tfs,
        "block_min_dls": min_dls,
        "block_doc_offsets": doc_offsets,  # len = n_blocks + 1
        "block_tf_offsets": tf_offsets,
        "n_postings": int(n),
    }


def decode_posting_list(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_posting_list -> (doc_ids int64, tfs int64)."""
    doc_ids = []
    tfs = []
    do = row["block_doc_offsets"]
    to = row["block_tf_offsets"]
    db, tb = row["doc_bytes"], row["tf_bytes"]
    for i in range(len(do) - 1):
        deltas = varbyte_decode(db[do[i] : do[i + 1]])
        doc_ids.append(delta_decode(deltas).astype(np.int64))
        tfs.append(varbyte_decode(tb[to[i] : to[i + 1]]).astype(np.int64))
    if not doc_ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(doc_ids), np.concatenate(tfs)


def decode_block(row: dict, block_idx: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block (for WAND skipping)."""
    do, to = row["block_doc_offsets"], row["block_tf_offsets"]
    deltas = varbyte_decode(row["doc_bytes"][do[block_idx] : do[block_idx + 1]])
    tfs = varbyte_decode(row["tf_bytes"][to[block_idx] : to[block_idx + 1]])
    return delta_decode(deltas).astype(np.int64), tfs.astype(np.int64)
