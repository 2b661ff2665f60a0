"""Property tests for the varbyte/delta/block codec (hypothesis) —
SURVEY §5: 'random docs -> index -> decode == re-derived postings',
including the empty / max-delta edge cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from alertsage_spark.index.compress import (
    BLOCK_SIZE,
    block_norm_bounds,
    bm25_norm,
    decode_block,
    decode_posting_list,
    delta_decode,
    delta_encode,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_edges():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_decode(varbyte_encode(np.array([2**63 - 1], dtype=np.uint64)))[0] == 2**63 - 1
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    s = np.array(sorted(ids), dtype=np.uint64)
    assert delta_decode(delta_encode(s)).tolist() == sorted(ids)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # doc_id
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=1, max_value=2000),  # dl
        ),
        min_size=1,
        max_size=500,
    )
)
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip(postings):
    # dedup doc ids (posting lists have unique docs)
    seen = {}
    for d, tf, dl in postings:
        seen[d] = (tf, dl)
    docs = np.array(sorted(seen), dtype=np.int64)
    tfs = np.array([seen[d][0] for d in sorted(seen)], dtype=np.int64)
    dls = np.array([seen[d][1] for d in sorted(seen)], dtype=np.int64)
    avgdl = float(dls.mean())
    enc = encode_posting_list(docs, tfs, dls)
    out_docs, out_tfs = decode_posting_list(enc)
    assert out_docs.tolist() == docs.tolist()
    assert out_tfs.tolist() == tfs.tolist()
    # block-max invariant (north-rule risk 6): bound >= true max, never <
    norms = bm25_norm(tfs, dls, avgdl)
    n_blocks = len(enc["block_last_docs"])
    assert n_blocks == (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE
    bounds = block_norm_bounds(
        np.array(enc["block_max_tfs"]), np.array(enc["block_min_dls"]), avgdl
    )
    for bi in range(n_blocks):
        bdocs, btfs = decode_block(enc, bi)
        s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, len(docs))
        assert bdocs.tolist() == docs[s:e].tolist()
        assert btfs.tolist() == tfs[s:e].tolist()
        assert enc["block_last_docs"][bi] == int(docs[e - 1])
        assert bounds[bi] >= norms[s:e].max() - 1e-12


def test_unsorted_input_is_sorted():
    docs = np.array([30, 10, 20], dtype=np.int64)
    tfs = np.array([3, 1, 2], dtype=np.int64)
    dls = np.array([5, 5, 5], dtype=np.int64)
    enc = encode_posting_list(docs, tfs, dls)
    out_docs, out_tfs = decode_posting_list(enc)
    assert out_docs.tolist() == [10, 20, 30]
    assert out_tfs.tolist() == [1, 2, 3]


def test_batch_encode_byte_identical_to_single():
    """encode_posting_lists_batch must produce byte-identical rows to
    per-term encode_posting_list (same format, decodable by the same
    readers)."""
    import numpy as np

    from alertsage_spark.index.compress import (
        encode_posting_list,
        encode_posting_lists_batch,
        decode_posting_list,
    )

    rng = np.random.RandomState(3)
    docs_all, tfs_all, dls_all, starts = [], [], [], [0]
    for n in [1, 2, 127, 128, 129, 400, 1000]:
        d = np.sort(np.unique(rng.randint(0, 10**9, size=n * 2)))[:n].astype(np.int64)
        t = rng.randint(1, 50, size=n).astype(np.int64)
        l = rng.randint(5, 500, size=n).astype(np.int64)
        docs_all.append(d); tfs_all.append(t); dls_all.append(l)
        starts.append(starts[-1] + n)
    cat = lambda xs: np.concatenate(xs)
    batch = encode_posting_lists_batch(cat(docs_all), cat(tfs_all), cat(dls_all),
                                       np.array(starts))
    for i, (d, t, l) in enumerate(zip(docs_all, tfs_all, dls_all)):
        single = encode_posting_list(d, t, l)
        for k in single:
            a, b = single[k], batch[i][k]
            assert a == b or (bytes(a) == bytes(b)), (i, k)
        dd, tt = decode_posting_list(batch[i])
        assert np.array_equal(dd, d) and np.array_equal(tt, t)


@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 2**40), st.integers(1, 1000), st.integers(1, 10**6)),
            min_size=1, max_size=300,
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_batch_encode_property(terms):
    """Batch == per-term encoding for arbitrary posting lists (random
    doc ids incl. duplicates-across-terms, random tf/dl, any term count
    and block alignment)."""
    from alertsage_spark.index.compress import (
        encode_posting_list,
        encode_posting_lists_batch,
    )

    docs_all, tfs_all, dls_all, starts = [], [], [], [0]
    for plist in terms:
        uniq = {}
        for doc, tf, dl in plist:
            uniq[doc] = (tf, dl)
        d = np.array(sorted(uniq), dtype=np.int64)
        t = np.array([uniq[x][0] for x in sorted(uniq)], dtype=np.int64)
        l = np.array([uniq[x][1] for x in sorted(uniq)], dtype=np.int64)
        docs_all.append(d); tfs_all.append(t); dls_all.append(l)
        starts.append(starts[-1] + len(d))
    batch = encode_posting_lists_batch(
        np.concatenate(docs_all), np.concatenate(tfs_all),
        np.concatenate(dls_all), np.array(starts),
    )
    for i, (d, t, l) in enumerate(zip(docs_all, tfs_all, dls_all)):
        single = encode_posting_list(d, t, l)
        for k in single:
            a, b = single[k], batch[i][k]
            assert a == b or (bytes(a) == bytes(b)), (i, k)
