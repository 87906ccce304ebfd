"""Varint / delta codec round-trip tests (property-based)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from indexer_spark.compress import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    d, t, l, blocks = encode_postings(
        np.array([], dtype=np.int64), np.array([]), np.array([]), 10.0
    )
    assert blocks == [] and d == b""


def test_known_values():
    # 0 -> 0x00, 127 -> 0x7f, 128 -> 0x80 0x01, 300 -> 0xac 0x02
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert list(varint_decode(b"\x00\x7f\x80\x01\xac\x02")) == [0, 127, 128, 300]


def test_uint64_extremes():
    vals = np.array([0, 1, 2**63 - 1, 2**64 - 1, 2**32, 127, 128], dtype=np.uint64)
    assert list(varint_decode(varint_encode(vals))) == list(vals)


def test_truncated_stream_raises():
    import pytest

    with pytest.raises(ValueError):
        varint_decode(b"\x80")  # continuation bit set on final byte
    with pytest.raises(ValueError):
        varint_decode(b"\x00\x00", expect=3)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr), expect=len(vals))) == vals


@given(
    st.integers(min_value=1, max_value=400).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 10**7), min_size=n, max_size=n, unique=True),
            st.lists(st.integers(1, 1000), min_size=n, max_size=n),
            st.lists(st.integers(0, 500), min_size=n, max_size=n),
        )
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_and_blocks(data):
    ids, tfs, dls = data
    ids = sorted(ids)
    avgdl = 40.0
    d, t, l, blocks = encode_postings(
        np.array(ids), np.array(tfs), np.array(dls), avgdl, block_size=16
    )
    rid, rtf, rdl = decode_postings(d, t, l, len(ids))
    assert list(rid) == ids
    assert list(rtf) == tfs
    assert list(rdl) == dls
    # block invariants
    assert len(blocks) == (len(ids) + 15) // 16
    assert blocks[-1]["last_doc_id"] == ids[-1]
    k1, b = 1.2, 0.75
    for i, blk in enumerate(blocks):
        s, e = i * 16, min((i + 1) * 16, len(ids))
        assert blk["max_tf"] == max(tfs[s:e])
        norms = [
            tf / (tf + k1 * (1 - b + b * dl / avgdl))
            for tf, dl in zip(tfs[s:e], dls[s:e])
        ]
        assert abs(blk["max_norm"] - max(norms)) < 1e-12
        assert blk["last_doc_id"] == ids[e - 1]


@given(
    st.integers(min_value=1, max_value=300).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 10**6), min_size=n, max_size=n, unique=True),
            st.integers(0, 30),
            st.integers(0, 30),
        )
    )
)
@settings(max_examples=100, deadline=None)
def test_block_slice_decode(data):
    ids, bi, bj = data
    ids = sorted(ids)
    n = len(ids)
    tfs = [(x % 7) + 1 for x in ids]
    dls = [(x % 50) for x in ids]
    bs = 16
    d, t, l, blocks = encode_postings(
        np.array(ids), np.array(tfs), np.array(dls), 40.0, block_size=bs
    )
    from indexer_spark.compress import decode_block_slice

    nb = len(blocks)
    i, j = min(bi, nb), min(bj, nb)
    if i > j:
        i, j = j, i
    rid, rtf, rdl = decode_block_slice(d, t, l, blocks, i, j, n, block_size=bs)
    s, e = i * bs, min(j * bs, n)
    assert list(rid) == ids[s:e]
    assert list(rtf) == tfs[s:e]
    assert list(rdl) == dls[s:e]


@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 10**6), min_size=1, max_size=60, unique=True),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_batch_encode_equals_per_term(term_runs):
    """encode_postings_batch must be byte-identical to per-term encode."""
    from indexer_spark.compress import encode_postings_batch

    runs = [sorted(ids) for (ids,) in term_runs]
    all_ids = np.concatenate([np.array(r, dtype=np.int64) for r in runs])
    tfs = (all_ids % 9 + 1).astype(np.int64)
    dls = (all_ids % 73).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum([len(r) for r in runs])))
    avgdl, bs = 37.5, 16
    d_col, t_col, l_col, b_col = encode_postings_batch(
        all_ids, tfs, dls, starts, avgdl, block_size=bs
    )
    for i in range(len(runs)):
        s, e = starts[i], starts[i + 1]
        d, t, l, blocks = encode_postings(
            all_ids[s:e], tfs[s:e], dls[s:e], avgdl, block_size=bs
        )
        assert d_col[i] == d and t_col[i] == t and l_col[i] == l
        assert b_col[i] == blocks


def test_unsorted_doc_ids_rejected():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3]), np.array([1, 1]), np.array([1, 1]), 10.0)
