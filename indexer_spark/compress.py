"""Delta + LEB128-varint posting compression, NumPy-vectorized.

Resolves the reference's own TODO ("apply delta + variable-byte encoding
here before writing", /root/reference/src/tree.rs:215): the reference
serializes postings as raw framed structs (8B doc_id + 4B tf each); we
store sorted doc_id gaps, tfs and doc lengths as three varint streams plus
per-block metadata (last_doc_id, max_tf, max BM25 tf-norm) every
``BLOCK_SIZE`` postings, which is what block-max WAND pruning consumes at
query time.

Both encode and decode are O(max_varint_width) vectorized numpy passes —
no per-value Python — so they stay fast inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# value magnitude thresholds for 2..10 encoded bytes (LEB128: 7 bits/byte)
_VARINT_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)],
                              dtype=np.uint64)


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value — one searchsorted pass instead
    of O(max_width) shift/any passes (the old loop allocated ~3 full-size
    temporaries per extra byte, which under full-executor concurrency
    turned into page-fault contention on the postings hot path)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(_VARINT_THRESHOLDS, v, side="right") + 1


def _varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return each value's encoded byte length.

    Allocation-lean: byte 0 of EVERY value is written in one full-array
    pass; later bytes touch only the (typically small) subset of values
    that still need them — postings gaps/tfs/doc-lens are mostly 1-2
    bytes, so the old O(max_width) full-array masked passes did ~width×
    the necessary memory traffic."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = varint_lengths(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    # byte 0 for all values
    out[starts] = (v & np.uint64(0x7F)).astype(np.uint8) | (
        (nbytes > 1).astype(np.uint8) << 7
    )
    # bytes 1.. only for values still carrying bits (invariant at loop
    # top: every remaining value needs byte b, shifted == v >> 7b)
    rem = np.nonzero(nbytes > 1)[0]
    if rem.size:
        shifted = v[rem] >> np.uint64(7)
        nb = nbytes[rem]
        pos = starts[rem]
        b = 1
        while pos.size:
            out[pos + b] = (shifted & np.uint64(0x7F)).astype(np.uint8) | (
                (nb > b + 1).astype(np.uint8) << 7
            )
            keep = nb > b + 1
            if not keep.all():
                shifted, nb, pos = shifted[keep], nb[keep], pos[keep]
            shifted = shifted >> np.uint64(7)
            b += 1
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (as uint64)."""
    return _varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes, expect: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        out = np.zeros(0, dtype=np.uint64)
    else:
        if b[-1] & 0x80:
            raise ValueError("truncated varint stream")
        is_last = (b & 0x80) == 0
        starts = np.nonzero(np.concatenate(([True], is_last[:-1])))[0]
        gid = np.cumsum(np.concatenate(([False], is_last[:-1]))).astype(np.int64)
        pos = np.arange(b.size, dtype=np.int64) - starts[gid]
        if pos.max(initial=0) > 9:
            raise ValueError("varint wider than uint64")
        vals7 = (b & np.uint8(0x7F)).astype(np.uint64) << (pos * 7).astype(np.uint64)
        out = np.add.reduceat(vals7, starts)
    if expect is not None and out.size != expect:
        raise ValueError(f"decoded {out.size} values, expected {expect}")
    return out


def encode_positions(positions: list[int] | np.ndarray) -> bytes:
    """One doc's term positions (strictly increasing token indices) ->
    delta varints: first value absolute, the rest gaps. Paired with the
    tf already stored per posting, no length prefix is needed."""
    a = np.asarray(positions, dtype=np.int64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = a[1:] - a[:-1]
    if a.size > 1 and (d[1:] <= 0).any():
        raise ValueError("positions must be strictly increasing")
    return varint_encode(d)


def encode_positions_doc(lists) -> tuple[bytes, np.ndarray]:
    """Encode ALL of one doc's per-term position lists in ONE varint
    pass — byte-identical to ``b"".join(encode_positions(v) for v in
    lists)`` but without millions of tiny-array numpy calls (the
    per-call overhead dominated the positional build at 2M turns).
    Returns (concatenated blob, int64 per-term byte lengths)."""
    lists = list(lists)
    if not lists:
        return b"", np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(v) for v in lists), dtype=np.int64,
                       count=len(lists))
    total = int(lens.sum())
    if total == 0:
        return b"", np.zeros(len(lists), dtype=np.int64)
    flat = np.empty(total, dtype=np.int64)
    off = 0
    for v in lists:
        n = len(v)
        flat[off : off + n] = v
        off += n
    seg0 = np.cumsum(lens) - lens  # each list's first element
    d = np.empty_like(flat)
    d[0] = flat[0]
    d[1:] = flat[1:] - flat[:-1]
    d[seg0] = flat[seg0]  # first value of every list stays absolute
    inner = np.ones(total, dtype=bool)
    inner[seg0] = False
    if (d[inner] <= 0).any():
        raise ValueError("positions must be strictly increasing")
    vl = varint_lengths(d)
    per_term = np.add.reduceat(vl, seg0).astype(np.int64) \
        if total else np.zeros(0, dtype=np.int64)
    return varint_encode(d), per_term


def decode_positions(blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One (shard, term) positions payload -> (flat positions int64,
    segment starts). The payload is the doc-ordered concatenation of
    per-doc encode_positions blobs; each doc's list length is its tf, so
    the whole payload decodes in ONE vectorized varint pass and the
    per-doc delta chains resolve with a single global cumsum (subtract
    each segment's incoming prefix)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    vals = varint_decode(blob, expect=total).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs)))
    if total == 0:
        return np.zeros(0, dtype=np.int64), starts
    cs = np.cumsum(vals)
    seg0 = starts[:-1]
    base = cs[seg0] - vals[seg0]  # cumsum carried in from prior segments
    pos = cs - np.repeat(base, tfs)
    return pos, starts


def decode_positions_select(
    blob: bytes, tfs: np.ndarray, sel: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-driven positions decode: only the ``sel``-indexed docs'
    lists come out of a (shard, term) positions payload. Identical
    content to slicing decode_positions' output at those segments, but
    the expensive varint arithmetic runs on the SELECTED bytes only —
    one cheap continuation-bit pass over the blob locates every varint
    boundary (the per-doc delta chains never cross docs, so each
    selected doc decodes independently). Returns (flat positions,
    segment starts) in ``sel`` order with len(sel)+1 starts.

    This is what makes phrase/near on a hot term affordable: the
    conjunction typically leaves a candidate set orders of magnitude
    smaller than the hot term's df, and position bytes of non-candidate
    docs are never decoded."""
    tfs = np.asarray(tfs, dtype=np.int64)
    sel = np.asarray(sel, dtype=np.int64)
    out_tfs = tfs[sel] if sel.size else np.zeros(0, dtype=np.int64)
    starts_out = np.concatenate(([0], np.cumsum(out_tfs))).astype(np.int64)
    if sel.size == 0 or starts_out[-1] == 0:
        return np.zeros(0, dtype=np.int64), starts_out
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0 or (b[-1] & 0x80):
        raise ValueError("truncated varint stream")
    ends = np.nonzero((b & 0x80) == 0)[0] + 1  # byte index AFTER varint i
    if ends.size != int(tfs.sum()):
        raise ValueError(
            f"positions payload holds {ends.size} varints, "
            f"tfs sum to {int(tfs.sum())}"
        )
    vstarts = np.empty_like(ends)
    vstarts[0] = 0
    vstarts[1:] = ends[:-1]
    cum = np.concatenate(([0], np.cumsum(tfs)))  # varint index per doc
    vs, ve = cum[sel], cum[sel + 1]
    bstart = vstarts[vs]
    bend = np.where(ve > vs, ends[np.maximum(ve - 1, 0)], bstart)
    lens_b = bend - bstart
    total_b = int(lens_b.sum())
    head = np.cumsum(lens_b) - lens_b
    gidx = (
        np.arange(total_b, dtype=np.int64)
        - np.repeat(head, lens_b)
        + np.repeat(bstart, lens_b)
    )
    vals = varint_decode(
        b[gidx].tobytes(), expect=int(out_tfs.sum())
    ).astype(np.int64)
    cs = np.cumsum(vals)
    seg0 = starts_out[:-1]
    base = cs[seg0] - vals[seg0]
    pos = cs - np.repeat(base, out_tfs)
    return pos, starts_out


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
):
    """Compress one term's postings (sorted by doc_id, tree.rs:211).

    Returns (docs_bytes, tfs_bytes, dls_bytes, blocks) where blocks is a
    list of dicts {last_doc_id, max_tf, max_norm, doc_off, tf_off, dl_off}
    per block of ``block_size`` postings. max_norm is the exact per-block
    maximum of the BM25 tf-normalization  tf/(tf + k1*(1-b+b*dl/avgdl)),
    so a safe score upper bound for the term in a block is
    idf * (k1+1) * max_norm  (block-max WAND). The *_off fields are byte
    offsets of the block's first value in each stream, enabling per-block
    lazy decode (a skipped block is never even decompressed); the first
    doc_id gap of block i is relative to block i-1's last_doc_id.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return b"", b"", b"", []
    if n > 1 and (np.diff(doc_ids) <= 0).any():
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:], casting="unsafe")
    docs_bytes = varint_encode(gaps)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    tfs_bytes = varint_encode(tfs)
    dls_bytes = varint_encode(dls)

    tfd = tfs.astype(np.float64)
    norm = tfd / (tfd + k1 * (1.0 - b + b * dls / max(avgdl, 1e-12)))

    # byte offset of each value in each stream -> block start offsets
    doc_offs = np.concatenate(([0], np.cumsum(varint_lengths(gaps))))
    tf_offs = np.concatenate(([0], np.cumsum(varint_lengths(tfs))))
    dl_offs = np.concatenate(([0], np.cumsum(varint_lengths(dls))))

    blocks = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blocks.append(
            {
                "last_doc_id": int(doc_ids[e - 1]),
                "max_tf": int(tfs[s:e].max()),
                "max_norm": float(norm[s:e].max()),
                "doc_off": int(doc_offs[s]),
                "tf_off": int(tf_offs[s]),
                "dl_off": int(dl_offs[s]),
            }
        )
    return docs_bytes, tfs_bytes, dls_bytes, blocks


def decode_block_slice(
    docs_bytes: bytes,
    tfs_bytes: bytes,
    dls_bytes: bytes,
    blocks: list,
    i: int,
    j: int,
    n: int,
    block_size: int = BLOCK_SIZE,
):
    """Decode only blocks [i, j) of one term's postings (lazy block decode).

    Returns (doc_ids, tfs, dls) for postings in those blocks. Uses the
    per-block byte offsets so skipped blocks are never decompressed.
    """
    n_blocks = len(blocks)
    s_val = i * block_size
    e_val = min(j * block_size, n)
    count = e_val - s_val
    if count <= 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    d0 = blocks[i]["doc_off"]
    t0 = blocks[i]["tf_off"]
    l0 = blocks[i]["dl_off"]
    if j < n_blocks:
        d1, t1, l1 = blocks[j]["doc_off"], blocks[j]["tf_off"], blocks[j]["dl_off"]
    else:
        d1, t1, l1 = len(docs_bytes), len(tfs_bytes), len(dls_bytes)
    gaps = varint_decode(docs_bytes[d0:d1], count)
    base = blocks[i - 1]["last_doc_id"] if i > 0 else 0
    doc_ids = base + np.cumsum(gaps.astype(np.int64))
    tfs = varint_decode(tfs_bytes[t0:t1], count).astype(np.int64)
    dls = varint_decode(dls_bytes[l0:l1], count).astype(np.int64)
    return doc_ids, tfs, dls


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
):
    """Encode MANY terms' postings in one vectorized pass.

    Inputs are the whole shard's postings concatenated in (term, doc_id)
    order; ``starts`` (len n_terms+1) marks each term's run. Produces
    byte-identical output to per-term `encode_postings` but with O(1)
    numpy calls for the shard instead of O(n_terms): the per-small-array
    overhead of thousands of encode calls is what dominated the postings
    stage under full executor concurrency.

    Returns (docs_col, tfs_col, dls_col, blocks_col): per-term lists of
    bytes / bytes / bytes / list-of-block-dicts.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = doc_ids.size
    nt = starts.size - 1
    if n == 0:
        return [], [], [], []

    # per-term delta: first gap of a run is the absolute doc_id
    prev = np.empty(n, dtype=np.int64)
    prev[1:] = doc_ids[:-1]
    prev[starts[:-1]] = 0
    gaps = doc_ids - prev
    is_start = np.zeros(n, dtype=bool)
    is_start[starts[:-1]] = True
    if (gaps[~is_start] <= 0).any():
        raise ValueError("doc_ids must be strictly increasing within a term")

    docs_buf, d_len = _varint_encode_with_lengths(gaps.astype(np.uint64))
    tfs_buf, t_len = _varint_encode_with_lengths(tfs.astype(np.uint64))
    dls_buf, l_len = _varint_encode_with_lengths(dls.astype(np.uint64))
    d_cum = np.concatenate(([0], np.cumsum(d_len)))
    t_cum = np.concatenate(([0], np.cumsum(t_len)))
    l_cum = np.concatenate(([0], np.cumsum(l_len)))

    tfd = tfs.astype(np.float64)
    norm = tfd / (tfd + k1 * (1.0 - b + b * dls / max(avgdl, 1e-12)))

    # global block partition: per term, blocks of block_size postings.
    # Consecutive blocks tile [0, n) exactly, so one reduceat per metric
    # computes every block's max.
    counts = starts[1:] - starts[:-1]
    nblocks = -(-counts // block_size)
    nblocks = np.maximum(nblocks, 0)
    total_blocks = int(nblocks.sum())
    term_of_block = np.repeat(np.arange(nt), nblocks)
    nb_cum = np.concatenate(([0], np.cumsum(nblocks)))
    blk_in_term = np.arange(total_blocks) - nb_cum[term_of_block]
    bs = starts[term_of_block] + blk_in_term * block_size
    be = np.minimum(bs + block_size, starts[term_of_block + 1])
    max_tf_b = np.maximum.reduceat(tfs, bs) if total_blocks else np.zeros(0)
    max_norm_b = np.maximum.reduceat(norm, bs) if total_blocks else np.zeros(0)
    last_doc_b = doc_ids[be - 1] if total_blocks else np.zeros(0, dtype=np.int64)
    doc_off_b = d_cum[bs] - d_cum[starts[term_of_block]]
    tf_off_b = t_cum[bs] - t_cum[starts[term_of_block]]
    dl_off_b = l_cum[bs] - l_cum[starts[term_of_block]]

    docs_col, tfs_col, dls_col, blocks_col = [], [], [], []
    for i in range(nt):
        s, e = starts[i], starts[i + 1]
        docs_col.append(docs_buf[d_cum[s]: d_cum[e]])
        tfs_col.append(tfs_buf[t_cum[s]: t_cum[e]])
        dls_col.append(dls_buf[l_cum[s]: l_cum[e]])
        blocks = [
            {
                "last_doc_id": int(last_doc_b[j]),
                "max_tf": int(max_tf_b[j]),
                "max_norm": float(max_norm_b[j]),
                "doc_off": int(doc_off_b[j]),
                "tf_off": int(tf_off_b[j]),
                "dl_off": int(dl_off_b[j]),
            }
            for j in range(nb_cum[i], nb_cum[i + 1])
        ]
        blocks_col.append(blocks)
    return docs_col, tfs_col, dls_col, blocks_col


def decode_postings(docs_bytes: bytes, tfs_bytes: bytes, dls_bytes: bytes, n: int):
    """Inverse of encode_postings -> (doc_ids, tfs, dls) int64 arrays."""
    gaps = varint_decode(docs_bytes, n)
    doc_ids = np.cumsum(gaps.astype(np.int64))
    tfs = varint_decode(tfs_bytes, n).astype(np.int64)
    dls = varint_decode(dls_bytes, n).astype(np.int64)
    return doc_ids, tfs, dls
