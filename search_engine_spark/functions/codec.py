"""Delta + varbyte posting-list codec, numpy-vectorized.

The reference stores one MySQL row per (term, doc) pair
(model/Index.java:11-27) — no compression. At 10^12 turns that layout is
untenable; we pack sorted doc_id runs as delta-encoded varbyte blocks
(classic VByte: 7 data bits per byte, high bit = continuation), with the
parallel tf array varbyte-packed as-is.

All encode/decode is numpy array math — no per-element Python loops — so it
runs fast inside Arrow-batched ``applyInPandas``/``mapInPandas`` stages.
Round-trip correctness is property-tested with hypothesis
(tests/test_codec.py).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as VByte — the single-slice case of
    varbyte_encode_sliced (one shared width/scatter implementation, so a
    codec fix never has to land twice)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return varbyte_encode_sliced(v, np.array([0], dtype=np.int64))[0]


def varbyte_encode_sliced(
    values: np.ndarray, starts: np.ndarray
) -> list[bytes]:
    """Encode ONE array, slice the flat buffer at value boundaries
    ``starts`` (ascending, starts[0] == 0) -> one bytes object per slice.

    Equivalent to ``[varbyte_encode(values[a:b]) for a, b in pairs]`` but
    the width/scatter passes run once over the whole array — this is what
    makes per-block encoding cheap when a term group spans thousands of
    blocks (vectorization amortizes over the group, not the block).
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    widths = np.ones(v.size, dtype=np.int64)
    w = v >> np.uint64(7)
    while True:
        mask = w > 0
        if not mask.any():
            break
        widths[mask] += 1
        w = w >> np.uint64(7)
    ends = np.cumsum(widths)
    starts_b = ends - widths
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_w = int(widths.max())
    for j in range(max_w):
        sel = widths > j
        idx = starts_b[sel] + j
        chunk = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        is_last = widths[sel] == (j + 1)
        out[idx] = chunk.astype(np.uint8) | np.where(is_last, 0, 0x80).astype(
            np.uint8
        )
    flat = out.tobytes()
    s = np.asarray(starts, dtype=np.int64)
    byte_lo = np.where(s == 0, 0, ends[np.maximum(s, 1) - 1])
    byte_hi = np.concatenate((byte_lo[1:], [total]))
    return [flat[a:b] for a, b in zip(byte_lo.tolist(), byte_hi.tolist())]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value index for each byte = count of terminators before this byte
    value_idx = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    n_values = int(is_last.sum())
    # position of byte within its value = offset from value start
    value_starts = np.concatenate(([0], np.nonzero(is_last)[0] + 1))[:-1]
    byte_pos = np.arange(b.size) - value_starts[value_idx]
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(
        out,
        value_idx,
        (b & np.uint8(0x7F)).astype(np.uint64) << (7 * byte_pos).astype(np.uint64),
    )
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 array -> first value + gaps (gap-1 not used;
    doc_ids are unique so gaps >= 1, stored as-is for simplicity)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    return np.concatenate(([v[0]], np.diff(v)))


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    if d.size == 0:
        return d
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted unique doc_ids, parallel tfs) -> (packed doc_ids, packed tfs)."""
    return (
        varbyte_encode(delta_encode(doc_ids)),
        varbyte_encode(np.asarray(tfs, dtype=np.uint64)),
    )


def decode_postings(doc_ids_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_postings -> (doc_ids int64, tfs int64)."""
    return (
        delta_decode(varbyte_decode(doc_ids_buf)).astype(np.int64),
        varbyte_decode(tfs_buf).astype(np.int64),
    )


def varbyte_decode_groups(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY VByte buffers in ONE vectorized pass.

    VByte is self-delimiting (high bit = continuation), so the
    concatenation of buffers decodes to the concatenation of their
    values; per-buffer value counts are recovered by counting terminator
    bytes inside each buffer's byte range. Returns
    ``(values_concat uint64, counts_per_buffer int64)``. This is what
    makes block decode cheap when a scan partition holds tens of
    thousands of small blocks: the bit-twiddling passes run once over
    the group, not once per block.
    """
    lens = np.fromiter(
        (len(b) for b in bufs), dtype=np.int64, count=len(bufs)
    )
    cat = b"".join(bufs)
    b = np.frombuffer(cat, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(
            len(bufs), dtype=np.int64
        )
    is_last = (b & 0x80) == 0
    term_cum = np.concatenate(([0], np.cumsum(is_last)))
    ends = np.cumsum(lens)
    counts = term_cum[ends] - term_cum[ends - lens]
    value_idx = term_cum[:-1]
    n_values = int(term_cum[-1])
    value_starts = np.concatenate(([0], np.nonzero(is_last)[0] + 1))[:-1]
    byte_pos = np.arange(b.size) - value_starts[value_idx]
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(
        out,
        value_idx,
        (b & np.uint8(0x7F)).astype(np.uint64)
        << (7 * byte_pos).astype(np.uint64),
    )
    return out, counts


def decode_positions_grouped(
    pos_bufs, tfs_flat: np.ndarray
) -> np.ndarray:
    """Grouped decode of per-block POSITION streams (store_positions=True
    builds). Each block's stream is the concatenation of its rows'
    position lists, delta-encoded WITHIN each row (first position
    absolute, the rest gaps) — the row boundaries are the block's tf
    values, so the caller passes the already-decoded per-row tfs
    concatenated in the same block order. Returns the absolute positions
    as one flat int64 array, segmented by ``tfs_flat`` (row i owns the
    next tfs_flat[i] values). Same segmented-cumsum-with-resets shape as
    decode_postings_grouped, with rows instead of blocks as segments."""
    gaps, _ = varbyte_decode_groups(pos_bufs)
    tfs = np.asarray(tfs_flat, dtype=np.int64)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    if int(tfs.sum()) != int(gaps.size):
        raise ValueError(
            f"positions stream length {gaps.size} != sum(tf) {tfs.sum()}"
        )
    s = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    nz = tfs > 0
    base = np.zeros(tfs.size, dtype=np.uint64)
    base[nz] = s[starts[nz]] - gaps[starts[nz]]
    return (s - np.repeat(base, tfs)).astype(np.int64)


def decode_doc_ids_grouped(ids_bufs) -> tuple[np.ndarray, np.ndarray]:
    """The doc_ids half of ``decode_postings_grouped`` alone:
    -> (doc_ids int64 concat, counts per block). For readers that need
    MEMBERSHIP, not scores (boolean-NOT exclusion) — skips the tfs
    VByte pass entirely, so the caller can also skip reading the tfs/dls
    columns from parquet.

    Each block's ids stream is [first_absolute, gap, gap, ...], so after
    one grouped VByte decode the absolutes come back via a segmented
    cumsum: subtract, per block, the running sum accumulated BEFORE the
    block (base = S[start] - first), all in numpy.
    """
    gaps, n = varbyte_decode_groups(ids_bufs)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64), n
    s = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    nz = n > 0
    base = np.zeros(n.size, dtype=np.uint64)
    base[nz] = s[starts[nz]] - gaps[starts[nz]]
    ids = (s - np.repeat(base, n)).astype(np.int64)
    return ids, n


def decode_postings_grouped(
    ids_bufs, tfs_bufs
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grouped inverse of ``encode_postings`` over MANY blocks at once:
    -> (doc_ids int64 concat, tfs int64 concat, counts per block).
    Bit-identical to concatenating per-block ``decode_postings``
    results; the ids half is ``decode_doc_ids_grouped``.
    """
    ids, n = decode_doc_ids_grouped(ids_bufs)
    if ids.size == 0:
        return ids, np.empty(0, dtype=np.int64), n
    tfs, _ = varbyte_decode_groups(tfs_bufs)
    return ids, tfs.astype(np.int64), n
