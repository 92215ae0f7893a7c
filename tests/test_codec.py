"""Varbyte/delta codec property tests (hypothesis) — round-trip identity on
arbitrary doc_id/tf arrays, including 10^12-scale ids (the target corpus is
10^12 turns, so doc_ids must round-trip far beyond int32)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**13), min_size=1, max_size=400)
)
def test_postings_roundtrip(ids_set):
    ids = np.array(sorted(ids_set), dtype=np.uint64)
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 1000, ids.size).astype(np.uint64)
    db, tb = encode_postings(ids, tfs)
    d2, t2 = decode_postings(db, tb)
    assert d2.tolist() == ids.astype(np.int64).tolist()
    assert t2.tolist() == tfs.astype(np.int64).tolist()


def test_delta():
    ids = np.array([5, 6, 100, 10**12], dtype=np.uint64)
    assert delta_decode(delta_encode(ids)).tolist() == ids.tolist()


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_compression_is_compact():
    # dense small deltas must stay ~1-2 bytes per posting
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    buf = varbyte_encode(delta_encode(ids))
    assert len(buf) / ids.size < 1.2


def test_varbyte_encode_sliced_matches_per_block():
    import numpy as np
    from hypothesis import given, settings, strategies as st
    from search_engine_spark.functions.codec import varbyte_encode, varbyte_encode_sliced

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200),
        st.integers(min_value=1, max_value=50),
    )
    def check(vals, bs):
        v = np.array(vals, dtype=np.uint64)
        starts = np.arange(0, v.size, bs, dtype=np.int64)
        sliced = varbyte_encode_sliced(v, starts)
        expected = [
            varbyte_encode(v[a : a + bs]) for a in starts.tolist()
        ]
        assert sliced == expected

    check()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sets(
            st.integers(min_value=0, max_value=10**13), min_size=0,
            max_size=60,
        ),
        min_size=1, max_size=20,
    )
)
def test_doc_ids_grouped_matches_full_decode(groups):
    """decode_doc_ids_grouped (the membership-only reader behind boolean
    NOT) must return exactly the ids half of decode_postings_grouped."""
    from search_engine_spark.functions.codec import (
        decode_doc_ids_grouped,
        decode_postings_grouped,
    )

    rng = np.random.default_rng(11)
    ids_bufs, tfs_bufs = [], []
    for g in groups:
        ids = np.array(sorted(g), dtype=np.uint64)
        tfs = rng.integers(1, 1000, ids.size).astype(np.uint64)
        db, tb = encode_postings(ids, tfs)
        ids_bufs.append(db)
        tfs_bufs.append(tb)
    ids_only, n_only = decode_doc_ids_grouped(ids_bufs)
    ids_full, _, n_full = decode_postings_grouped(ids_bufs, tfs_bufs)
    assert ids_only.tolist() == ids_full.tolist()
    assert n_only.tolist() == n_full.tolist()
