"""Property tests for the interval algebra under block skipping and
scope resolution (SearchEngine._merge_spans / _intersect_spans): pure
driver-side helpers, so these run without a SparkSession. The reference
model is brute-force integer-set membership."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.query import SearchEngine

spans_st = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 60)).map(
        lambda p: (min(p), max(p))
    ),
    min_size=1,
    max_size=8,
)


def _cover(spans):
    out = set()
    for lo, hi in spans:
        out.update(range(lo, hi + 1))
    return out


@given(spans_st)
@settings(max_examples=200, deadline=None)
def test_merge_spans_covers_exactly(spans):
    merged = SearchEngine._merge_spans(spans)
    assert _cover(merged) == _cover(spans)
    # sorted, non-overlapping, non-adjacent (maximal runs)
    for (alo, ahi), (blo, bhi) in zip(merged, merged[1:]):
        assert alo <= ahi and blo <= bhi
        assert blo > ahi + 1


@given(spans_st, spans_st)
@settings(max_examples=200, deadline=None)
def test_intersect_spans_is_set_intersection(a, b):
    am, bm = SearchEngine._merge_spans(a), SearchEngine._merge_spans(b)
    got = SearchEngine._intersect_spans(am, bm)
    assert _cover(got) == _cover(a) & _cover(b)
    for (alo, ahi), (blo, bhi) in zip(got, got[1:]):
        assert alo <= ahi and blo <= bhi
        assert blo > ahi  # sorted and disjoint
