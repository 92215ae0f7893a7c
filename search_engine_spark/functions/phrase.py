"""Positional text operators: exact-phrase counting and term proximity.

These go BEYOND the reference engine (its index stores only per-doc lemma
counts — IndexationServiceImpl.java builds {lemma: rank} maps, no
positions), but they are table-stakes for a fulltext engine and for
training-data curation (boilerplate phrase detection, template spotting,
co-occurrence features). Rather than widening the posting codec with
position lists (which would double index size for a feature most queries
never use), they are implemented as pure Catalyst expressions over the
analyzed lemma array — zero Python, whole-stage codegen, no shuffle: at
100 TB this is one embarrassingly-parallel scan whose cost is bounded by
per-document array length (transcript turns are short), and the filter on
the result prunes rows before anything wide happens downstream.

All builders take the lemma array produced by ``analyzer.terms_col`` so
phrase/proximity semantics are defined AFTER stop-word removal and
lemmatization — "the spark table" and "spark tables" match the phrase
("spark", "table") identically, exactly how the query analyzer would
normalize them.

Out-of-range safety: ``F.get`` (0-based) returns NULL beyond the array
bounds instead of raising under ANSI mode, and a conjunction whose tail
is NULL is NULL — so start positions within m-1 of the end simply fail
the match without guards. ``F.sequence(0, size-m)`` DESCENDS when
size < m (Spark generates a negative-step sequence); every such bogus
start index fails the same NULL-conjunction way, so no explicit
size >= m branch is needed (property-tested in tests/test_phrase.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def phrase_count_col(lemmas: Column, phrase: tuple[str, ...]) -> Column:
    """Number of (possibly overlapping) occurrences of ``phrase`` as a
    CONTIGUOUS lemma run inside the ``lemmas`` array. Returns int."""
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    m = len(phrase)

    def is_match(i: Column) -> Column:
        return reduce(
            lambda a, b: a & b,
            [F.get(lemmas, i + F.lit(j)) == F.lit(t)
             for j, t in enumerate(phrase)],
        )

    starts = F.sequence(F.lit(0), F.size(lemmas) - F.lit(m))
    return F.size(F.filter(starts, is_match))


def positions_col(lemmas: Column, term: str) -> Column:
    """0-based positions of ``term`` in the lemma array (array<int>)."""
    tagged = F.transform(
        lemmas, lambda x, i: F.when(x == F.lit(term), i)
    )
    return F.filter(tagged, lambda v: v.isNotNull())


def min_distance_col(lemmas: Column, term_a: str, term_b: str) -> Column:
    """Minimum token distance between any occurrence of ``term_a`` and any
    of ``term_b`` (NULL when either term is absent). The pairwise
    flatten is bounded by per-doc occurrence counts — fine for
    document-sized arrays; a 100 TB corpus runs this as a single
    narrow scan."""
    pa = positions_col(lemmas, term_a)
    pb = positions_col(lemmas, term_b)
    dists = F.flatten(
        F.transform(pa, lambda i: F.transform(pb, lambda j: F.abs(i - j)))
    )
    return F.array_min(dists)
