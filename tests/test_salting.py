"""Skew handling white-box: hot terms (df > salt_budget) must split into
multiple salted segments with disjoint, ordered doc_id ranges, and the
decoded union must still equal the oracle postings exactly — i.e. the
salted 'merge' really is pure concatenation (SURVEY.md §7.3)."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.codec import decode_postings
from search_engine_spark.operators.index_build import (
    BLOCKS_PER_SALT_CAP,
    build_index,
)
from search_engine_spark.synth import make_transcripts

SALT_BUDGET = 50  # force salting: hot terms have df in the hundreds


@pytest.fixture(scope="module")
def salted_index(spark, tmp_path_factory):
    pdf = make_transcripts(n_conversations=60, seed=13)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = str(tmp_path_factory.mktemp("salt") / "idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        out,
        n_parts=2,
        resume=False,
        salt_budget=SALT_BUDGET,
    )
    return out


def test_hot_terms_get_multiple_salts(spark, salted_index):
    rows = spark.read.parquet(f"{salted_index}/postings").collect()
    stats = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{salted_index}/term_stats").collect()
    }
    salts_per_term: dict[tuple[str, int], set[int]] = {}
    for r in rows:
        key = (r["term"], r["part_id"])
        salts_per_term.setdefault(key, set()).add(
            r["block_id"] // BLOCKS_PER_SALT_CAP
        )
    hot = [t for t, df in stats.items() if df > 4 * SALT_BUDGET]
    assert hot, "fixture must contain hot terms"
    for t in hot:
        n_salts = max(
            len(s) for (term, _), s in salts_per_term.items() if term == t
        )
        assert n_salts > 1, f"hot term {t!r} (df={stats[t]}) was not salted"
    # rare terms must NOT pay salting overhead
    rare = [t for t, df in stats.items() if df <= SALT_BUDGET]
    for t in rare[:20]:
        for (term, _), s in salts_per_term.items():
            if term == t:
                assert s == {0}


def test_salted_segments_are_ordered_disjoint(spark, salted_index):
    rows = spark.read.parquet(f"{salted_index}/postings").collect()
    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault((r["term"], r["part_id"]), []).append(r)
    for (term, part), blocks in by_group.items():
        blocks.sort(key=lambda r: r["block_id"])
        prev_last = -1
        for r in blocks:
            ids, _ = decode_postings(bytes(r["doc_ids"]), bytes(r["tfs"]))
            assert ids[0] == r["first_doc_id"] and ids[-1] == r["last_doc_id"]
            assert list(ids) == sorted(set(ids.tolist()))
            # concatenation invariant: block ranges strictly increase in
            # block_id order, across salt boundaries too
            assert ids[0] > prev_last, (term, part, r["block_id"])
            prev_last = int(ids[-1])


def test_salted_decode_equals_oracle(spark, salted_index):
    from search_engine_spark.oracle import build_oracle_index

    pdf = make_transcripts(n_conversations=60, seed=13)
    oracle = build_oracle_index(pdf)
    got: dict[str, list] = {}
    for r in spark.read.parquet(f"{salted_index}/postings").collect():
        ids, tfs = decode_postings(bytes(r["doc_ids"]), bytes(r["tfs"]))
        got.setdefault(r["term"], []).extend(zip(ids.tolist(), tfs.tolist()))
    got = {t: sorted(v) for t, v in got.items()}
    exp = {t: sorted(pl) for t, pl in oracle.postings.items()}
    assert got == exp
