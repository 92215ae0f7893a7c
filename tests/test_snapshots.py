"""Snapshot log (operators/snapshots.py): atomic commits on every index
mutation, bit-exact as-of reads across incremental appends, REPLACE
truncation on compaction, retention sweeps, and loud failures for
expired/unknown ids."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from search_engine_spark.api import EngineAPI
from search_engine_spark.operators.compaction import compact_index
from search_engine_spark.operators.incremental import incremental_update
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.operators.snapshots import (
    commit_snapshot,
    expire_snapshots,
    list_snapshots,
    resolve_snapshot,
    stats_dir,
)
from search_engine_spark.synth import make_transcripts

QUERY = "query index"


def _to_sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _rows(eng, k=15):
    return [
        (r["doc_id"], r["score"])
        for r in eng.search_ids(QUERY, k=k).collect()
    ]


@pytest.fixture(scope="module")
def snap_index(spark, tmp_path_factory):
    """Base build (v1) + captured pre-append results + one incremental
    append (v2). Returns (idx, rows_as_of_build, base_df_rows)."""
    idx = str(tmp_path_factory.mktemp("snapidx") / "index")
    pdf = make_transcripts(n_conversations=50, seed=11)
    cut = "conv-000040"
    build_index(
        spark, _to_sdf(spark, pdf[pdf["conv_id"] < cut]), idx,
        n_parts=2, resume=False,
    )
    pre_rows = _rows(SearchEngine(spark, idx))
    pre_terms = SearchEngine(spark, idx).term_stats.count()
    incremental_update(spark, _to_sdf(spark, pdf[pdf["conv_id"] >= cut]), idx)
    return idx, pre_rows, pre_terms


def test_build_and_append_commit_snapshots(spark, snap_index):
    idx, _, _ = snap_index
    snaps = list_snapshots(idx)
    assert [s["operation"] for s in snaps] == ["build", "append"]
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent_id"] == 1
    # append added exactly one part and at least one documents file
    assert len(snaps[1]["part_ids"]) == len(snaps[0]["part_ids"]) + 1
    assert set(snaps[0]["part_ids"]) < set(snaps[1]["part_ids"])
    assert set(snaps[0]["documents_files"]) < set(snaps[1]["documents_files"])
    assert snaps[1]["n_docs"] > snaps[0]["n_docs"]
    # each snapshot's stats copy is retained
    for s in snaps:
        assert (stats_dir(idx, s["stats_epoch"]) / "term_stats").exists()
    # no torn commits left behind
    assert not list(Path(idx, "_snapshots").glob("*.tmp"))


def test_as_of_read_is_bit_exact(spark, snap_index):
    """The time-travel engine over snapshot v1 reproduces the EXACT
    results captured from the live engine before the append — scores,
    ranks, dictionary size, and corpus scalars."""
    idx, pre_rows, pre_terms = snap_index
    asof = SearchEngine(spark, idx, snapshot_id=1)
    assert _rows(asof) == pre_rows
    assert asof.term_stats.count() == pre_terms
    head = SearchEngine(spark, idx)
    # the append genuinely changed HEAD (otherwise as-of proves nothing)
    assert head.n_docs > asof.n_docs
    assert _rows(head) != pre_rows
    # HEAD explicitly pinned == HEAD implicitly resolved
    assert _rows(SearchEngine(spark, idx, snapshot_id=2)) == _rows(head)
    # the as-of documents view is the pre-append doc store
    assert asof.documents.count() == asof.n_docs


def test_resume_noop_build_does_not_churn_log(spark, snap_index):
    idx, _, _ = snap_index
    before = [s["snapshot_id"] for s in list_snapshots(idx)]
    build_index(spark, None, idx, resume=True)
    assert [s["snapshot_id"] for s in list_snapshots(idx)] == before


def test_commit_snapshot_idempotent(spark, snap_index):
    idx, _, _ = snap_index
    head = list_snapshots(idx)[-1]
    again = commit_snapshot(spark, idx, "append")
    assert again["snapshot_id"] == head["snapshot_id"]


def test_unknown_snapshot_id_is_loud(spark, snap_index):
    idx, _, _ = snap_index
    with pytest.raises(ValueError, match="not found"):
        SearchEngine(spark, idx, snapshot_id=99)


def test_no_store_is_loud(spark, tmp_path):
    with pytest.raises(ValueError, match="no snapshot store"):
        resolve_snapshot(str(tmp_path / "nope"))


def test_api_surface(spark, snap_index):
    idx, pre_rows, _ = snap_index
    api = EngineAPI(spark, idx)
    listed = api.snapshots()
    assert listed["result"] and len(listed["snapshots"]) == 2
    res = api.search(QUERY, snapshot_id=1, limit=15)
    assert res["result"] is True
    got = [(d["doc_id"], d["relevance"]) for d in res["data"]]
    assert got == pre_rows
    # HEAD search differs and the memoized engine is untouched by the
    # per-call as-of engine
    head_res = api.search(QUERY, limit=15)
    assert [(d["doc_id"], d["relevance"]) for d in head_res["data"]] != pre_rows


def test_expire_keeps_head_and_gcs_stats(spark, tmp_path):
    idx = str(tmp_path / "index")
    pdf = make_transcripts(n_conversations=30, seed=12)
    cut1, cut2 = "conv-000020", "conv-000025"
    build_index(spark, _to_sdf(spark, pdf[pdf["conv_id"] < cut1]), idx,
                n_parts=1, resume=False)
    incremental_update(
        spark,
        _to_sdf(spark, pdf[(pdf["conv_id"] >= cut1) & (pdf["conv_id"] < cut2)]),
        idx,
    )
    incremental_update(spark, _to_sdf(spark, pdf[pdf["conv_id"] >= cut2]), idx)
    epochs_before = {s["stats_epoch"] for s in list_snapshots(idx)}
    assert len(list_snapshots(idx)) == 3
    res = expire_snapshots(idx, keep_last=1)
    assert res["expired"] == [1, 2] and res["retained"] == [3]
    with pytest.raises(ValueError, match="not found"):
        SearchEngine(spark, idx, snapshot_id=1)
    # stats copies of expired snapshots are GC'd, HEAD's survives
    kept_epoch = list_snapshots(idx)[0]["stats_epoch"]
    for e in epochs_before:
        assert stats_dir(idx, e).exists() == (e == kept_epoch)
    with pytest.raises(ValueError, match="never expired"):
        expire_snapshots(idx, keep_last=0)


def test_compaction_truncates_history(spark, tmp_path):
    idx = str(tmp_path / "index")
    pdf = make_transcripts(n_conversations=30, seed=13)
    cut = "conv-000022"
    build_index(spark, _to_sdf(spark, pdf[pdf["conv_id"] < cut]), idx,
                n_parts=2, resume=False)
    incremental_update(spark, _to_sdf(spark, pdf[pdf["conv_id"] >= cut]), idx)
    head_rows = _rows(SearchEngine(spark, idx))
    compact_index(spark, idx, n_parts=2)
    snaps = list_snapshots(idx)
    assert len(snaps) == 1 and snaps[0]["operation"] == "replace"
    assert snaps[0]["snapshot_id"] == 3  # ids keep ascending past truncation
    # the replace commit IS head: scores unchanged, as-of it works
    assert _rows(SearchEngine(spark, idx)) == head_rows
    assert _rows(SearchEngine(spark, idx, snapshot_id=3)) == head_rows
    # pre-compaction snapshots are gone because their files are gone
    with pytest.raises(ValueError, match="not found"):
        SearchEngine(spark, idx, snapshot_id=2)


def test_snapshot_json_shape(spark, snap_index):
    idx, _, _ = snap_index
    p = sorted(Path(idx, "_snapshots").glob("v*.json"))[0]
    snap = json.loads(p.read_text())
    for key in ("snapshot_id", "parent_id", "operation", "committed_ts",
                "n_docs", "stats_epoch", "part_ids", "documents_files"):
        assert key in snap
