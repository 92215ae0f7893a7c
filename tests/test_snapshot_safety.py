"""Snapshot-log safety under destructive rewrites (r4 review findings):

- compaction invalidates history BEFORE its swaps, so a crash mid-swap
  leaves NO resolvable stale snapshot whose part_ids could alias the
  renumbered compacted parts (the silent-wrong-read window);
- snapshot ids stay monotonic across wholesale invalidation (an expired
  id is never reissued to different data);
- recovery's partial-documents rollback expires the snapshot records its
  rewrite dangles, instead of leaving as-of reads to die on PATH_NOT_FOUND;
- resolve_snapshot refuses (loudly, with the real story) any surviving
  record whose pinned documents files or delete batch dirs are gone;
- the API surfaces all of the above as the error envelope, never a raw
  exception.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from search_engine_spark.api import EngineAPI
from search_engine_spark.operators.compaction import compact_index
from search_engine_spark.operators.incremental import (
    delete_docs,
    incremental_update,
)
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.operators.snapshots import (
    commit_snapshot,
    expire_dangling_snapshots,
    invalidate_snapshots,
    list_snapshots,
    resolve_snapshot,
)
from search_engine_spark.synth import make_transcripts

QUERY = "query index"


def _to_sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _build_with_append(spark, tmp_path, name="idx", n_conversations=24):
    pdf = make_transcripts(n_conversations=n_conversations, seed=13)
    convs = sorted(pdf["conv_id"].unique())
    cut = convs[len(convs) // 2]
    idx = str(tmp_path / name)
    build_index(spark, _to_sdf(spark, pdf[pdf["conv_id"] < cut]), idx,
                n_parts=2, resume=False)
    incremental_update(spark, _to_sdf(spark, pdf[pdf["conv_id"] >= cut]), idx)
    return idx, pdf


def test_invalidate_keeps_ids_monotonic(spark, tmp_path):
    idx, _ = _build_with_append(spark, tmp_path)
    assert [s["snapshot_id"] for s in list_snapshots(idx)] == [1, 2]
    assert invalidate_snapshots(idx) == [1, 2]
    assert list_snapshots(idx) == []
    # resolvable nothing — and the error names the truncation, not the
    # "no snapshot store" shape a never-snapshotted index gets
    with pytest.raises(ValueError, match="truncated"):
        resolve_snapshot(idx, 1)
    # the next commit continues PAST the high-water mark: id 3, never a
    # reissued 1 that an old reader could silently mistake for old data
    snap = commit_snapshot(spark, idx, "append")
    assert snap["snapshot_id"] == 3


def test_compaction_crash_window_is_loud_not_wrong(spark, tmp_path,
                                                   monkeypatch):
    """Kill compaction right before its final REPLACE commit (after every
    swap + manifest rewrite — the widest crash window). Old snapshot ids
    must resolve to a loud error, never to the renumbered parts; a
    replayed compaction must heal and mint a monotonic id."""
    import search_engine_spark.operators.snapshots as snaps_mod

    idx, pdf = _build_with_append(spark, tmp_path)
    live_before = {
        (r["doc_id"], r["score"])
        for r in SearchEngine(spark, idx).search_ids(QUERY, k=10).collect()
    }
    real_commit = snaps_mod.commit_snapshot

    def boom(*a, **k):
        raise RuntimeError("injected crash before REPLACE commit")

    monkeypatch.setattr(snaps_mod, "commit_snapshot", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_index(spark, idx, n_parts=1)
    monkeypatch.setattr(snaps_mod, "commit_snapshot", real_commit)

    # the crash window: every pre-compaction snapshot is gone, loudly
    with pytest.raises(ValueError, match="truncated"):
        resolve_snapshot(idx, 1)
    with pytest.raises(ValueError, match="truncated"):
        resolve_snapshot(idx, 2)
    # HEAD reads are unaffected (live layout + manifest already swapped)
    assert {
        (r["doc_id"], r["score"])
        for r in SearchEngine(spark, idx).search_ids(QUERY, k=10).collect()
    } == live_before
    # replaying the compaction heals the log with a monotonic id
    compact_index(spark, idx, n_parts=1)
    snaps = list_snapshots(idx)
    assert len(snaps) == 1
    assert snaps[0]["operation"] == "replace"
    assert snaps[0]["snapshot_id"] >= 3


def test_recovery_documents_rollback_expires_dangling(spark, tmp_path):
    """Crash mid-documents-append, then replay: recovery rewrites the doc
    store (new file names), which dangles every retained snapshot's
    pinned documents_files — those records must be EXPIRED by recovery,
    and post-replay commits must continue monotonic."""
    pdf = make_transcripts(n_conversations=20, seed=9)
    convs = sorted(pdf["conv_id"].unique())
    cut = convs[len(convs) // 2]
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf[pdf["conv_id"] < cut]), idx,
                n_parts=1, resume=False)
    base_max = int(
        spark.read.parquet(f"{idx}/documents").agg(F.max("doc_id"))
        .collect()[0][0]
    )
    extra = _to_sdf(spark, pdf[pdf["conv_id"] >= cut])
    incremental_update(spark, extra, idx)
    assert [s["snapshot_id"] for s in list_snapshots(idx)] == [1, 2]

    # simulate the crash exactly like test_incremental does: un-commit
    # the part and keep only the first appended documents row
    part_rows = [
        f for f in os.listdir(f"{idx}/_manifest")
        if f.startswith("part_")
        and json.load(open(f"{idx}/_manifest/{f}"))["partition_id"] > 0
    ]
    os.remove(f"{idx}/_manifest/{part_rows[0]}")
    docs = spark.read.parquet(f"{idx}/documents")
    docs.filter(
        (F.col("doc_id") <= base_max) | (F.col("doc_id") == base_max + 1)
    ).write.mode("overwrite").parquet(f"{idx}/documents_new")
    shutil.rmtree(f"{idx}/documents")
    os.rename(f"{idx}/documents_new", f"{idx}/documents")

    # replay triggers recovery's rollback (whole-dir rewrite) + re-index
    incremental_update(spark, extra, idx)
    # no retained record pins a missing file; every survivor resolves
    present = {p.name for p in Path(idx, "documents").glob("*.parquet")}
    for s in list_snapshots(idx):
        assert set(s["documents_files"]) <= present
        resolve_snapshot(idx, s["snapshot_id"])  # must not raise
    # ids never restarted
    ids = [s["snapshot_id"] for s in list_snapshots(idx)]
    assert ids == sorted(ids) and ids[-1] >= 3


def test_resolve_refuses_purged_delete_dirs(spark, tmp_path):
    """A surviving record pinning delete batch dirs that a later rewrite
    purged must refuse loudly — reading through it would resurrect
    replaced docs with no error."""
    pdf = make_transcripts(n_conversations=16, seed=7)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    keys = _to_sdf(spark, pdf).select("conv_id", "turn_idx").limit(3)
    delete_docs(spark, keys, idx, tombstone=False)
    head = list_snapshots(idx)[-1]
    assert head["delete_dirs"]
    # strand the record: purge the vector behind the log's back
    shutil.rmtree(Path(idx) / "_deletes")
    with pytest.raises(ValueError, match="delete batches"):
        resolve_snapshot(idx, head["snapshot_id"])
    # expire_dangling_snapshots collects exactly the stranded records
    assert head["snapshot_id"] in expire_dangling_snapshots(idx)
    with pytest.raises(ValueError, match="not found|truncated"):
        resolve_snapshot(idx, head["snapshot_id"])


def test_api_snapshot_errors_stay_in_envelope(spark, tmp_path):
    """EngineAPI.search(snapshot_id=...) returns the {result, error}
    envelope for unknown/expired ids and truncated stores (r4 review:
    ValueError used to escape raw)."""
    pdf = make_transcripts(n_conversations=12, seed=5)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    api = EngineAPI(spark, idx)
    ok = api.search(QUERY, snapshot_id=1)
    assert ok["result"] is True
    res = api.search(QUERY, snapshot_id=999)
    assert res["result"] is False and "999" in res["error"]
    invalidate_snapshots(idx)
    res = api.search(QUERY, snapshot_id=1)
    assert res["result"] is False and "truncated" in res["error"]
