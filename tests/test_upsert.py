"""Upsert / delete-vector semantics (operators/deletes.py +
incremental_update(upsert=True)): the reference's re-index-page REPLACE
(IndexationServiceImpl.java:119-131, deleteAllByPageId + re-add) over
immutable posting parts, Iceberg merge-on-read style.

The core equivalence: build an index over a CORRUPTED corpus (some turns
carry stale text), upsert the true rows, and the result must answer
queries exactly like a fresh build over the true corpus — same scores
per (conv_id, turn_idx), stale terms gone from results AND from the
dictionary, n_docs unchanged. Compaction is the merge: it physically
drops the replaced rows and purges the vector, score-invisibly.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.compaction import compact_index
from search_engine_spark.operators.deletes import (
    batch_dir_name,
    delete_batch_dirs,
)
from search_engine_spark.operators.incremental import incremental_update
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.operators.snapshots import list_snapshots
from search_engine_spark.synth import make_transcripts

QUERY = "query index"
STALE = "zzstalemark zzstalemark decoy filler words here"
STALE_CUT = "conv-000005"  # convs below this get stale text in the base build


def _to_sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _keyed_scores(spark, eng, query=QUERY, k=25):
    """(conv_id, turn_idx, score) rows — doc_id-independent comparison
    across indexes whose internal ids differ."""
    ids = eng.search_ids(query, k=k)
    remap = eng.documents.select("doc_id", "conv_id", "turn_idx")
    return sorted(
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in ids.join(remap, "doc_id").collect()
    )


@pytest.fixture(scope="module")
def upserted(spark, tmp_path_factory):
    """(idx, ref_idx, pdf, res): idx built over the corrupted corpus then
    upserted with the truth; ref_idx built fresh over the truth."""
    d = tmp_path_factory.mktemp("upsert")
    idx, ref_idx = str(d / "idx"), str(d / "ref")
    pdf = make_transcripts(n_conversations=40, seed=17)
    corrupted = pdf.copy()
    stale_mask = corrupted["conv_id"] < STALE_CUT
    corrupted.loc[stale_mask, "text"] = STALE
    assert stale_mask.sum() > 0
    build_index(spark, _to_sdf(spark, corrupted), idx, n_parts=2,
                resume=False)
    build_index(spark, _to_sdf(spark, pdf), ref_idx, n_parts=2,
                resume=False)
    res = incremental_update(spark, _to_sdf(spark, pdf), idx, upsert=True)
    return idx, ref_idx, pdf, int(stale_mask.sum())


def test_upsert_replaces_changed_docs(spark, upserted):
    idx, ref_idx, pdf, n_stale = upserted
    eng = SearchEngine(spark, idx)
    ref = SearchEngine(spark, ref_idx)
    # live corpus == the true corpus: same n_docs, same stats. NB the
    # truth pdf contains hygiene-blank rows (filtered by any build), and
    # some of those keys were STALE (non-blank) in the corrupted build —
    # upsert must DELETE those without re-adding (blank new text ==
    # "page now empty": wiped, nothing re-indexed)
    n_indexable = int(
        pdf["text"].notna().__and__(pdf["text"].str.strip() != "").sum()
    )
    assert eng.n_docs == ref.n_docs == n_indexable
    assert eng.avgdl == ref.avgdl
    # scores per turn are identical to a fresh build over the truth
    assert _keyed_scores(spark, eng) == _keyed_scores(spark, ref)
    # the stale marker is gone from results AND from the dictionary
    assert eng.search_ids("zzstalemark", k=10).count() == 0
    assert eng.term_stats.filter("term = 'zzstalemark'").count() == 0
    # the doc store view hides the replaced rows
    assert eng.documents.count() == eng.n_docs


def test_upsert_counts_and_vector(spark, upserted):
    idx, _, _, n_stale = upserted
    # every stale turn was replaced (they all differ from the truth)
    snaps = list_snapshots(idx)
    assert snaps[-1]["operation"] == "append"
    assert len(snaps[-1]["delete_dirs"]) == 1
    assert len(delete_batch_dirs(idx)) == 1
    eng = SearchEngine(spark, idx)
    assert eng._deleted is not None and eng._deleted.size == n_stale


def test_upsert_replay_is_noop(spark, upserted):
    idx, _, pdf, _ = upserted
    res = incremental_update(spark, _to_sdf(spark, pdf), idx, upsert=True)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}


def test_insert_mode_ignores_changed_text(spark, tmp_path):
    pdf = make_transcripts(n_conversations=10, seed=18)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    mutated = pdf.copy()
    # mutate only the rows the base build indexed — a previously-BLANK
    # key gaining text is a legitimate new doc even in insert mode
    indexed = mutated["text"].notna() & (mutated["text"].str.strip() != "")
    mutated.loc[indexed, "text"] = STALE
    res = incremental_update(spark, _to_sdf(spark, mutated), idx)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}
    assert delete_batch_dirs(idx) == []


def test_batched_search_masks_deletes(spark, upserted):
    """search_many's packed decode path applies the same vector mask as
    candidate_scores — the batch plan must not resurrect replaced docs."""
    idx, _, _, _ = upserted
    eng = SearchEngine(spark, idx)
    single = {
        (r["doc_id"], r["score"])
        for r in eng.search_ids(QUERY, k=15).collect()
    }
    batched = {
        (r["doc_id"], r["score"])
        for r in eng.search_many({"q": QUERY}, k=15).collect()
    }
    assert batched == single
    assert eng.search_many({"q": "zzstalemark"}, k=10).count() == 0


def test_snapshot_before_upsert_sees_old_docs(spark, upserted):
    """Time travel composes with deletes: the build snapshot predates the
    upsert, so as-of it the stale docs are still live and searchable."""
    idx, _, _, n_stale = upserted
    build_snap = list_snapshots(idx)[0]
    assert build_snap["operation"] == "build"
    asof = SearchEngine(spark, idx, snapshot_id=build_snap["snapshot_id"])
    assert asof._deleted is None
    assert asof.search_ids("zzstalemark", k=50).count() == min(n_stale, 50)


def test_compaction_merges_deletes(spark, upserted):
    """Runs LAST against the module index: compaction physically drops
    the replaced rows (staging, postings, documents), purges the vector,
    and changes no score."""
    idx, ref_idx, _, _ = upserted
    eng_before = SearchEngine(spark, idx)
    before = _keyed_scores(spark, eng_before)
    n_docs = eng_before.n_docs
    compact_index(spark, idx, n_parts=2)
    assert delete_batch_dirs(idx) == []
    assert not Path(idx, "_deletes").exists()
    eng = SearchEngine(spark, idx)
    assert eng._deleted is None
    assert eng.n_docs == n_docs
    assert spark.read.parquet(f"{idx}/documents").count() == n_docs
    assert _keyed_scores(spark, eng) == before
    assert eng.search_ids("zzstalemark", k=10).count() == 0


def test_recovery_rolls_back_orphan_delete_batch(spark, tmp_path):
    """Crash case (a) with deletes: an uncommitted batch's delete vector
    is rolled back with its staging/postings — the docs it would have
    replaced stay live."""
    pdf = make_transcripts(n_conversations=8, seed=19)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    eng = SearchEngine(spark, idx)
    probe = _keyed_scores(spark, eng)
    docs_max = int(
        spark.read.parquet(f"{idx}/documents").agg({"doc_id": "max"})
        .collect()[0][0]
    )
    # craft the crash debris: an orphan staging part past the committed
    # range (case (a): documents never landed) + its delete batch that
    # would have replaced doc 0
    orphan = 99
    spark.createDataFrame(
        [("zzghost", docs_max + 1, 3, 1)], "term string, doc_id long, dl int, tf int"
    ).write.parquet(f"{idx}/_staging_postings_raw/part_id={orphan}")
    spark.createDataFrame([(0,)], "doc_id long").write.parquet(
        f"{idx}/_deletes/{batch_dir_name(orphan)}"
    )
    # replaying ANY batch runs recovery first
    res = incremental_update(spark, _to_sdf(spark, pdf), idx)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}
    assert delete_batch_dirs(idx) == []
    assert not Path(
        idx, "_staging_postings_raw", f"part_id={orphan}"
    ).exists()
    # doc 0 lives: scores unchanged
    assert _keyed_scores(spark, SearchEngine(spark, idx)) == probe


def test_blank_text_upsert_is_deletes_only_commit(spark, tmp_path):
    """All changed keys' new text is blank -> the 'page now empty' case:
    a deletes-only commit (no new part) that wipes the old docs, survives
    replay, and still answers like a fresh build over the post-delete
    truth."""
    pdf = make_transcripts(n_conversations=10, seed=21)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    n0 = SearchEngine(spark, idx).n_docs

    # blank out the first 4 indexed keys
    victims = pdf[nonblank].head(4)[["conv_id", "turn_idx"]]
    batch = pdf.merge(victims, on=["conv_id", "turn_idx"]).copy()
    batch["text"] = "   \t"
    res = incremental_update(spark, _to_sdf(spark, batch), idx, upsert=True)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 4}
    assert len(delete_batch_dirs(idx)) == 1
    snaps = list_snapshots(idx)
    assert snaps[-1]["operation"] == "delete"
    assert len(snaps[-1]["delete_dirs"]) == 1

    eng = SearchEngine(spark, idx)
    assert eng.n_docs == n0 - 4
    assert eng.documents.count() == n0 - 4
    assert eng._deleted is not None and eng._deleted.size == 4

    # equivalence: fresh build over the corpus WITHOUT the victims
    keep = pdf.merge(
        victims, on=["conv_id", "turn_idx"], how="left", indicator=True
    )
    truth = keep[keep["_merge"] == "left_only"].drop(columns="_merge")
    ref_idx = str(tmp_path / "ref")
    build_index(spark, _to_sdf(spark, truth), ref_idx, n_parts=1,
                resume=False)
    assert _keyed_scores(spark, eng) == _keyed_scores(
        spark, SearchEngine(spark, ref_idx)
    )

    # replay is a no-op: the victims are already deleted, the incoming
    # blank rows match nothing live
    res2 = incremental_update(spark, _to_sdf(spark, batch), idx,
                              upsert=True)
    assert res2 == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}

    # compaction merges the deletes-only commit away: vector purged,
    # marker row gone, scores unchanged
    before = _keyed_scores(spark, eng)
    compact_index(spark, idx, n_parts=1)
    from search_engine_spark.operators.index_build import _read_manifest

    assert delete_batch_dirs(idx) == []
    assert not any(
        k.startswith("deletes_") for k in _read_manifest(idx)
    )
    eng2 = SearchEngine(spark, idx)
    assert eng2._deleted is None and eng2.n_docs == n0 - 4
    assert _keyed_scores(spark, eng2) == before


def test_recovery_sweeps_unmarked_deletes_only_batch(spark, tmp_path):
    """Crash between the delete-batch write and its deletes_{P} manifest
    marker: the sweep rolls the batch back and restores stats, so the
    docs it would have deleted stay live with pre-crash scores."""
    pdf = make_transcripts(n_conversations=8, seed=22)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    eng0 = SearchEngine(spark, idx)
    probe, n0 = _keyed_scores(spark, eng0), eng0.n_docs
    # crash debris: an unmarked deletes-only batch (no staging part for
    # its id), plus the stats rewrite that crash may have completed
    orphan = 77
    spark.createDataFrame([(0,), (1,)], "doc_id long").write.parquet(
        f"{idx}/_deletes/{batch_dir_name(orphan)}"
    )
    from search_engine_spark.operators.incremental import _recompute_stats

    _recompute_stats(spark, idx, "v1", 16, stats_epoch=123456)
    assert SearchEngine(spark, idx).n_docs == n0 - 2  # stats see the batch
    # replaying ANY batch runs recovery first; the replay itself is a noop
    res = incremental_update(spark, _to_sdf(spark, pdf), idx)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}
    assert delete_batch_dirs(idx) == []
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == n0 and eng._deleted is None
    assert _keyed_scores(spark, eng) == probe


def test_delete_docs_by_conv_and_turn(spark, tmp_path):
    """delete_docs: conv-level keys wipe every live turn of the convs;
    (conv, turn) keys wipe exactly those turns. Scores afterwards match a
    fresh build over the surviving corpus; re-delete is a no-op; a later
    incremental_update re-indexes a deleted key as a NEW doc."""
    from search_engine_spark.operators.incremental import delete_docs

    pdf = make_transcripts(n_conversations=12, seed=23)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=2, resume=False)

    # conv-level: drop conv-000001 entirely
    res = delete_docs(
        spark, spark.createDataFrame([("conv-000001",)], "conv_id string"),
        idx,
    )
    want_conv = int((nonblank & (pdf["conv_id"] == "conv-000001")).sum())
    assert res == {"deleted_docs": want_conv} and want_conv > 0

    # turn-level: drop one specific surviving turn — SOFT delete
    # (tombstone=False) because the end of this test re-adds the key
    victim = pdf[nonblank & (pdf["conv_id"] == "conv-000002")].iloc[0]
    res2 = delete_docs(
        spark,
        spark.createDataFrame(
            [(victim["conv_id"], int(victim["turn_idx"]))],
            "conv_id string, turn_idx int",
        ),
        idx,
        tombstone=False,
    )
    assert res2 == {"deleted_docs": 1}
    assert len(delete_batch_dirs(idx)) == 2
    snaps = list_snapshots(idx)
    assert [s["operation"] for s in snaps[-2:]] == ["delete", "delete"]

    # equivalence with a fresh build over the survivors
    keep = pdf[
        (pdf["conv_id"] != "conv-000001")
        & ~(
            (pdf["conv_id"] == victim["conv_id"])
            & (pdf["turn_idx"] == victim["turn_idx"])
        )
    ]
    ref = str(tmp_path / "ref")
    build_index(spark, _to_sdf(spark, keep), ref, n_parts=2, resume=False)
    eng, ref_eng = SearchEngine(spark, idx), SearchEngine(spark, ref)
    assert eng.n_docs == ref_eng.n_docs
    assert _keyed_scores(spark, eng) == _keyed_scores(spark, ref_eng)

    # idempotent: nothing live matches any more
    res3 = delete_docs(
        spark, spark.createDataFrame([("conv-000001",)], "conv_id string"),
        idx,
    )
    assert res3 == {"deleted_docs": 0}
    assert len(delete_batch_dirs(idx)) == 2  # no empty batch committed

    # a deleted key can come back as a NEW doc via plain insert
    back = pdf[
        (pdf["conv_id"] == victim["conv_id"])
        & (pdf["turn_idx"] == victim["turn_idx"])
    ]
    res4 = incremental_update(spark, _to_sdf(spark, back), idx)
    assert res4["new_docs"] == 1
    eng2 = SearchEngine(spark, idx)
    assert eng2.n_docs == ref_eng.n_docs + 1


def test_api_delete_batch(spark, tmp_path):
    from search_engine_spark.api import EngineAPI

    pdf = make_transcripts(n_conversations=6, seed=24)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    api = EngineAPI(spark, idx)
    n0 = api.statistics()["total_docs"] if "total_docs" in api.statistics() else None
    res = api.delete_batch(
        spark.createDataFrame([("conv-000000",)], "conv_id string")
    )
    assert res["result"] is True and res["deleted_docs"] > 0
    # the facade's memoized engine was invalidated: fresh searches see
    # the deletion immediately
    out = api.search("conv")  # any query; just exercise the envelope
    assert out["result"] is True
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    want = int((nonblank & (pdf["conv_id"] != "conv-000000")).sum())
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == want


def test_tombstone_blocks_replayed_batches(spark, tmp_path):
    """Takedown must hold against replays: after delete_docs(tombstone=
    True), re-running the original ingest batch (the crashed-checkpoint
    streaming case) re-adds NOTHING — in insert mode and upsert mode
    alike — until the tombstone is deliberately cleared."""
    from search_engine_spark.operators.deletes import (
        clear_tombstones,
        tombstones_df,
    )
    from search_engine_spark.operators.incremental import delete_docs

    pdf = make_transcripts(n_conversations=6, seed=25)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    victim_conv = "conv-000002"
    res = delete_docs(
        spark,
        spark.createDataFrame([(victim_conv,)], "conv_id string"),
        idx,
    )
    assert res["deleted_docs"] > 0
    n_after = SearchEngine(spark, idx).n_docs

    # replay the FULL original batch — both modes must be no-ops for the
    # taken-down conversation
    r1 = incremental_update(spark, _to_sdf(spark, pdf), idx)
    assert r1["new_docs"] == 0
    r2 = incremental_update(spark, _to_sdf(spark, pdf), idx, upsert=True)
    assert r2 == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == n_after
    assert eng.documents.filter(
        F.col("conv_id") == victim_conv
    ).count() == 0

    # deliberate lift: clear the tombstone, then the key re-indexes
    removed = clear_tombstones(
        spark,
        spark.createDataFrame([(victim_conv,)], "conv_id string"),
        idx,
    )
    # lifting the LAST tombstone drops the table entirely (ingest back
    # to the zero-cost no-takedown steady state)
    assert removed > 0 and tombstones_df(spark, idx) is None
    r3 = incremental_update(spark, _to_sdf(spark, pdf), idx)
    assert r3["new_docs"] == res["deleted_docs"]


def test_upsert_collapses_duplicate_live_keys(spark, tmp_path):
    """The doc store legally holds duplicate (conv_id, turn_idx) keys
    (batch-internal dups each get a doc_id). An upsert of such a key
    must not fan out — ALL old docs are replaced by exactly the incoming
    rows (deleteAllByPageId + re-add collapses the page)."""
    pdf = make_transcripts(n_conversations=4, seed=26)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    key_row = pdf[nonblank].iloc[0]
    dup = key_row.to_frame().T.copy()
    dup["text"] = "a different duplicate text for the same key"
    import pandas as pd

    corrupted = pd.concat([pdf, dup], ignore_index=True)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, corrupted), idx, n_parts=1,
                resume=False)
    n0 = SearchEngine(spark, idx).n_docs

    fix = key_row.to_frame().T.copy()
    fix["text"] = "zzcollapsed the canonical text"
    res = incremental_update(spark, _to_sdf(spark, fix), idx, upsert=True)
    # ONE new doc replaces BOTH old docs for the key
    assert res["new_docs"] == 1 and res["replaced_docs"] == 2
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == n0 - 1
    assert eng.search_ids("zzcollapsed", k=5).count() == 1
    # replay: single live doc with same text -> unchanged
    res2 = incremental_update(spark, _to_sdf(spark, fix), idx, upsert=True)
    assert res2 == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}


def test_upsert_replay_with_batch_internal_dup_keys(spark, tmp_path):
    """A batch carrying the SAME key twice (legal: each dup gets its own
    doc_id) must still converge under upsert replay: the multiset
    compare sees live texts == incoming texts and goes quiet instead of
    replacing and re-adding forever."""
    import pandas as pd

    pdf = make_transcripts(n_conversations=3, seed=27)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    dup_src = pdf[nonblank].iloc[0]
    d1 = dup_src.to_frame().T.copy()
    d1["text"] = "first duplicate variant text"
    d2 = dup_src.to_frame().T.copy()
    d2["text"] = "second duplicate variant text"
    batch = pd.concat([pdf, d1, d2], ignore_index=True)
    # the batch now holds key K three times (original + two variants)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, batch), idx, n_parts=1, resume=False)
    n0 = SearchEngine(spark, idx).n_docs

    # replay the identical batch: live multiset == incoming multiset
    res = incremental_update(spark, _to_sdf(spark, batch), idx,
                             upsert=True)
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}
    assert SearchEngine(spark, idx).n_docs == n0

    # change ONE of the dup texts -> the whole key collapses to the new
    # multiset (3 old docs replaced by 3 incoming rows)
    batch2 = batch.copy()
    mask = (
        (batch2["conv_id"] == dup_src["conv_id"])
        & (batch2["turn_idx"] == dup_src["turn_idx"])
        & (batch2["text"] == "second duplicate variant text")
    )
    batch2.loc[mask, "text"] = "second duplicate variant text CHANGED"
    res2 = incremental_update(spark, _to_sdf(spark, batch2), idx,
                              upsert=True)
    assert res2["replaced_docs"] == 3 and res2["new_docs"] == 3
    assert SearchEngine(spark, idx).n_docs == n0
    # and the new state replays quiet too
    res3 = incremental_update(spark, _to_sdf(spark, batch2), idx,
                              upsert=True)
    assert res3 == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0}


def test_delete_docs_null_turn_means_whole_conversation(spark, tmp_path):
    """A NULL turn_idx row in a turn-keyed frame deletes the whole
    conversation (the tombstone table's own encoding round-trips)."""
    from search_engine_spark.operators.incremental import delete_docs

    pdf = make_transcripts(n_conversations=5, seed=28)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    victim_turn = pdf[nonblank & (pdf["conv_id"] == "conv-000001")].iloc[0]
    keys = spark.createDataFrame(
        [("conv-000000", None), ("conv-000001", int(victim_turn["turn_idx"]))],
        "conv_id string, turn_idx int",
    )
    res = delete_docs(spark, keys, idx, tombstone=False)
    want = int((nonblank & (pdf["conv_id"] == "conv-000000")).sum()) + 1
    assert res == {"deleted_docs": want}
    eng = SearchEngine(spark, idx)
    assert eng.documents.filter(F.col("conv_id") == "conv-000000").count() == 0


def test_clear_tombstones_heals_crashed_swap_and_empties(spark, tmp_path):
    """A crash mid rename-swap must never lose the tombstone table
    (keys exist nowhere else); clearing the LAST tombstone drops the
    table dir so ingest returns to the zero-cost steady state."""
    from pathlib import Path as P

    from search_engine_spark.operators.deletes import (
        _tomb_root,
        clear_tombstones,
        tombstones_df,
        write_tombstones,
    )

    pdf = make_transcripts(n_conversations=4, seed=29)
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    write_tombstones(
        spark.createDataFrame([("conv-000000",), ("conv-000001",)],
                              "conv_id string"),
        idx,
    )
    assert tombstones_df(spark, idx).count() == 2

    # simulate the crash window: live dir renamed out, replacement not in
    root = _tomb_root(idx)
    P(str(root)).rename(f"{root}_old")
    assert tombstones_df(spark, idx).count() == 2  # healed from _old

    removed = clear_tombstones(
        spark, spark.createDataFrame([("conv-000000",)], "conv_id string"),
        idx,
    )
    assert removed == 1 and tombstones_df(spark, idx).count() == 1
    removed2 = clear_tombstones(
        spark, spark.createDataFrame([("conv-000001",)], "conv_id string"),
        idx,
    )
    assert removed2 == 1
    assert not root.exists()           # table dropped entirely
    assert tombstones_df(spark, idx) is None


def test_api_apply_changes(spark, tmp_path):
    """EngineAPI.apply_changes: the CDC envelope — upserts and deletes in
    one call, invalid ops rejected in the envelope, engine invalidated."""
    import pandas as pd

    from search_engine_spark.api import EngineAPI

    pdf = make_transcripts(n_conversations=5, seed=30)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    idx = str(tmp_path / "idx")
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=1, resume=False)
    api = EngineAPI(spark, idx)
    n0 = SearchEngine(spark, idx).n_docs

    fix = pdf[nonblank & (pdf["conv_id"] == "conv-000001")].head(1).copy()
    fix["text"] = "zzapichange corrected"; fix["op"] = "U"
    doom = pdf[pdf["conv_id"] == "conv-000002"].copy(); doom["op"] = "D"
    batch = pd.concat([fix, doom], ignore_index=True)
    res = api.apply_changes(_to_sdf(spark, batch))
    n_doomed = int((nonblank & (pdf["conv_id"] == "conv-000002")).sum())
    assert res["result"] is True
    assert res["replaced_docs"] == 1 and res["new_docs"] == 1
    assert res["deleted_docs"] == n_doomed
    assert SearchEngine(spark, idx).n_docs == n0 - n_doomed
    out = api.search("zzapichange")
    assert out["result"] is True and out["count"] == 1

    bad = batch.copy(); bad["op"] = "Z"
    res2 = api.apply_changes(_to_sdf(spark, bad))
    assert res2["result"] is False and "unknown op" in res2["error"]
