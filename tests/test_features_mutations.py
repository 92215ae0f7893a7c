"""The round-5 query surfaces × the mutation machinery: after a
targeted deletion, boolean NOT / match_count / facets / more-like-this
must behave as if the deleted docs were never indexed (the delete-vector
invariant, extended to the membership-only reader), and a
snapshot-pinned engine must answer the same surfaces AS-OF the commit
(hiding the deletion)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.incremental import delete_docs
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.synth import make_transcripts

QUERY = "token index"
EXCL = "merge"
VICTIMS = ("conv-000001", "conv-000004")


def _to_sdf(spark, pdf):
    from search_engine_spark import schemas

    return spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)


@pytest.fixture(scope="module")
def deleted_pair(spark, tmp_path_factory):
    """(idx, ref_idx, pdf): idx built over the FULL corpus then two convs
    deleted (soft — the delete vector stays live, no compaction);
    ref_idx built fresh over the surviving corpus only."""
    d = tmp_path_factory.mktemp("feat_mut")
    idx, ref_idx = str(d / "idx"), str(d / "ref")
    pdf = make_transcripts(n_conversations=14, seed=29)
    build_index(spark, _to_sdf(spark, pdf), idx, n_parts=2, resume=False)
    res = delete_docs(
        spark,
        spark.createDataFrame([(c,) for c in VICTIMS], "conv_id string"),
        idx,
    )
    assert res["deleted_docs"] > 0
    survivors = pdf[~pdf["conv_id"].isin(VICTIMS)]
    build_index(spark, _to_sdf(spark, survivors), ref_idx, n_parts=2,
                resume=False)
    return idx, ref_idx, pdf


def _keyed(eng, ids_df):
    remap = eng.documents.select("doc_id", "conv_id", "turn_idx")
    return sorted(
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in ids_df.join(remap, "doc_id").collect()
    )


def test_match_count_subtracts_the_vector(spark, deleted_pair):
    idx, ref_idx, _ = deleted_pair
    eng, ref = SearchEngine(spark, idx), SearchEngine(spark, ref_idx)
    got = eng.match_count(QUERY).collect()[0]["n_matches"]
    want = ref.match_count(QUERY).collect()[0]["n_matches"]
    assert got == want > 0
    got_any = eng.match_count(QUERY, conjunctive=False).collect()[0][
        "n_matches"
    ]
    want_any = ref.match_count(QUERY, conjunctive=False).collect()[0][
        "n_matches"
    ]
    assert got_any == want_any > got


def test_search_not_on_deleted_index_matches_fresh_build(
    spark, deleted_pair
):
    idx, ref_idx, _ = deleted_pair
    eng, ref = SearchEngine(spark, idx), SearchEngine(spark, ref_idx)
    got = _keyed(eng, eng.search_not(QUERY, EXCL, k=15))
    want = _keyed(ref, ref.search_not(QUERY, EXCL, k=15))
    assert got == want and got


def test_facets_on_deleted_index_matches_fresh_build(spark, deleted_pair):
    idx, ref_idx, _ = deleted_pair
    eng, ref = SearchEngine(spark, idx), SearchEngine(spark, ref_idx)
    got = eng.facet_counts(QUERY, by="conv_id").toPandas()
    want = ref.facet_counts(QUERY, by="conv_id").toPandas()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert not set(got["facet"]) & set(VICTIMS)


def test_more_like_this_rejects_deleted_source(spark, deleted_pair):
    idx, _, pdf = deleted_pair
    eng = SearchEngine(spark, idx)
    # any surviving internal doc_id of a deleted conv is gone from the
    # masked doc store — look one up via the UNMASKED parquet
    raw = spark.read.parquet(f"{idx}/documents")
    gone = raw.filter(F.col("conv_id") == VICTIMS[0]).select(
        "doc_id"
    ).first()
    assert gone is not None
    with pytest.raises(ValueError, match="not found"):
        eng.more_like_this(int(gone["doc_id"]))


def test_snapshot_pinned_surfaces_hide_the_deletion(spark, deleted_pair):
    idx, _, _ = deleted_pair
    from search_engine_spark.operators.snapshots import list_snapshots

    snaps = list_snapshots(idx)
    build_snap = snaps[0]["snapshot_id"]  # the pre-delete build commit
    asof = SearchEngine(spark, idx, snapshot_id=build_snap)
    head = SearchEngine(spark, idx)
    # the deleted convs are visible again as-of the build...
    asof_not = _keyed(asof, asof.search_not(QUERY, EXCL, k=30))
    head_not = _keyed(head, head.search_not(QUERY, EXCL, k=30))
    asof_convs = {c for c, _, _ in asof_not}
    assert set(VICTIMS) & asof_convs
    assert asof_not != head_not
    # ...and the as-of facet panel counts them
    asof_facets = asof.facet_counts(QUERY, by="conv_id").toPandas()
    assert set(VICTIMS) & set(asof_facets["facet"])
    # suggest on a snapshot-pinned engine must never touch the
    # HEAD-derived delete index (scan path over pinned stats)
    assert not asof._suggest_index_usable("indx", 2)
    assert asof.suggest("indx", k=3).count() >= 0