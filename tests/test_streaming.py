"""Streaming ingest: files landing in a directory get merged into the
index via foreachBatch + incremental_update; the source checkpoint plus
the merge's anti-join idempotence give effectively-once updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.streaming.ingest import stream_transcripts
from search_engine_spark.synth import make_transcripts


def _write(pdf, path):
    pdf = pdf.copy()
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    idx = str(d / "idx")
    src = d / "incoming"
    src.mkdir()
    ckpt = str(d / "ckpt")

    pdf = make_transcripts(n_conversations=60, seed=33)
    convs = sorted(pdf["conv_id"].unique())
    third = len(convs) // 3
    base = pdf[pdf["conv_id"].isin(convs[:third])]
    batch1 = pdf[pdf["conv_id"].isin(convs[third : 2 * third])]
    batch2 = pdf[pdf["conv_id"].isin(convs[2 * third :])]

    sdf = spark.createDataFrame(
        base.assign(ts=base["ts"].astype("datetime64[us]"))
    )
    build_index(spark, sdf, idx, n_parts=2, resume=False)
    return idx, src, ckpt, batch1, batch2


def test_streaming_ingest_available_now(spark, stream_setup):
    idx, src, ckpt, batch1, batch2 = stream_setup
    n0 = spark.read.parquet(f"{idx}/documents").count()

    _write(batch1, str(src / "batch1.parquet"))
    q = stream_transcripts(spark, str(src), ckpt, idx)
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{idx}/documents").count()
    assert n1 > n0

    # second file lands; restart picks up ONLY the new file (checkpoint)
    _write(batch2, str(src / "batch2.parquet"))
    q2 = stream_transcripts(spark, str(src), ckpt, idx)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(f"{idx}/documents").count()
    assert n2 > n1

    # the index answers queries over streamed docs; stats are global
    eng = SearchEngine(spark, idx)
    res = eng.search_ids("query", k=5).collect()
    assert len(res) > 0
    assert eng.n_docs == n2


def test_streaming_replay_is_noop(spark, stream_setup, tmp_path):
    """A fresh checkpoint re-reads ALL files — the anti-join makes the
    replay a no-op instead of duplicating documents."""
    idx, src, _, _, _ = stream_setup
    n_before = spark.read.parquet(f"{idx}/documents").count()
    q = stream_transcripts(spark, str(src), str(tmp_path / "ckpt2"), idx)
    q.awaitTermination(120)
    assert spark.read.parquet(f"{idx}/documents").count() == n_before


def test_streaming_batches_commit_snapshots(spark, stream_setup):
    """Each micro-batch merge is an atomic snapshot commit (the ingest
    path rides incremental_update), so the stream's history is
    time-travelable: the build snapshot plus one append per non-empty
    batch, each strictly growing, and an as-of read of the FIRST
    snapshot sees exactly the pre-stream corpus."""
    from search_engine_spark.operators.snapshots import list_snapshots

    idx, *_ = stream_setup
    snaps = list_snapshots(idx)
    # runs after the ingest tests: build + (>= 2) streamed appends
    assert snaps[0]["operation"] == "build"
    assert {s["operation"] for s in snaps[1:]} == {"append"}
    assert len(snaps) >= 3
    counts = [s["n_docs"] for s in snaps]
    assert counts == sorted(counts) and counts[0] < counts[-1]
    asof = SearchEngine(spark, idx, snapshot_id=snaps[0]["snapshot_id"])
    assert asof.n_docs == counts[0]
    assert asof.documents.count() == counts[0]


def test_streaming_upsert_mode(spark, tmp_path):
    """stream_transcripts(upsert=True) passes REPLACE semantics through
    to every micro-batch: a corrected version of an already-streamed
    turn replaces the old doc (delete vector + new part), so the stream
    can carry CDC-style updates, not just inserts."""
    idx = str(tmp_path / "idx")
    src = tmp_path / "incoming"
    src.mkdir()
    pdf = make_transcripts(n_conversations=8, seed=34)
    sdf = spark.createDataFrame(
        pdf.assign(ts=pdf["ts"].astype("datetime64[us]"))
    )
    build_index(spark, sdf, idx, n_parts=1, resume=False)
    n0 = SearchEngine(spark, idx).n_docs

    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    fix = pdf[nonblank].head(3).copy()
    fix["text"] = "zzcorrected replacement text " + fix["text"]
    _write(fix, str(src / "fix1.parquet"))
    q = stream_transcripts(
        spark, str(src), str(tmp_path / "ckpt"), idx, upsert=True
    )
    q.awaitTermination(120)

    eng = SearchEngine(spark, idx)
    assert eng.n_docs == n0  # replaced, not duplicated
    assert eng._deleted is not None and eng._deleted.size == 3
    assert eng.search_ids("zzcorrected", k=10).count() == 3


def test_streaming_cdc_mode(spark, tmp_path):
    """cdc=True: one stream carries inserts, replacements AND deletions
    (apply_cdc_batch per micro-batch). Deletes win over same-batch
    upserts; replaying the full CDC history is a no-op."""
    from search_engine_spark.operators.incremental import apply_cdc_batch

    idx = str(tmp_path / "idx")
    src = tmp_path / "incoming"
    src.mkdir()
    pdf = make_transcripts(n_conversations=8, seed=35)
    nonblank = pdf["text"].notna() & (pdf["text"].str.strip() != "")
    sdf = spark.createDataFrame(
        pdf.assign(ts=pdf["ts"].astype("datetime64[us]"))
    )
    build_index(spark, sdf, idx, n_parts=1, resume=False)
    n0 = SearchEngine(spark, idx).n_docs

    # CDC file: replace 2 turns (U), insert nothing new, delete 1 conv
    fixes = pdf[nonblank & (pdf["conv_id"] == "conv-000001")].head(2).copy()
    fixes["text"] = "zzcdcfix replacement text " + fixes["text"]
    fixes["op"] = "U"
    doomed = pdf[pdf["conv_id"] == "conv-000002"].copy()
    doomed["op"] = "D"
    import pandas as pd

    cdc_pdf = pd.concat([fixes, doomed], ignore_index=True)
    _write(cdc_pdf, str(src / "cdc1.parquet"))
    q = stream_transcripts(
        spark, str(src), str(tmp_path / "ckpt"), idx, cdc=True
    )
    q.awaitTermination(120)

    eng = SearchEngine(spark, idx)
    n_conv2 = int((nonblank & (pdf["conv_id"] == "conv-000002")).sum())
    assert eng.n_docs == n0 - n_conv2
    assert eng.search_ids("zzcdcfix", k=10).count() == 2
    assert eng.documents.filter(
        F.col("conv_id") == "conv-000002"
    ).count() == 0

    # direct replay of the same CDC batch: fully convergent
    res = apply_cdc_batch(
        spark, spark.createDataFrame(
            cdc_pdf.assign(ts=cdc_pdf["ts"].astype("datetime64[us]"))
        ), idx,
    )
    assert res == {"new_docs": 0, "new_parts": 0, "replaced_docs": 0,
                   "deleted_docs": 0}

    # same-batch U+D conflict: key updated AND deleted ends deleted
    conflict = pdf[nonblank & (pdf["conv_id"] == "conv-000003")].head(1).copy()
    upd = conflict.copy(); upd["text"] = "conflicting update"; upd["op"] = "U"
    dele = conflict.copy(); dele["op"] = "D"
    both = pd.concat([upd, dele], ignore_index=True)
    res2 = apply_cdc_batch(
        spark, spark.createDataFrame(
            both.assign(ts=both["ts"].astype("datetime64[us]"))
        ), idx,
    )
    assert res2["deleted_docs"] == 1  # the freshly-upserted doc
    key = (conflict.iloc[0]["conv_id"], int(conflict.iloc[0]["turn_idx"]))
    eng2 = SearchEngine(spark, idx)
    assert eng2.documents.filter(
        (F.col("conv_id") == key[0]) & (F.col("turn_idx") == key[1])
    ).count() == 0

    import pytest as _pt

    with _pt.raises(ValueError, match="unknown op"):
        bad = both.copy(); bad["op"] = "X"
        apply_cdc_batch(
            spark, spark.createDataFrame(
                bad.assign(ts=bad["ts"].astype("datetime64[us]"))
            ), idx,
        )
