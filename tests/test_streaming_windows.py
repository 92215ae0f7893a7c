"""Watermarked windowed aggregation: closed windows emitted by the stream
must equal the batch oracle exactly; open windows (within the watermark)
are withheld; a second batch of files advances the watermark and emits
exactly the newly-closed windows."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.streaming.windows import (
    batch_windows,
    stream_windowed_counts,
)

SRC = "/root/testdata/sf0.01/events.parquet"


def _key(rows):
    return {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in rows
    }


@pytest.fixture(scope="module")
def split_events(tmp_path_factory):
    d = tmp_path_factory.mktemp("evwin")
    src = d / "incoming"
    src.mkdir()
    pdf = pd.read_parquet(SRC).sort_values("ts").reset_index(drop=True)
    cut = len(pdf) // 2
    pdf.iloc[:cut].to_parquet(src / "part1.parquet", index=False)
    return d, src, pdf, cut


def test_closed_windows_match_batch_oracle(spark, split_events):
    d, src, pdf, cut = split_events
    out, ckpt = str(d / "out"), str(d / "ckpt")

    q = stream_windowed_counts(spark, str(src), ckpt, out, late="2 hours")
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    first = spark.createDataFrame(pdf.iloc[:cut])
    # watermark after batch 1 = max ts - 2h; exactly the windows ending
    # at or before it must have been emitted
    wm = pdf.iloc[:cut]["ts"].max() - pd.Timedelta(hours=2)
    exp = [
        r
        for r in batch_windows(first).collect()
        if pd.Timestamp(r["window_end"]) <= wm
    ]
    assert len(got) > 0
    assert _key(got) == _key(exp)
    # open windows withheld
    assert all(pd.Timestamp(r["window_end"]) <= wm for r in got)


def test_late_batch_emits_only_newly_closed(spark, split_events):
    d, src, pdf, cut = split_events
    out, ckpt = str(d / "out"), str(d / "ckpt")
    n_before = spark.read.parquet(out).count()

    pdf.iloc[cut:].to_parquet(src / "part2.parquet", index=False)
    q = stream_windowed_counts(spark, str(src), ckpt, out, late="2 hours")
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    assert len(got) > n_before
    # every emitted closed window agrees with the full batch oracle
    full = spark.createDataFrame(pdf)
    exp = _key(batch_windows(full).collect())
    for k, v in _key(got).items():
        assert exp[k] == v, k
    # no duplicate windows across the two triggers
    keys = [(r["window_start"], r["event_type"]) for r in got]
    assert len(keys) == len(set(keys))
