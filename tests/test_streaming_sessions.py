"""Custom stateful streaming sessionization vs the batch window-function
oracle: every CLOSED session (watermark passed last_event + gap) must
match the batch sessionization of the same data exactly."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.streaming.sessions import GAP_MS, stream_sessions

SRC = "/root/testdata/sf0.01/events.parquet"


def _batch_sessions(pdf: pd.DataFrame) -> pd.DataFrame:
    """Oracle: gap-rule sessionization in pandas (same semantics as
    entry_queries.q_events_sessionize)."""
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        ms = (g["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000).to_numpy()
        cents = (g["value"] * 100).round().astype("int64").to_numpy()
        start = last = None
        n = c = 0
        for t, v in zip(ms.tolist(), cents.tolist()):
            if start is None:
                start, last, n, c = t, t, 1, v
            elif t - last > GAP_MS:
                out.append((uid, start, last, n, c))
                start, last, n, c = t, t, 1, v
            else:
                last, n, c = t, n + 1, c + v
        if start is not None:
            out.append((uid, start, last, n, c))
    return pd.DataFrame(
        out, columns=["user_id", "start_ms", "last_ms", "n_events", "sum_cents"]
    )


def test_closed_sessions_match_batch_oracle(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    pdf = pd.read_parquet(SRC)
    pdf.to_parquet(src / "all.parquet", index=False)

    q = stream_sessions(
        spark, str(src), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(got) > 0

    exp = _batch_sessions(pdf)
    # only sessions closed by the final watermark are emitted
    wm_ms = (
        int(pdf["ts"].max().value // 1_000_000) - 60_000  # late = 1 minute
    )
    exp_closed = exp[exp["last_ms"] + GAP_MS < wm_ms]

    got_keys = {
        (int(r.user_id), int(r.session_start.value // 1_000_000)): (
            int(r.session_end.value // 1_000_000),
            int(r.n_events),
            int(r.sum_cents),
        )
        for r in got.itertuples()
    }
    exp_keys = {
        (int(r.user_id), int(r.start_ms)): (
            int(r.last_ms),
            int(r.n_events),
            int(r.sum_cents),
        )
        for r in exp_closed.itertuples()
    }
    assert got_keys == exp_keys


def test_late_event_bridges_open_sessions_across_batches(spark, tmp_path):
    """Two gap-separated groups land in micro-batch 1; micro-batch 2
    delivers an ADMISSIBLE late event (within the 1-minute watermark
    delay) that bridges them. The operator must NOT have emitted the
    first group eagerly at the in-batch gap: the closed output is one
    merged session with the late event's timestamp as part of the span.
    Two availableNow runs sharing a checkpoint = two micro-batches."""
    import datetime

    src = tmp_path / "incoming"
    src.mkdir()

    def _pdf(rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf["props"] = "{}"
        return pdf

    d = datetime.datetime(2025, 3, 1)

    def t(h, m, s):
        return d.replace(hour=h, minute=m, second=s)

    # batch 1: 10:00:00 and 10:30:30 -> gap 30m30s > 30m -> two groups
    _pdf(
        [
            (1, t(10, 0, 0), 7, "click", 1.0),
            (2, t(10, 30, 30), 7, "click", 1.0),
        ]
    ).to_parquet(src / "b1.parquet", index=False)
    q = stream_sessions(
        spark, str(src), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    assert q.awaitTermination(120)
    out_dir = tmp_path / "out"
    got1 = spark.read.parquet(str(out_dir)).toPandas()
    assert len(got1) == 0  # nothing may close eagerly at the in-batch gap

    # batch 2: late bridge at 10:29:50 (admissible: watermark is
    # 10:29:30) + a far event that advances the watermark past the
    # merged session's close point
    _pdf(
        [
            (3, t(10, 29, 50), 7, "click", 1.0),
            (4, t(12, 0, 0), 7, "click", 1.0),
        ]
    ).to_parquet(src / "b2.parquet", index=False)
    q2 = stream_sessions(
        spark, str(src), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    assert q2.awaitTermination(120)
    got2 = spark.read.parquet(str(out_dir)).toPandas()
    assert len(got2) == 1
    row = got2.iloc[0]
    assert row["session_start"] == pd.Timestamp(t(10, 0, 0))
    assert row["session_end"] == pd.Timestamp(t(10, 30, 30))
    assert row["n_events"] == 3
    assert row["sum_cents"] == 300
