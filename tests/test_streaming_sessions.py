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
