"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState`` (arbitrary state + event-time timeout).

Unlike the windowed aggregation (windows.py — fixed tumbling windows),
sessions have data-dependent extents (30-min inactivity gap), which
built-in windows cannot express incrementally — this is the canonical
use of the custom-stateful API. State per user = (session_start,
last_seen, n_events, sum_cents); a session is EMITTED when the event-time
watermark passes last_seen + gap (the session can no longer grow), and
its state is cleared — constant memory per active user.

Batch oracle: the same gap rule via lag+cumsum window functions
(entry_queries.q_events_sessionize); closed streamed sessions must match
it exactly (tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS

GAP_MS = 30 * 60 * 1000

SESSIONS = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_cents", T.LongType(), False),
    ]
)

# state carried between micro-batches, per user
STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("last_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_cents", T.LongType(), False),
    ]
)


def _ms(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[ns]").astype("int64") // 1_000_000


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out = []

    def emit(start_ms: int, last_ms: int, n: int, cents: int) -> None:
        out.append(
            (
                int(user_id),
                pd.Timestamp(start_ms, unit="ms"),
                pd.Timestamp(last_ms, unit="ms"),
                int(n),
                int(cents),
            )
        )

    if state.hasTimedOut:
        start_ms, last_ms, n, cents = state.get
        emit(start_ms, last_ms, n, cents)
        state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ms = _ms(rows["ts"]).to_numpy()
        cents_arr = (rows["value"] * 100).round().astype("int64").to_numpy()
        if state.exists:
            start_ms, last_ms, n, cents = state.get
        else:
            start_ms = last_ms = -1
            n = cents = 0
        for t, c in zip(ms.tolist(), cents_arr.tolist()):
            if start_ms < 0:
                start_ms, last_ms, n, cents = t, t, 1, c
            elif t - last_ms > GAP_MS:
                emit(start_ms, last_ms, n, cents)  # gap inside the batch
                start_ms, last_ms, n, cents = t, t, 1, c
            else:
                last_ms, n, cents = max(last_ms, t), n + 1, cents + c
        state.update((int(start_ms), int(last_ms), int(n), int(cents)))
        # close the session when the watermark passes last_seen + gap
        state.setTimeoutTimestamp(int(last_ms) + GAP_MS)

    yield pd.DataFrame(out, columns=[f.name for f in SESSIONS.fields])


def stream_sessions(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    *,
    late: str = "1 minute",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(EVENTS).format("parquet").load(source_dir)
        .withWatermark("ts", late)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSIONS,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
