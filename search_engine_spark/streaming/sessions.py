"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState`` (arbitrary state + event-time timeout).

Unlike the windowed aggregation (windows.py — fixed tumbling windows),
sessions have data-dependent extents (30-min inactivity gap), which
built-in windows cannot express incrementally — this is the canonical
use of the custom-stateful API. State per user = the LIST of still-open
sessions (start, last_seen, n_events, sum_cents): a user can hold
several gap-separated groups at once, because an admissible late event
(within the watermark delay) may still arrive and BRIDGE two of them —
emitting a group the moment a gap appears in-batch would bake that
split in and diverge from the batch semantics. A session is emitted
ONLY when the event-time watermark passes last_seen + gap (it can no
longer grow or merge), then dropped from state — constant memory per
active user, bounded by (watermark delay / gap) + 1 open sessions.

Batch oracle: the same gap rule via lag+cumsum window functions
(entry_queries.q_events_sessionize); closed streamed sessions must match
it exactly (tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
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

# state carried between micro-batches, per user: parallel arrays, one
# element per still-open session (start-ordered)
STATE = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType()), False),
        T.StructField("lasts", T.ArrayType(T.LongType()), False),
        T.StructField("ns", T.ArrayType(T.LongType()), False),
        T.StructField("cents", T.ArrayType(T.LongType()), False),
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

    sessions: list[tuple[int, int, int, int]] = []
    if state.exists:
        starts, lasts, ns, cs = state.get
        sessions = list(zip(starts, lasts, ns, cs))

    if not state.hasTimedOut:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            ms = _ms(rows["ts"]).to_numpy()
            vals = rows["value"].to_numpy(dtype="float64")
            # explicit half-away-from-zero, NULL -> 0 contribution:
            # mirrors the oracle's CAST(round(value*100) AS BIGINT)
            # summed with SUM (NULL-skipping) — never pandas .round(),
            # whose banker's tie rule differs from SQL round()
            x = vals * 100.0
            c = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
            c = np.where(np.isnan(c), 0.0, c).astype("int64")
            sessions.extend(
                (int(t), int(t), 1, int(cc))
                for t, cc in zip(ms.tolist(), c.tolist())
            )

    # merge start-sorted groups whose gap closed (a late event may sit
    # inside, extend, or BRIDGE existing open sessions)
    sessions.sort()
    merged: list[tuple[int, int, int, int]] = []
    for s, last, n, cts in sessions:
        if merged and s - merged[-1][1] <= GAP_MS:
            ps, pl, pn, pc = merged[-1]
            merged[-1] = (ps, max(pl, last), pn + n, pc + cts)
        else:
            merged.append((s, last, n, cts))

    # emit exactly the sessions the watermark has closed (same strict
    # rule as the batch oracle: last + gap < watermark); keep the rest
    wm = state.getCurrentWatermarkMs()
    keep = [g for g in merged if g[1] + GAP_MS >= wm]
    for s, last, n, cts in merged:
        if last + GAP_MS < wm:
            emit(s, last, n, cts)
    if keep:
        state.update(
            (
                [g[0] for g in keep],
                [g[1] for g in keep],
                [g[2] for g in keep],
                [g[3] for g in keep],
            )
        )
        # wake when the earliest open session becomes closable; the
        # timestamp must lie beyond the current watermark
        state.setTimeoutTimestamp(
            max(min(g[1] for g in keep) + GAP_MS, wm + 1)
        )
    elif state.exists:
        state.remove()

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
