"""Watermarked event-time windowed aggregation (Structured Streaming).

The ingest path (ingest.py) covers continuous INDEX maintenance; this
module covers continuous ANALYTICS: tumbling event-time windows with a
watermark bounding how late events may arrive, the standard pattern for
the `events` stream shape (event_id, ts, user_id, event_type, value).

Semantics: with `withWatermark(ts, late)` + append output mode, a window
emits exactly once — when the watermark (max observed ts − late) passes
the window end — and events later than the watermark are dropped. State
per active window is bounded by `late`, so the job runs forever at
constant memory on a cluster.

The same aggregation expressed on a static DataFrame (``batch_windows``)
is the correctness oracle: for any fully-closed window both must agree
(tests/test_streaming_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _agg(df: DataFrame, window: str) -> DataFrame:
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_cents",
            "approx_users",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    *,
    window: str = "1 hour",
    late: str = "2 hours",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuous per-(window, event_type) counts/sums with late-data
    tolerance ``late``; append-mode parquet sink (each closed window is
    written exactly once)."""
    stream = (
        spark.readStream.schema(EVENTS).format("parquet").load(source_dir)
        .withWatermark("ts", late)
    )
    writer = (
        _agg(stream, window)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_windows(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The same aggregation on a static table — the streaming oracle."""
    return _agg(events, window)
