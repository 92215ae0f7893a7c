"""Streaming ingest: continuously index new transcript files.

The reference has no streaming operators (SURVEY.md §2.9) — its closest
analog is the fire-and-forget single-page re-index thread
(IndexationServiceImpl.java:66-79). We go further: a Structured Streaming
file source feeds micro-batches into ``incremental_update`` via
``foreachBatch``, so the inverted index stays fresh as new conversation
files land.

Why foreachBatch and not a fully-streaming DAG: the index build is a
multi-table transactional append (documents + staging + postings + stats +
manifest) — exactly the "arbitrary batch sink" case foreachBatch exists
for. Each micro-batch reuses the battle-tested batch merge, inheriting its
idempotence (anti-join) — so a replayed micro-batch after a crash is a
no-op, which combined with the source checkpoint gives effectively-once
index updates.

On a cluster: the file source becomes Kafka / Iceberg CDC; everything else
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import types as T

from .. import schemas
from ..operators.incremental import apply_cdc_batch, incremental_update


def stream_transcripts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    *,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
    cdc: bool = False,
    **update_kwargs,
) -> StreamingQuery:
    """Start a streaming index-ingest query over parquet files landing in
    ``source_dir``. Returns the StreamingQuery (caller awaits/stops).

    ``cdc=True`` reads files carrying the TRANSCRIPTS columns plus an
    ``op`` column ('I'/'U'/'D') and applies each micro-batch through
    ``apply_cdc_batch`` — one stream carries inserts, replacements, AND
    deletions (the Iceberg CDC-feed shape; on a cluster the file source
    becomes Kafka/Debezium). Default mode keeps the plain transcript
    schema and ``incremental_update`` (pass ``upsert=True`` through for
    replace semantics without deletes)."""
    schema = schemas.TRANSCRIPTS
    if cdc:
        schema = T.StructType(
            list(schemas.TRANSCRIPTS.fields)
            + [T.StructField("op", T.StringType(), False)]
        )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if cdc:
            apply_cdc_batch(spark, batch_df, index_dir, **update_kwargs)
        else:
            incremental_update(
                spark, batch_df, index_dir, **update_kwargs
            )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
