"""Incremental index update — the reference's single-page re-index
(`POST /api/indexPage`, IndexationServiceImpl.java:119-131 +
EntitySaver.java:35-54) re-expressed as an idempotent batch merge:

  new transcripts batch
    -> P1 hygiene filter
    -> ANTI-JOIN against existing documents on (conv_id, turn_idx)
       (replaces the reference's synchronized get-or-create point lookups,
        EntitySaver.java:45-50 / PageRepository.java:18 — J4/S3)
    -> assign doc_ids continuing after the existing max (append order)
    -> analyze -> append documents + staging -> encode NEW parts only
    -> RECOMPUTE term_stats / corpus_stats from all staging parts

Recomputing df from postings fixes the reference's df-drift bug
(EntitySaver.java:88-101 increments lemma.frequency again on re-index —
SURVEY.md §3.3/§7.5): our df is always exactly "distinct docs containing
the term", no matter how many times a batch is replayed.

Scale notes: the anti-join is a shuffle on (conv_id, turn_idx) sized by the
NEW batch (existing side is pruned to two columns); stats recompute is one
agg over the staging table (columnar, term+tf columns only). On a cluster
this maps to Iceberg MERGE + snapshot; locally, append parquet parts.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from .index_build import (
    _make_encoder,
    _read_manifest,
    _terms_udf,
    _write_manifest_row,
    assign_doc_ids,
    clean_transcripts,
)


def incremental_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = 16,
    block_size: int = 128,
    salt_budget: int = 100_000,
    index_version: str | None = None,
) -> dict:
    """Merge a batch of new turns into an existing index at ``out_dir``.
    Returns {"new_docs": int, "new_parts": int}. Idempotent: replaying the
    same batch is a no-op (anti-join drops already-indexed turns)."""
    manifest = _read_manifest(out_dir)
    if manifest.get("stage_docs", {}).get("status") != "DONE":
        raise ValueError(f"no complete index at {out_dir}; run build_index first")
    version = index_version or manifest["stage_docs"].get("index_version", "v1")

    docs_path = f"{out_dir}/documents"
    staging_path = f"{out_dir}/_staging_postings_raw"
    stats_path = f"{out_dir}/term_stats"
    corpus_path = f"{out_dir}/corpus_stats"
    postings_path = f"{out_dir}/postings"

    existing = spark.read.parquet(docs_path)
    base = existing.agg(F.max("doc_id")).collect()[0][0]
    base = int(base) + 1 if base is not None else 0

    # localCheckpoint truncates lineage at the anti-join: everything below
    # appends to `documents`, and a lazily re-evaluated anti-join against
    # the just-appended table would silently see its own output (classic
    # self-dependency) — the batch must be materialized BEFORE any write
    fresh = (
        clean_transcripts(new_transcripts)
        .join(
            existing.select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"],
            "left_anti",
        )
        .localCheckpoint()
    )
    with_ids, ranged, n_new = assign_doc_ids(fresh, spark, base=base)
    if n_new == 0:
        ranged.unpersist()
        return {"new_docs": 0, "new_parts": 0}

    t0 = time.time()
    analyzed = with_ids.withColumn("terms", _terms_udf()(F.col("text")))
    analyzed = analyzed.withColumn("dl", F.size("terms")).persist()
    analyzed.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"
    ).write.mode("append").parquet(docs_path)

    # each batch becomes ONE new part directory — a fresh overwrite of its
    # own path (atomic locally; an Iceberg snapshot commit on clusters),
    # never an append into existing part dirs
    part_new = 1 + max(
        (int(r["partition_id"]) for r in manifest.values()
         if int(r.get("partition_id", -1)) >= 0),
        default=-1,
    )
    exploded = (
        analyzed.select("doc_id", "dl", F.explode("terms").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
        .withColumn("part_id", F.lit(part_new).cast("int"))
    )
    exploded.write.mode("append").partitionBy("part_id").parquet(staging_path)
    analyzed.unpersist()
    ranged.unpersist()

    # global stats recompute (drift-free df — SURVEY.md §7.5)
    raw = spark.read.parquet(staging_path)
    raw.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).write.mode("overwrite").parquet(f"{stats_path}_new")
    docs_all = spark.read.parquet(docs_path)
    n_docs = docs_all.count()
    docs_all.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.max("dl").cast("double").alias("max_tf_sum"),
        F.lit(version).alias("index_version"),
    ).write.mode("overwrite").parquet(f"{corpus_path}_new")
    # atomic-ish swap via overwrite (Iceberg snapshot commit on clusters)
    spark.read.parquet(f"{stats_path}_new").write.mode("overwrite").parquet(stats_path)
    spark.read.parquet(f"{corpus_path}_new").write.mode("overwrite").parquet(corpus_path)

    corpus_row = spark.read.parquet(corpus_path).collect()[0]
    avgdl = float(corpus_row["avgdl"]) if corpus_row["avgdl"] else 1.0
    term_stats = spark.read.parquet(stats_path)
    encoder = _make_encoder(n_docs, avgdl, block_size)

    raw_p = raw.filter(F.col("part_id") == part_new)
    joined = raw_p.join(F.broadcast(term_stats.select("term", "df")), "term")
    n_salts = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(salt_budget)).cast("long")
    )
    batch_span = max(1, n_new)
    salted = joined.withColumn(
        "salt",
        (((F.col("doc_id") - F.lit(base)) * n_salts) / F.lit(batch_span))
        .cast("int"),
    ).withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
    encoded = salted.groupBy("term", "part_id", "salt").applyInPandas(
        lambda key, pdf: encoder(key, pdf), schema=schemas.POSTINGS
    )
    obs = Observation(f"incr_part_{part_new}")
    encoded = encoded.observe(
        obs,
        F.sum("n").alias("postings_written"),
        F.approx_count_distinct("term").alias("terms_merged"),
        F.sum(
            F.length("doc_ids") + F.length("tfs") + F.length("dls")
        ).alias("bytes_compressed"),
        F.count(F.lit(1)).alias("blocks"),
    )
    encoded.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{postings_path}/part_id={part_new}"
    )
    m = obs.get
    _write_manifest_row(
        out_dir,
        f"part_{part_new:05d}",
        {
            "partition_id": part_new,
            "status": "DONE",
            "started_ts": t0,
            "finished_ts": time.time(),
            "postings_written": int(m["postings_written"] or 0),
            "terms_merged": int(m["terms_merged"] or 0),
            "bytes_compressed": int(m["bytes_compressed"] or 0),
            "blocks": int(m["blocks"] or 0),
            "index_version": version,
        },
    )

    row = dict(manifest["stage_docs"])
    row.update({"n_docs": base + n_new})
    _write_manifest_row(out_dir, "stage_docs", row)
    return {"new_docs": n_new, "new_parts": 1}
