"""Distributed inverted-index build (the reference's startIndexing pipeline,
IndexationServiceImpl.java:88-106 + EntitySaver.java:35-109, re-architected
as Spark jobs; SURVEY.md §3.2).

Pipeline (2 wide shuffles total):

  transcripts
    -> P1 hygiene filter (blank text; EntitySaver.java:51 analog)
    -> stable dense doc_id by (conv_id, turn_idx)    [shuffle 1: range]
    -> analyze (Arrow pandas UDF: tokenize+stop+lemmatize)
    -> documents (+ dl) and exploded (doc_id, term, tf, dl)  [shuffle 2: agg]
    -> term_stats (df, cf), corpus_stats
    -> per doc_id-range PART (checkpoint unit):
         broadcast-join term df  -> range-salt hot terms
         -> applyInPandas encoder: sorted, delta+varbyte blocks w/ block-max
         -> postings/part_id=P/bucket=B parquet + manifest row (lineage)

Scale notes (100 TB / 1000 executors):
- doc_id assignment is the two-pass range pattern — no global window, no
  zipWithIndex; boundaries from repartitionByRange, per-partition offsets
  prefix-summed on the driver (tiny), ids filled in mapInPandas.
- the explode->agg shuffle is the big one; partial aggregation (Catalyst)
  combines map-side so shuffle volume is ~unique (term, doc) pairs.
- hot terms (Zipf head) are salted into contiguous doc_id subranges so the
  "merge" of salted segments is pure concatenation — no re-sort, no second
  shuffle (SURVEY.md §7.3).
- each PART is an independent job writing its own partition directory +
  manifest row -> kill/resume skips DONE parts (north-rule checkpointing).
- postings are hash-bucketed by term (`bucket` partition column) so query
  lookups prune to matching directories.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analyzer import analyze_series
from ..functions.codec import varbyte_encode_sliced
from .. import schemas

K1 = 1.2
B = 0.75
BLOCKS_PER_SALT_CAP = 1 << 20  # block_id = salt * CAP + local


@dataclass
class IndexBuildResult:
    out_dir: str
    n_docs: int
    avgdl: float
    max_tf_sum: float
    n_terms: int
    postings_blocks: int
    parts_built: int
    parts_skipped: int
    index_version: str


def _terms_udf():
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _analyze(texts: pd.Series) -> pd.Series:
        return analyze_series(texts)

    return _analyze


def conform_transcripts(transcripts: DataFrame) -> DataFrame:
    """Cast input to the declared TRANSCRIPTS schema (schema-on-write) so
    every writer produces identical parquet physical types regardless of
    how the caller materialized the batch (pandas int64 vs int32, etc.)."""
    return transcripts.select(
        *[F.col(f.name).cast(f.dataType) for f in schemas.TRANSCRIPTS.fields]
    )


def clean_transcripts(transcripts: DataFrame) -> DataFrame:
    """P1 hygiene: only non-blank turns are indexed (EntitySaver.java:51)."""
    transcripts = conform_transcripts(transcripts)
    # NB: regexp-based blank test, not trim() — Spark trim strips only
    # ASCII space while the contract (and the pandas oracle) treats any
    # whitespace-only text as blank.
    return transcripts.filter(
        F.col("text").isNotNull()
        & (F.regexp_replace(F.col("text"), r"\s", "") != "")
    )


def assign_doc_ids(df: DataFrame, spark: SparkSession, base: int = 0) -> DataFrame:
    """Dense doc_id (starting at ``base``) in global (conv_id, turn_idx)
    order — scalable two-pass: range-shuffle + sortWithinPartitions,
    per-partition counts prefix-summed on the driver, ids assigned in
    mapInPandas. No global sort bottleneck.
    """
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n_part, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc - base

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("doc_id", T.LongType(), False)]
    )

    def _assign(iterator):
        local = 0
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + local
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(start, start + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield pdf

    result = ranged.mapInPandas(_assign, schema=out_schema)
    return result, ranged, total  # caller unpersists `ranged`


def _manifest_path(out_dir: str) -> Path:
    return Path(out_dir) / "_manifest"


def _write_manifest_row(out_dir: str, name: str, row: dict) -> None:
    mdir = _manifest_path(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    tmp = mdir / f".{name}.tmp"
    tmp.write_text(json.dumps(row))
    tmp.rename(mdir / f"{name}.json")  # atomic: a row exists only if complete


def _read_manifest(out_dir: str) -> dict[str, dict]:
    mdir = _manifest_path(out_dir)
    if not mdir.exists():
        return {}
    out = {}
    for p in sorted(mdir.glob("*.json")):
        out[p.stem] = json.loads(p.read_text())
    return out


def manifest_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The build_manifest table (per-partition lineage + metrics)."""
    rows = []
    for name, r in _read_manifest(out_dir).items():
        rows.append(
            (
                int(r.get("partition_id", -1)),
                r.get("status", "DONE"),
                pd.Timestamp(r["started_ts"], unit="s").floor("us")
                if r.get("started_ts")
                else None,
                pd.Timestamp(r["finished_ts"], unit="s").floor("us")
                if r.get("finished_ts")
                else None,
                r.get("error"),
                int(r.get("postings_written", 0)),
                int(r.get("terms_merged", 0)),
                int(r.get("bytes_compressed", 0)),
                r.get("index_version", ""),
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=[f.name for f in schemas.BUILD_MANIFEST.fields],
    )
    return spark.createDataFrame(pdf, schema=schemas.BUILD_MANIFEST)


def _make_encoder(n_docs: int, avgdl: float, block_size: int):
    """Grouped-map encoder: one (term, part, salt) group -> posting block
    rows. Fully vectorized over the WHOLE group: one delta pass, one
    varbyte pass per array (sliced at block boundaries), reduceat for the
    per-block maxima — no per-block Python loop."""

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term = key[0]
        salt = int(key[2])
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        df_t = int(pdf["df"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))

        n = ids.size
        starts = np.arange(0, n, block_size, dtype=np.int64)
        ends = np.minimum(starts + block_size, n)
        # delta within blocks: each block's first value stays absolute
        deltas = np.empty(n, dtype=np.uint64)
        deltas[0] = ids[0]
        deltas[1:] = np.diff(ids).astype(np.uint64)
        deltas[starts] = ids[starts].astype(np.uint64)

        denom = tfs + K1 * (1 - B + B * dls / avgdl)
        bscores = idf * (tfs * (K1 + 1)) / denom

        return pd.DataFrame(
            {
                "term": term,
                "block_id": salt * BLOCKS_PER_SALT_CAP
                + np.arange(starts.size, dtype=np.int64),
                "n": (ends - starts).astype(np.int32),
                "doc_ids": varbyte_encode_sliced(deltas, starts),
                "tfs": varbyte_encode_sliced(tfs.astype(np.uint64), starts),
                "dls": varbyte_encode_sliced(dls.astype(np.uint64), starts),
                "first_doc_id": ids[starts],
                "last_doc_id": ids[ends - 1],
                "max_tf": np.maximum.reduceat(tfs, starts).astype(np.int32),
                "block_max_score": np.maximum.reduceat(bscores, starts),
                "bucket": bucket,
            },
            columns=[f.name for f in schemas.POSTINGS.fields],
        )

    return encode


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = 16,
    block_size: int = 128,
    salt_budget: int = 100_000,
    n_parts: int = 4,
    index_version: str = "v1",
    resume: bool = True,
    fail_after_parts: int | None = None,  # test hook: simulate a killed job
    part_concurrency: int = 1,  # concurrent part jobs (Spark schedules both)
) -> IndexBuildResult:
    """Full index build with per-part checkpoint/resume."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = _read_manifest(out_dir) if resume else {}
    if not resume and _manifest_path(out_dir).exists():
        for p in _manifest_path(out_dir).glob("*.json"):
            p.unlink()
        manifest = {}

    docs_path = str(out / "documents")
    staging_path = str(out / "_staging_postings_raw")
    stats_path = str(out / "term_stats")
    corpus_path = str(out / "corpus_stats")
    postings_path = str(out / "postings")

    # ---------------- Stage A: documents + exploded staging ----------------
    if manifest.get("stage_docs", {}).get("status") != "DONE":
        t0 = time.time()
        clean = clean_transcripts(transcripts)
        with_ids, ranged, n_docs = assign_doc_ids(clean, spark)
        analyzed = with_ids.withColumn("terms", _terms_udf()(F.col("text")))
        analyzed = analyzed.withColumn("dl", F.size("terms")).persist()

        documents = analyzed.select(
            "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"
        )
        documents.write.mode("overwrite").parquet(docs_path)

        part_size = max(1, math.ceil(n_docs / n_parts))
        exploded = (
            analyzed.select("doc_id", "dl", F.explode("terms").alias("term"))
            .groupBy("term", "doc_id", "dl")  # dl functionally dep. on doc_id
            .agg(F.count("*").alias("tf"))
            .withColumn(
                "part_id", (F.col("doc_id") / F.lit(part_size)).cast("int")
            )
        )
        exploded.write.mode("overwrite").partitionBy("part_id").parquet(
            staging_path
        )
        analyzed.unpersist()
        ranged.unpersist()
        _write_manifest_row(
            out_dir,
            "stage_docs",
            {
                "partition_id": -1,
                "status": "DONE",
                "started_ts": t0,
                "finished_ts": time.time(),
                "index_version": index_version,
                "n_docs": n_docs,
                "part_size": part_size,
            },
        )
        manifest = _read_manifest(out_dir)

    n_docs = int(manifest["stage_docs"]["n_docs"])
    part_size = int(manifest["stage_docs"]["part_size"])

    # ---------------- Stage B: term_stats + corpus_stats -------------------
    n_terms_obs: dict[str, int] = {}
    if manifest.get("stage_stats", {}).get("status") != "DONE":
        t0 = time.time()
        raw = spark.read.parquet(staging_path)
        term_stats = raw.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        stats_ob = Observation(f"stats_{int(t0)}")
        term_stats = term_stats.observe(
            stats_ob, F.count(F.lit(1)).alias("n_terms")
        )
        docs = spark.read.parquet(docs_path)
        corpus = docs.agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.max("dl").cast("double").alias("max_tf_sum"),
            F.lit(index_version).alias("index_version"),
            # the bucket->directory mapping is part of the index's physical
            # layout: persist it so readers (SearchEngine, incremental,
            # compaction) never guess a different n_buckets and silently
            # prune the wrong partition dirs
            F.lit(n_buckets).alias("n_buckets"),
        )

        # the two stats jobs are independent — overlap them (each is a
        # separate Spark job; the scheduler interleaves their stages)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(
                lambda: term_stats.write.mode("overwrite").parquet(stats_path)
            )
            f2 = ex.submit(
                lambda: corpus.write.mode("overwrite").parquet(corpus_path)
            )
            f1.result()
            f2.result()
        n_terms_obs["n"] = int(stats_ob.get["n_terms"] or 0)
        _write_manifest_row(
            out_dir,
            "stage_stats",
            {
                "partition_id": -1,
                "status": "DONE",
                "started_ts": t0,
                "finished_ts": time.time(),
                "index_version": index_version,
                "n_terms": n_terms_obs["n"],
            },
        )
        manifest = _read_manifest(out_dir)

    corpus_row = spark.read.parquet(corpus_path).collect()[0]
    avgdl = float(corpus_row["avgdl"]) if corpus_row["avgdl"] else 1.0
    max_tf_sum = float(corpus_row["max_tf_sum"] or 0.0)

    # ---------------- Stage C: per-part posting encode ---------------------
    term_stats = spark.read.parquet(stats_path)
    encoder = _make_encoder(n_docs, avgdl, block_size)
    actual_parts = math.ceil(n_docs / part_size) if n_docs else 0
    todo = [
        p for p in range(actual_parts)
        if manifest.get(f"part_{p:05d}", {}).get("status") != "DONE"
    ]
    skipped = actual_parts - len(todo)

    def _build_part(p: int) -> None:
        t0 = time.time()
        part_lo = p * part_size
        raw_p = spark.read.parquet(staging_path).filter(F.col("part_id") == p)
        joined = raw_p.join(
            F.broadcast(term_stats.select("term", "df")), "term"
        )
        # range-salting: hot terms (df > budget) split into contiguous
        # doc_id subranges; merge across salts == concatenation.
        n_salts = F.greatest(
            F.lit(1), F.ceil(F.col("df") / F.lit(salt_budget)).cast("long")
        )
        salted = joined.withColumn(
            "salt",
            (
                ((F.col("doc_id") - F.lit(part_lo)) * n_salts)
                / F.lit(part_size)
            ).cast("int"),
        ).withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
        encoded = salted.groupBy("term", "part_id", "salt").applyInPandas(
            lambda key, pdf: encoder(key, pdf), schema=schemas.POSTINGS
        )
        part_dir = f"{postings_path}/part_id={p}"
        # lineage metrics piggy-back on the write action (Observation) —
        # no second pass over the encoded part
        obs = Observation(f"part_{p}")
        encoded = encoded.observe(
            obs,
            F.sum("n").alias("postings_written"),
            # observed metrics forbid DISTINCT aggregates; HLL approximation
            # is fine for lineage metadata
            F.approx_count_distinct("term").alias("terms_merged"),
            F.sum(
                F.length("doc_ids") + F.length("tfs") + F.length("dls")
            ).alias("bytes_compressed"),
            F.count(F.lit(1)).alias("blocks"),
        )
        encoded.write.mode("overwrite").partitionBy("bucket").parquet(part_dir)
        m = obs.get
        _write_manifest_row(
            out_dir,
            f"part_{p:05d}",
            {
                "partition_id": p,
                "status": "DONE",
                "started_ts": t0,
                "finished_ts": time.time(),
                "postings_written": int(m["postings_written"] or 0),
                "terms_merged": int(m["terms_merged"] or 0),
                "bytes_compressed": int(m["bytes_compressed"] or 0),
                "blocks": int(m["blocks"] or 0),
                "index_version": index_version,
            },
        )

    if fail_after_parts is not None:
        # deterministic sequential order for the kill-simulation test hook
        for i, p in enumerate(todo):
            if i >= fail_after_parts:
                raise RuntimeError(f"simulated kill before part {p}")
            _build_part(p)
        built = min(len(todo), fail_after_parts)
    elif part_concurrency > 1 and len(todo) > 1:
        # parts are independent jobs (own output dir + manifest row); the
        # Spark scheduler interleaves their stages across the executor pool
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=part_concurrency) as ex:
            list(ex.map(_build_part, todo))
        built = len(todo)
    else:
        for p in todo:
            _build_part(p)
        built = len(todo)

    manifest = _read_manifest(out_dir)
    total_blocks = sum(
        int(r.get("blocks", 0)) for n, r in manifest.items() if n.startswith("part_")
    )
    n_terms = int(
        manifest.get("stage_stats", {}).get("n_terms")
        or spark.read.parquet(stats_path).count()
    )
    return IndexBuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        max_tf_sum=max_tf_sum,
        n_terms=n_terms,
        postings_blocks=total_blocks,
        parts_built=built,
        parts_skipped=skipped,
        index_version=index_version,
    )
