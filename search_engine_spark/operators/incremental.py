"""Incremental index update — the reference's single-page re-index
(`POST /api/indexPage`, IndexationServiceImpl.java:119-131 +
EntitySaver.java:35-54) re-expressed as an idempotent batch merge:

  new transcripts batch
    -> P1 hygiene filter
    -> ANTI-JOIN against existing documents on (conv_id, turn_idx)
       (replaces the reference's synchronized get-or-create point lookups,
        EntitySaver.java:45-50 / PageRepository.java:18 — J4/S3)
    -> assign doc_ids continuing after the existing max (append order)
    -> analyze -> staging + postings for the NEW part -> append documents
    -> RECOMPUTE term_stats / corpus_stats -> manifest part row (COMMIT)

Recomputing df from postings fixes the reference's df-drift bug
(EntitySaver.java:88-101 increments lemma.frequency again on re-index —
SURVEY.md §3.3/§7.5): our df is always exactly "distinct docs containing
the term", no matter how many times a batch is replayed.

Crash-safety (the multi-table append commit protocol):
  The MANIFEST PART ROW is the commit marker and is written LAST. Write
  order is staging -> postings -> deletes -> documents -> stats ->
  manifest (the delete vector, upsert mode only, travels with its part —
  operators/deletes.py), so at
  entry `_recover_uncommitted` can classify any staging part that has no
  manifest row:
    (a) documents do NOT cover its doc_id range -> the crash happened
        before the documents append; the part is garbage — delete its
        staging + postings dirs and let the replayed batch rebuild them.
    (b) documents DO cover its doc_id range -> everything ordered before
        the documents append (staging, postings) is complete; finish the
        commit (recompute stats, reconstruct the manifest row's metrics
        from the written postings).
  Either way a replayed batch is exact: the anti-join target (documents)
  is only ever written after the artifacts it vouches for. On a cluster
  this maps to a single Iceberg multi-table transaction / snapshot commit;
  on a local FS the marker file is the atomic bit.

Scale notes: the anti-join is a shuffle on (conv_id, turn_idx) sized by the
NEW batch (existing side is pruned to two columns); stats recompute is one
agg over the staging table (columnar, term+tf columns only).

Duplicate (conv_id, turn_idx) rows WITHIN one batch are deliberately kept
(each gets its own doc_id) — a fresh build over the same rows does the
same (assign_doc_ids has no dedup), so incremental == full-rebuild parity
holds; dedup is the ingest pipeline's job (dedup_exact and friends).
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZER_VERSION, terms_col
from .index_build import (
    _attach_terms,
    _read_manifest,
    _write_manifest_row,
    assign_doc_ids,
    check_hash_ids,
    clean_transcripts,
    conform_transcripts,
    encode_salted,
    nonblank_text,
    prepare_salted,
)


def _part_ids_under(out_dir: str, subdir: str) -> set[int]:
    base = Path(out_dir) / subdir
    out: set[int] = set()
    if base.exists():
        for p in base.glob("part_id=*"):
            try:
                out.add(int(p.name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


def _staging_part_ids(out_dir: str) -> set[int]:
    return _part_ids_under(out_dir, "_staging_postings_raw")


def _next_part_id(out_dir: str, manifest: dict) -> int:
    """Number a new part past every part ever seen in the manifest
    (including deletes-only commit markers — their name must never be
    reused either), staging, OR the postings dir itself, so a
    half-committed part id (or a part a crashed compaction swapped in
    before its manifest rewrite) is never reused/clobbered."""
    return 1 + max(
        [int(r["partition_id"]) for r in manifest.values()
         if int(r.get("partition_id", -1)) >= 0]
        + list(_staging_part_ids(out_dir))
        + list(_part_ids_under(out_dir, "postings")),
        default=-1,
    )


def resolve_n_buckets(spark: SparkSession, out_dir: str,
                      requested: int | None = None) -> int:
    """The bucket->directory layout persisted at build time
    (corpus_stats.n_buckets). A caller-supplied mismatch would write/read
    postings under a different bucket mapping — fail loudly."""
    row = spark.read.parquet(f"{out_dir}/corpus_stats").collect()[0]
    persisted = row.asDict().get("n_buckets")
    if persisted is not None:
        if requested is not None and int(requested) != int(persisted):
            raise ValueError(
                f"index at {out_dir} was built with n_buckets="
                f"{int(persisted)}, caller requested {requested}"
            )
        return int(persisted)
    return 16 if requested is None else int(requested)


def _recompute_stats(spark: SparkSession, out_dir: str, version: str,
                     n_buckets: int,
                     stats_epoch: int | None = None,
                     delete_dirs: list[str] | None = None) -> tuple[int, float]:
    """Global stats from the durable fact tables (drift-free df —
    SURVEY.md §7.5). Returns (n_docs, avgdl). ``stats_epoch`` stamps the
    rewrite; part manifest rows carrying a DIFFERENT epoch are thereby
    marked as encoded under older stats, which disables the query
    engine's stored-block_max_score pruning until a compaction
    re-encodes them (query.py:_block_bound_col).

    ``delete_dirs`` pins the delete-vector batch list the stats subtract
    (recovery's sweep passes the committed set so an about-to-be-rolled-
    back batch never poisons the rewrite); None = every batch on disk
    (the in-commit default: the new batch has landed, its marker has
    not)."""
    from .deletes import deleted_ids_df

    stats_path = f"{out_dir}/term_stats"
    corpus_path = f"{out_dir}/corpus_stats"
    raw = spark.read.parquet(f"{out_dir}/_staging_postings_raw")
    docs_all = spark.read.parquet(f"{out_dir}/documents")
    # stats describe the LIVE corpus: the delete vector's docs are
    # subtracted from df/cf and from n_docs/avgdl/max_tf_sum. id_space is
    # the ID-SPACE size (max assigned + 1, deleted ids included) — the
    # layout quantity part-range math needs, which diverges from n_docs
    # once upserts delete docs.
    del_df = deleted_ids_df(spark, out_dir, delete_dirs)
    raw_live = (
        raw.join(del_df, "doc_id", "left_anti") if del_df is not None else raw
    )
    docs_live = (
        docs_all.join(del_df, "doc_id", "left_anti")
        if del_df is not None
        else docs_all
    )
    raw_live.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).write.mode("overwrite").parquet(f"{stats_path}_new")
    id_row = docs_all.agg(
        F.coalesce(F.max("doc_id") + 1, F.lit(0))
        .cast("long")
        .alias("id_space")
    )
    docs_live.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.max("dl").cast("double").alias("max_tf_sum"),
        F.lit(version).alias("index_version"),
        F.lit(n_buckets).alias("n_buckets"),
        F.lit(stats_epoch).cast("long").alias("stats_epoch"),
    ).crossJoin(id_row).write.mode("overwrite").parquet(f"{corpus_path}_new")
    # rename swap (same idiom as compact_index's postings/staging swap;
    # one Iceberg snapshot commit on clusters). Spark's mode("overwrite")
    # would DELETE the live table before its write job runs — a crash in
    # that window loses corpus_stats/term_stats outright, bricking every
    # subsequent operation at entry. The rename gap is instantaneous and
    # leaves *_old on disk for manual restore; it also skips re-writing
    # each table a second time through Spark.
    for tgt in (stats_path, corpus_path):
        old = f"{tgt}_old"
        shutil.rmtree(old, ignore_errors=True)
        if Path(tgt).exists():
            Path(tgt).rename(old)
        Path(f"{tgt}_new").rename(tgt)
        shutil.rmtree(old, ignore_errors=True)
    row = spark.read.parquet(corpus_path).collect()[0]
    return int(row["n_docs"]), float(row["avgdl"]) if row["avgdl"] else 1.0


def require_staging(out_dir: str, manifest: dict) -> None:
    """Fail loudly when the durable staging table is missing from an index
    that has committed parts — the state a crash inside compact_index's
    staging swap (rename-out done, rename-in not) leaves behind. Without
    this guard the next incremental_update would recreate the directory
    with ONLY its own batch (parquet append creates missing dirs) and its
    closing _recompute_stats would silently rewrite global df/cf/avgdl
    from that partial staging; a later compact_index would then rebuild
    postings from it, permanently dropping all prior postings."""
    if not any(k.startswith("part_") for k in manifest):
        return
    if Path(f"{out_dir}/_staging_postings_raw").exists():
        return
    leftover = [
        d
        for d in ("_staging_compacting", "_staging_old")
        if Path(f"{out_dir}/{d}").exists()
    ]
    hint = (
        f"rename {out_dir}/{leftover[0]} back to _staging_postings_raw"
        if leftover
        else "rebuild with build_index(resume=False)"
    )
    raise RuntimeError(
        f"index at {out_dir} has committed parts but no "
        f"_staging_postings_raw — a compact_index staging swap crashed "
        f"mid-rename; {hint}, then retry"
    )


def _recover_uncommitted(spark: SparkSession, out_dir: str,
                         manifest: dict, n_buckets: int) -> dict:
    """See module docstring: delete or finish any staging part whose commit
    marker (manifest part row) is missing."""
    # deletes-only commits (blank-new-text upserts / delete_docs) have no
    # staging part to classify; their commit marker is the deletes_{P}
    # manifest row. An unmarked batch whose part id has no staging dir
    # either is deletes-only crash debris: roll it back (the docs it
    # would have deleted live again). Order matters — the crash may have
    # landed AFTER the stats rewrite (which already subtracted the doomed
    # batch), so stats are restored FIRST, pinned to the surviving batch
    # set, and the irreversible rmtree runs last: a crash anywhere in
    # between re-enters this branch and idempotently repeats it (the
    # reverse order would leave a window where the batch is gone but the
    # stats still exclude its docs, with nothing left to re-trigger the
    # repair).
    from .deletes import (
        delete_batch_dirs,
        drop_delete_batch,
        is_batch_committed,
        sweep_tmp_debris,
    )

    sweep_tmp_debris(out_dir)  # crashed write_delete_batch _tmp_ dirs
    staged_now = _staging_part_ids(out_dir)
    orphan_batches: list[int] = []
    keep_dirs: list[str] = []
    for name in delete_batch_dirs(out_dir):
        p = int(name.rsplit("_", 1)[1])
        if is_batch_committed(name, manifest):
            keep_dirs.append(name)
        elif p in staged_now:
            # normal-batch debris: case (a)/(b) below decides; its
            # deletes stay OUT of this restore either way — a case-(a)
            # crash happened before its stats rewrite, and a case-(b)
            # finish recomputes with the full on-disk set afterwards
            pass
        else:
            orphan_batches.append(p)
    if orphan_batches:
        version = manifest["stage_docs"].get("index_version", "v1")
        n_docs, _ = _recompute_stats(
            spark, out_dir, version, n_buckets,
            stats_epoch=int(time.time() * 1e6),
            delete_dirs=keep_dirs,
        )
        stage = dict(manifest["stage_docs"])
        stage["n_docs"] = n_docs
        _write_manifest_row(out_dir, "stage_docs", stage)
        for p in orphan_batches:
            drop_delete_batch(out_dir, p)
        manifest = _read_manifest(out_dir)
    committed = {
        int(r.get("partition_id", -1))
        for r in manifest.values()
        if int(r.get("partition_id", -1)) >= 0
    }
    orphans = sorted(_staging_part_ids(out_dir) - committed)
    if not orphans:
        return manifest
    version = manifest["stage_docs"].get("index_version", "v1")
    documents = spark.read.parquet(f"{out_dir}/documents")
    docs_max = documents.agg(F.max("doc_id")).collect()[0][0]
    docs_max = -1 if docs_max is None else int(docs_max)
    finish: list[int] = []
    finish_lo: dict[int, int] = {}
    partial_lo: int | None = None
    for p in orphans:
        staging_part = f"{out_dir}/_staging_postings_raw/part_id={p}"
        postings_part = f"{out_dir}/postings/part_id={p}"
        try:
            span = (
                spark.read.parquet(staging_part)
                .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
                .collect()[0]
            )
            lo = None if span["lo"] is None else int(span["lo"])
            hi = None if span["hi"] is None else int(span["hi"])
        except AnalysisException as ex:
            # a crash during the staging append's job commit can leave
            # the part DIRECTORY with zero data files — definitionally
            # case-(a) garbage, not a reason to brick recovery forever
            if "UNABLE_TO_INFER_SCHEMA" not in str(ex):
                raise
            lo = hi = None
        # the documents append commits files one at a time, so covering
        # the part's MIN doc_id does not prove the whole append landed:
        # batch doc_ids are dense in [lo, hi], so the append is complete
        # iff every id in the staging span has a documents row
        n_in_range = (
            documents.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            ).count()
            if lo is not None
            else 0
        )
        if lo is not None and n_in_range == hi - lo + 1:
            # (b) the documents append landed in full -> staging+postings
            # for this part are complete; finish the commit below
            finish.append(p)
            finish_lo[p] = lo
        else:
            # (a) crash before/inside the documents append -> uncommitted
            # garbage. A PARTIAL documents append must be rolled back
            # too: leaving the landed rows would make the anti-join
            # treat those turns as indexed (with no postings) forever.
            # The batch's delete vector rolls back with it — the docs it
            # would have replaced live again (their replacement is gone).
            shutil.rmtree(staging_part, ignore_errors=True)
            shutil.rmtree(postings_part, ignore_errors=True)
            drop_delete_batch(out_dir, p)
            if lo is not None and 0 < n_in_range:
                partial_lo = lo if partial_lo is None else min(partial_lo, lo)
    if partial_lo is not None:
        if any(lo > partial_lo for lo in finish_lo.values()):
            # batches are sequential, so a COMPLETE batch cannot start
            # past a partial one; seeing it means the doc_id-ordering
            # invariant broke — stay loud, never delete committed docs
            raise RuntimeError(
                f"recovery at {out_dir}: complete orphan batch starts "
                f"beyond partial batch at doc_id {partial_lo} — "
                "inconsistent index, rebuild with build_index(resume=False)"
            )
        # rewrite documents without the partial batch's rows (doc_ids at
        # or above the rolled-back batch start — batches are sequential,
        # so nothing committed lives past a rolled-back range). Rename
        # swap, same idiom as _recompute_stats.
        docs_path = f"{out_dir}/documents"
        documents.filter(F.col("doc_id") < partial_lo).write.mode(
            "overwrite"
        ).parquet(f"{docs_path}_new")
        old = f"{docs_path}_old"
        shutil.rmtree(old, ignore_errors=True)
        Path(docs_path).rename(old)
        Path(f"{docs_path}_new").rename(docs_path)
        shutil.rmtree(old, ignore_errors=True)
        # the rewrite renamed every documents file, so retained snapshots'
        # pinned documents_files lists now dangle — expire those records
        # (resolve_snapshot then reports them expired; leaving them would
        # make every as-of read die with raw PATH_NOT_FOUND, r4 review
        # finding). Intact records are kept.
        from .snapshots import expire_dangling_snapshots

        expire_dangling_snapshots(out_dir)
    if not finish:
        return _read_manifest(out_dir)
    # Recompute stats BEFORE writing the DONE manifest rows: a crash
    # between the two leaves the parts as orphans, so replay re-enters
    # this branch and idempotently recomputes again. The reverse order
    # would commit the parts with stale term_stats/corpus_stats and no
    # self-repair path (the part stops being an orphan, recovery never
    # re-triggers, every query scores with pre-batch idf/avgdl).
    # recovered orphan parts were encoded under unknowable pre-crash
    # stats: a fresh epoch here (with no matching part stamps) keeps the
    # stored-block-max validity check conservatively false
    n_docs, _ = _recompute_stats(spark, out_dir, version, n_buckets,
                                 stats_epoch=int(time.time() * 1e6))
    for p in finish:
        m = (
            spark.read.parquet(f"{out_dir}/postings/part_id={p}")
            .agg(
                F.sum("n").alias("postings_written"),
                F.approx_count_distinct("term").alias("terms_merged"),
                F.sum(
                    F.length("doc_ids") + F.length("tfs") + F.length("dls")
                ).alias("bytes_compressed"),
                F.count(F.lit(1)).alias("blocks"),
            )
            .collect()[0]
        )
        now = time.time()
        _write_manifest_row(
            out_dir,
            f"part_{p:05d}",
            {
                "partition_id": p,
                "status": "DONE",
                "started_ts": now,
                "finished_ts": now,
                "postings_written": int(m["postings_written"] or 0),
                "terms_merged": int(m["terms_merged"] or 0),
                "bytes_compressed": int(m["bytes_compressed"] or 0),
                "blocks": int(m["blocks"] or 0),
                "index_version": version,
                "recovered": True,
            },
        )
    stage = dict(manifest["stage_docs"])
    stage["n_docs"] = n_docs
    _write_manifest_row(out_dir, "stage_docs", stage)
    return _read_manifest(out_dir)


def _commit_deletes_only(
    spark: SparkSession,
    out_dir: str,
    manifest: dict,
    doomed: DataFrame,
    n_doomed: int,
    version: str,
    n_buckets: int,
) -> int:
    """Commit a batch of pure deletions (no staging/postings/documents
    write): the doomed (doc_id) rows join the delete vector and the live
    stats are rewritten without them. Since there is no part whose
    manifest row could be the commit marker, a dedicated ``deletes_{P}``
    row is, written LAST. Protocol: delete batch -> stats rewrite ->
    marker -> snapshot. A crash before the marker leaves an unmarked
    batch that _recover_uncommitted's sweep rolls back (recomputing
    stats, since the crash may have landed after the rewrite). Returns
    the id the batch was committed under."""
    from .deletes import write_delete_batch
    from .snapshots import commit_snapshot

    part_new = _next_part_id(out_dir, manifest)
    write_delete_batch(doomed, out_dir, part_new)
    new_epoch = int(time.time() * 1e6)
    n_docs, _ = _recompute_stats(
        spark, out_dir, version, n_buckets, stats_epoch=new_epoch
    )
    now = time.time()
    _write_manifest_row(
        out_dir,
        f"deletes_{part_new:05d}",
        {
            "partition_id": part_new,
            "status": "DONE",
            "started_ts": now,
            "finished_ts": now,
            "index_version": version,
            "stats_epoch": new_epoch,
            "replaced_docs": n_doomed,
            "deletes_only": True,
        },
    )
    row = dict(manifest["stage_docs"])
    row.update({"n_docs": n_docs})
    _write_manifest_row(out_dir, "stage_docs", row)
    commit_snapshot(
        spark, out_dir, "delete", stats_epoch=new_epoch, n_docs=n_docs
    )
    return part_new


def delete_docs(
    spark: SparkSession,
    keys: DataFrame,
    out_dir: str,
    *,
    tombstone: bool = True,
) -> dict:
    """Targeted deletion — the standalone half of the reference's
    deleteAllByPageId (IndexationServiceImpl.java:119-123; wiping a
    page's rows WITHOUT re-adding, e.g. a takedown / right-to-be-
    forgotten request over a training corpus). ``keys`` is a DataFrame
    with a ``conv_id`` column (every live turn of those conversations is
    deleted) or (``conv_id``, ``turn_idx``) columns (exactly those
    turns). Returns {"deleted_docs": int}.

    Same merge-on-read shape as upsert (operators/deletes.py): the doomed
    doc_ids join the delete vector in one deletes-only commit; nothing in
    staging/postings/documents is touched until the next compact_index
    physically drops the rows. Idempotent — re-deleting the same keys
    matches nothing live and commits nothing.

    ``tombstone=True`` (default) also records the keys in the tombstone
    table (written FIRST, so no crash window lets a replay slip by):
    every future ingest drops incoming rows matching them, which is what
    makes the takedown hold against REPLAYED batches — e.g. a streaming
    micro-batch whose checkpoint never committed would otherwise
    silently re-index the removed key. Lift with
    deletes.clear_tombstones. ``tombstone=False`` is the soft delete:
    a later incremental_update of the same (conv_id, turn_idx)
    re-indexes it as a NEW doc (the anti-join anchor is the LIVE view)."""
    manifest = _read_manifest(out_dir)
    if manifest.get("stage_docs", {}).get("status") != "DONE":
        raise ValueError(f"no complete index at {out_dir}; run build_index first")
    version = manifest["stage_docs"].get("index_version", "v1")
    n_buckets = resolve_n_buckets(spark, out_dir, None)
    require_staging(out_dir, manifest)
    manifest = _recover_uncommitted(spark, out_dir, manifest, n_buckets)

    from .deletes import deleted_ids_df, write_tombstones

    if tombstone:
        write_tombstones(keys, out_dir)

    existing = spark.read.parquet(f"{out_dir}/documents")
    prior_del = deleted_ids_df(spark, out_dir)
    live = (
        existing.join(prior_del, "doc_id", "left_anti")
        if prior_del is not None
        else existing
    )
    # a NULL turn_idx row in a turn-keyed frame means the WHOLE
    # conversation — the tombstone table's own encoding, so a ledger
    # round-trips through delete_docs/clear_tombstones symmetrically
    # (a null-unsafe semi-join would silently delete nothing for it)
    if "turn_idx" in keys.columns:
        k = keys.select(
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
        ).distinct()
        matched = live.join(
            k.filter(F.col("turn_idx").isNotNull()),
            ["conv_id", "turn_idx"],
            "left_semi",
        ).unionByName(
            live.join(
                k.filter(F.col("turn_idx").isNull()).select("conv_id"),
                "conv_id",
                "left_semi",
            )
        )
    else:
        matched = live.join(
            keys.select("conv_id").distinct(), "conv_id", "left_semi"
        )
    # localCheckpoint: the commit below mutates the vector this plan
    # reads through (same self-dependency rule as the upsert anti-join)
    doomed = matched.select("doc_id").distinct().localCheckpoint()
    n = doomed.count()
    if n == 0:
        return {"deleted_docs": 0}
    _commit_deletes_only(
        spark, out_dir, manifest, doomed, n, version, n_buckets
    )
    return {"deleted_docs": n}


def apply_cdc_batch(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    *,
    tombstone_deletes: bool = False,
) -> dict:
    """Apply one CDC (change-data-capture) batch — the Iceberg/Delta
    ``apply changes`` shape, so a single stream can carry the index's
    whole mutation surface. ``batch`` is TRANSCRIPTS columns plus an
    ``op`` string column: 'I'/'U' rows upsert (insert-or-replace via the
    delete vector; 'I' and 'U' are deliberately synonyms — upsert
    semantics make the distinction immaterial and CDC feeds routinely
    mislabel them), 'D' rows delete the key (text ignored). Returns
    {"new_docs", "new_parts", "replaced_docs", "deleted_docs"}.

    Per-key conflict rule: deletes are applied AFTER upserts, so a key
    carrying both in one batch ends deleted (last-write-wins at the
    batch grain — the compaction of a "row updated then dropped" run).
    Replays converge exactly like the underlying ops: a replayed batch
    finds the upserted keys unchanged and the deleted keys gone.
    ``tombstone_deletes`` stays False by default: a CDC delete is data
    flow, not a takedown — the key may legitimately return later."""
    if "op" not in batch.columns:
        raise ValueError("CDC batch needs an 'op' column ('I'/'U'/'D')")
    ops = batch.select("op").distinct()
    bad = [
        r["op"] for r in ops.collect() if r["op"] not in ("I", "U", "D")
    ]
    if bad:
        raise ValueError(f"CDC batch has unknown op values: {sorted(bad)}")
    upserts = batch.filter(F.col("op") != "D").drop("op")
    res_u = incremental_update(spark, upserts, out_dir, upsert=True)
    deletes = batch.filter(F.col("op") == "D").select(
        "conv_id", "turn_idx"
    ).distinct()
    res_d = (
        delete_docs(spark, deletes, out_dir, tombstone=tombstone_deletes)
        if deletes.limit(1).count()
        else {"deleted_docs": 0}
    )
    return {**res_u, **res_d}


def incremental_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    out_dir: str,
    *,
    n_buckets: int | None = None,
    block_size: int = 128,
    salt_budget: int = 100_000,
    index_version: str | None = None,
    upsert: bool = False,
) -> dict:
    """Merge a batch of new turns into an existing index at ``out_dir``.
    Returns {"new_docs": int, "new_parts": int, "replaced_docs": int}.
    Idempotent: replaying the same batch is a no-op (anti-join drops
    already-indexed turns), and a replay after a mid-write crash repairs
    the index first (see module docstring).

    ``upsert=True`` adds the reference's re-index-page REPLACE semantics
    (IndexationServiceImpl.java:119-131: deleteAllByPageId + re-add): an
    incoming turn whose (conv_id, turn_idx) already exists but whose TEXT
    differs replaces the old doc — the old doc_id joins the delete vector
    (operators/deletes.py, Iceberg merge-on-read shape) and the new text
    is indexed as a new doc in this batch's part. Same-text replays stay
    no-ops either way. Replacement is text-keyed: rows differing only in
    role/tool/ts are treated as unchanged. With upsert=False (default) a
    changed turn is dropped like any already-indexed key — pure insert
    semantics, bit-compatible with every pre-upsert index."""
    manifest = _read_manifest(out_dir)
    if manifest.get("stage_docs", {}).get("status") != "DONE":
        raise ValueError(f"no complete index at {out_dir}; run build_index first")
    built_with = manifest["stage_docs"].get("analyzer_version", "a1")
    if built_with != ANALYZER_VERSION:
        raise ValueError(
            f"index at {out_dir} was built with analyzer {built_with}, "
            f"current analyzer is {ANALYZER_VERSION}: new turns would "
            "tokenize differently than the existing postings — rebuild "
            "with build_index(resume=False)"
        )
    # a positions index propagates its layout: the new part's staging rows
    # carry the per-(doc,term) position arrays and its posting blocks gain
    # the same delta-varbyte positions stream the base build wrote, so the
    # phrase reader sees a uniform schema across every part (the guard
    # this path replaced existed because a position-less merged part would
    # be silently skipped by the positions phrase plan)
    store_pos = bool(manifest["stage_docs"].get("store_positions", False))
    version = index_version or manifest["stage_docs"].get("index_version", "v1")
    n_buckets = resolve_n_buckets(spark, out_dir, n_buckets)
    require_staging(out_dir, manifest)
    manifest = _recover_uncommitted(spark, out_dir, manifest, n_buckets)

    docs_path = f"{out_dir}/documents"
    staging_path = f"{out_dir}/_staging_postings_raw"
    postings_path = f"{out_dir}/postings"

    existing = spark.read.parquet(docs_path)
    base = existing.agg(F.max("doc_id")).collect()[0][0]
    base = int(base) + 1 if base is not None else 0

    # the live view subtracts the delete vector: replaced docs must not
    # anchor the anti-join (their replacement row does) nor feed stats
    from .deletes import deleted_ids_df, write_delete_batch

    prior_del = deleted_ids_df(spark, out_dir)
    existing_live = (
        existing.join(prior_del, "doc_id", "left_anti")
        if prior_del is not None
        else existing
    )

    # localCheckpoint truncates lineage at the anti-join: everything below
    # appends to `documents`, and a lazily re-evaluated anti-join against
    # the just-appended table would silently see its own output (classic
    # self-dependency) — the batch must be materialized BEFORE any write
    # takedown tombstones (operators/deletes.py): keys removed by
    # delete_docs(tombstone=True) must never come back via a replayed
    # batch — drop them from the incoming side BEFORE any anti-join,
    # in both modes. None (no takedown ever) costs nothing.
    from .deletes import filter_tombstoned, tombstones_df

    tombs = tombstones_df(spark, out_dir)
    if upsert:
        # changed-detection runs BEFORE hygiene: a key whose NEW text is
        # blank must still DELETE the old doc (the reference's re-index
        # of a now-empty page wipes its rows and re-adds nothing) — the
        # hygiene filter only gates what gets (re-)indexed, never what
        # gets replaced
        incoming_all = conform_transcripts(new_transcripts)
        if tombs is not None:
            incoming_all = filter_tombstoned(incoming_all, tombs)
        # the live side is AGGREGATED per key: duplicate (conv_id,
        # turn_idx) keys are legal in the doc store (module docstring —
        # batch-internal duplicates each get a doc_id), so a plain join
        # would fan incoming rows out and index one row several times.
        # One group row per key keeps the join 1:1 on the live side.
        # Changed-detection compares the key's INDEXABLE text multiset
        # (sorted arrays; hygiene-blank incoming rows are excluded —
        # they never index, so counting them would block replay
        # convergence): unchanged iff live texts == incoming non-blank
        # texts, which makes a replay of ANY batch — duplicate keys
        # included — land on an identical live set and go quiet. Any
        # difference is replaced wholesale: literally deleteAllByPageId
        # + re-add collapsing a page to its incoming rows.
        base_cols = list(incoming_all.columns)
        wk = Window.partitionBy("conv_id", "turn_idx")
        incoming_all = incoming_all.withColumn(
            "_inc_texts",
            F.sort_array(
                F.collect_list(
                    F.when(nonblank_text(), F.col("text"))
                ).over(wk)
            ),
        )
        live_keyed = existing_live.groupBy("conv_id", "turn_idx").agg(
            F.collect_list("doc_id").alias("_old_ids"),
            F.sort_array(F.collect_list("text")).alias("_old_texts"),
        )
        # ONE materialized join: fresh/replaced/counts all derive from
        # this checkpoint, so the incoming-vs-live comparison runs as a
        # single Spark job and nothing below re-reads `documents`
        # through a live plan (self-dependency rule, see comment above)
        j = (
            incoming_all.join(live_keyed, ["conv_id", "turn_idx"], "left")
            .withColumn(
                "_changed",
                F.col("_old_ids").isNotNull()
                & (F.col("_inc_texts") != F.col("_old_texts")),
            )
            .localCheckpoint()
        )
        # batch = brand-new keys + changed keys (indexed as new docs),
        # hygiene-gated like any build input
        fresh = j.filter(
            (F.col("_old_ids").isNull() | F.col("_changed"))
            & nonblank_text()
        ).select(*base_cols)
        replaced = (
            j.filter(F.col("_changed"))
            .select(F.explode("_old_ids").alias("doc_id"))
            .distinct()
        )
        n_replaced = replaced.count()
    else:
        incoming_ins = clean_transcripts(new_transcripts)
        if tombs is not None:
            incoming_ins = filter_tombstoned(incoming_ins, tombs)
        fresh = (
            incoming_ins.join(
                existing_live.select("conv_id", "turn_idx"),
                ["conv_id", "turn_idx"],
                "left_anti",
            )
            .localCheckpoint()
        )
        replaced = None
        n_replaced = 0
    with_ids, ranged, n_new = assign_doc_ids(fresh, spark, base=base)
    if n_new == 0:
        ranged.unpersist()
        if n_replaced:
            # deletes-only commit: every changed key's new text is
            # hygiene-blank — the reference's "page now empty" re-index
            # (deleteAllByPageId wipes the rows, the re-add indexes
            # nothing).
            _commit_deletes_only(
                spark, out_dir, manifest, replaced, n_replaced,
                version, n_buckets,
            )
        return {"new_docs": 0, "new_parts": 0, "replaced_docs": n_replaced}

    t0 = time.time()
    analyzed = with_ids.withColumn("terms", terms_col(F.col("text")))
    analyzed = analyzed.withColumn("dl", F.size("terms")).persist()

    # a failed write below must not pin the batch caches for the
    # session lifetime (under streaming ingest the session is
    # long-lived and each failed micro-batch would leak another
    # batch-sized cache) — same guard as build_index's stage A
    try:
        # each batch becomes ONE new part directory — a fresh overwrite of its
        # own path (atomic locally; an Iceberg snapshot commit on clusters),
        # never an append into existing part dirs. Number it past every part
        # ever seen in manifest, staging, OR the postings dir itself, so a
        # half-committed part id (or a part a crashed compaction swapped in
        # before its manifest rewrite) is never reused/clobbered.
        part_new = _next_part_id(out_dir, manifest)
        if store_pos:
            # same staging shape as build_index's positions branch
            # (index_build.py stage A): pos = 0-based token index in the
            # analyzed lemma array, one SORTED array per (doc, term)
            exploded = (
                analyzed.select(
                    "doc_id", "dl",
                    F.posexplode("terms").alias("pos", "term"),
                )
                .groupBy("term", "doc_id", "dl")
                .agg(
                    F.count("*").alias("tf"),
                    F.sort_array(F.collect_list("pos")).alias("pos"),
                )
                .withColumn("part_id", F.lit(part_new).cast("int"))
            )
        else:
            exploded = (
                analyzed.select(
                    "doc_id", "dl", F.explode("terms").alias("term")
                )
                .groupBy("term", "doc_id", "dl")
                .agg(F.count("*").alias("tf"))
                .withColumn("part_id", F.lit(part_new).cast("int"))
            )
        exploded.write.mode("append").partitionBy("part_id").parquet(staging_path)

        # postings for the new part (df comes from a post-merge recompute below,
        # but the encoder needs df now for idf-at-encode — use the union view:
        # staging already contains the new part). LIVE view throughout:
        # prior deletes AND this batch's replacements are subtracted so the
        # encode-time stats stay bit-identical to what _recompute_stats
        # persists once the delete batch is on disk.
        raw = spark.read.parquet(staging_path)
        raw_live = raw
        live_prev = existing_live
        if prior_del is not None:
            raw_live = raw_live.join(prior_del, "doc_id", "left_anti")
        if n_replaced:
            raw_live = raw_live.join(replaced, "doc_id", "left_anti")
            live_prev = live_prev.join(replaced, "doc_id", "left_anti")
        term_stats_now = raw_live.groupBy("term").agg(F.count("*").alias("df"))
        # n_docs + avgdl over LIVE docs after this batch, in one job
        stat_row = (
            live_prev.select("dl")
            .unionByName(analyzed.select("dl"))
            .agg(F.count("*").alias("n"), F.avg("dl").alias("a"))
            .collect()[0]
        )
        docs_after = int(stat_row["n"])
        avgdl = float(stat_row["a"]) if stat_row["a"] else 1.0

        raw_p = raw.filter(F.col("part_id") == part_new)
        batch_span = max(1, n_new)
        hash_ids = check_hash_ids(term_stats_now)
        salted = prepare_salted(
            raw_p, term_stats_now, base, batch_span, salt_budget, hash_ids,
            store_positions=store_pos,
        )
        encoded = _attach_terms(
            encode_salted(salted, spark, docs_after, avgdl, block_size,
                          store_positions=store_pos),
            term_stats_now,
            n_buckets,
            hash_ids,
            store_positions=store_pos,
        )
        obs = Observation(f"incr_part_{part_new}_{int(t0)}")
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

        # delete vector AFTER postings, BEFORE documents: recovery
        # classifies it with the part (an uncommitted batch's deletes are
        # rolled back with its staging/postings — the old docs live again
        # because their replacement was never committed)
        if n_replaced:
            write_delete_batch(replaced, out_dir, part_new)

        # documents LAST among data tables — the anti-join anchor must never
        # vouch for artifacts that don't exist yet (crash-safety, see docstring)
        analyzed.select(
            "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"
        ).write.mode("append").parquet(docs_path)
    finally:
        analyzed.unpersist()
        ranged.unpersist()

    # the new part was encoded with POST-merge stats (docs_after, union
    # df, union avgdl — integer dl/df sums make those bit-identical to
    # what _recompute_stats persists), so it may carry the new epoch;
    # PRE-existing parts keep their old epochs, which correctly disables
    # stored-block-max pruning until compaction re-encodes them
    new_epoch = int(time.time() * 1e6)
    n_docs, _ = _recompute_stats(spark, out_dir, version, n_buckets,
                                 stats_epoch=new_epoch)

    # COMMIT: the manifest part row marks the batch durable
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
            "stats_epoch": new_epoch,
            "replaced_docs": n_replaced,
        },
    )
    row = dict(manifest["stage_docs"])
    row.update({"n_docs": n_docs})
    _write_manifest_row(out_dir, "stage_docs", row)
    # AppendFiles commit: the new part + appended documents files (and any
    # delete batch) become one retained snapshot; prior snapshots still
    # resolve (time travel)
    from .snapshots import commit_snapshot

    commit_snapshot(
        spark, out_dir, "append", stats_epoch=new_epoch, n_docs=n_docs
    )
    return {"new_docs": n_new, "new_parts": 1, "replaced_docs": n_replaced}
