"""Doc-level delete vectors — the Iceberg delete-file analog that makes
true UPSERT possible over immutable posting parts.

The reference's single-page re-index REPLACES a page's lemma/index rows
(`deleteAllByPageId` + re-add, IndexationServiceImpl.java:119-131); our
posting parts are immutable columnar files, so replacement is expressed
the way Iceberg's merge-on-read does it: the old doc_id goes into a
delete vector, the new text is indexed as a new doc in the batch's new
part, and every read subtracts the vector — queries via a numpy mask in
the decode kernels, stats via an anti-join in `_recompute_stats`.
`compact_index` is the merge: it rewrites staging/postings/documents
without the deleted rows and purges the vector.

Layout: one parquet directory per upsert batch,
``_deletes/batch_part_{P:05d}/`` (single column ``doc_id`` long), named
after the posting part whose batch replaced those docs — so crash
recovery can classify an orphan delete batch exactly like the part's
staging/postings dirs (operators/incremental.py commit protocol: the
delete batch is written AFTER postings and BEFORE the documents append;
a rolled-back batch rolls its deletes back too, resurrecting the old
docs it would have replaced).

Scale notes: the vector holds only docs replaced since the last
compaction — it is collected to the driver once per SearchEngine and
shipped to the decode kernels inside the UDF closure (at Iceberg scale
this becomes a broadcast roaring bitmap; same plan shape). The decode
mask is one vectorized ``np.isin`` per (term, batch). Compaction bounds
the vector's growth exactly as it bounds part-count growth.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession

DELETES_DIR = "_deletes"


def _root(out_dir: str) -> Path:
    return Path(out_dir) / DELETES_DIR


def batch_dir_name(part_id: int) -> str:
    return f"batch_part_{part_id:05d}"


def delete_batch_dirs(out_dir: str) -> list[str]:
    """Sorted names of committed delete batches. [] when none exist."""
    root = _root(out_dir)
    if not root.exists():
        return []
    return sorted(
        p.name for p in root.glob("batch_part_*") if p.is_dir()
    )


def deleted_ids_df(
    spark: SparkSession, out_dir: str, dirs: list[str] | None = None
) -> DataFrame | None:
    """Union view of the delete vector as a (doc_id) DataFrame, or None
    when there are no deletes (callers skip their anti-join entirely —
    the common case costs nothing). ``dirs`` pins a snapshot's batch
    list for as-of reads."""
    names = delete_batch_dirs(out_dir) if dirs is None else list(dirs)
    if not names:
        return None
    paths = [str(_root(out_dir) / n) for n in names]
    return spark.read.parquet(*paths).select("doc_id").distinct()


def load_deleted_ids(
    spark: SparkSession, out_dir: str, dirs: list[str] | None = None
) -> np.ndarray | None:
    """The vector as a sorted unique int64 array for the decode kernels,
    or None when empty."""
    df = deleted_ids_df(spark, out_dir, dirs)
    if df is None:
        return None
    ids = np.array([r[0] for r in df.collect()], dtype=np.int64)
    if ids.size == 0:
        return None
    ids.sort()
    return ids


def write_delete_batch(
    replaced: DataFrame, out_dir: str, part_id: int
) -> str:
    """Persist one upsert batch's replaced doc_ids, keyed to the posting
    part that carries their replacements. Overwrite of its own directory
    (idempotent on replay, atomic locally)."""
    name = batch_dir_name(part_id)
    replaced.select("doc_id").write.mode("overwrite").parquet(
        str(_root(out_dir) / name)
    )
    return name


def drop_delete_batch(out_dir: str, part_id: int) -> None:
    """Roll back an uncommitted batch's deletes (crash recovery case (a):
    the replacement part was rolled back, so the old docs live again)."""
    shutil.rmtree(_root(out_dir) / batch_dir_name(part_id),
                  ignore_errors=True)


def purge_deletes(out_dir: str) -> None:
    """Drop the whole vector — ONLY legal after a rewrite that removed
    the deleted rows from staging/postings/documents (compact_index)."""
    shutil.rmtree(_root(out_dir), ignore_errors=True)
