"""Top-k query engine over the built index (reference search lifecycle,
SearchServiceImpl.java:34-103; SURVEY.md §3.1).

Flow per query:
  1. analyze the query driver-side (tiny; same analyzer as the build).
  2. dictionary lookup in term_stats — filter + collect of <=|q| rows
     (J3, LemmaRepository.java:18-21); df-ascending term order (O1).
  3. optional df cutoff (P3, SearchServiceImpl.java:169-178; OFF by default
     — documented deviation, it changes recall).
  4. posting-block scan: parquet read pruned by `bucket` partition dirs +
     `term` row-group min/max; decode + per-term BM25 partials in
     mapInPandas (Arrow, numpy). Multi-term conjunctive queries
     additionally prune to the RAREST term's doc_id ranges (the
     distributed analog of WAND pointer advance); hot SINGLE-term
     queries run two-pass block-max pruning (seed the k best-bounded
     blocks -> provisional kth score -> skip every block whose score
     upper bound is strictly below it — exact, tie-safe; see
     _single_term_topk).
  5. per-doc combine: pivot per-term partial scores and sum in FIXED
     df-ascending term order (left-to-right chain) so float accumulation is
     bit-identical to the single-node oracle — rank-identity without
     tolerance games.
  6. TakeOrderedAndProject top-(offset+k) by (score DESC, doc_id ASC) —
     deterministic tie-break (fixes the reference's HashSet
     nondeterminism; SURVEY.md §7.5).
  7. broadcast-join documents for text; snippet pandas UDF on k rows only.

Scoring modes:
  - "bm25" (default): idf = ln(1 + (N - df + .5)/(df + .5)), k1=1.2, b=.75
  - "relevance_ref": SUM(tf)/max_tf_sum — exact reference formula
    (IndexRepository.java:14-20)
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analyzer import analyze_text

from .. import schemas
from ..functions.snippet import make_snippet
from .index_build import K1, B


@dataclass
class TermInfo:
    term: str
    df: int
    order: int  # df-ascending rank among query terms


class SearchEngine:
    """Loads index metadata once; each ``search`` call is one Spark job."""

    def __init__(
        self, spark: SparkSession, index_dir: str,
        n_buckets: int | None = None, snapshot_id: int | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        # Time travel (operators/snapshots.py): an explicit snapshot_id
        # pins the engine to that commit — its stats copy, its posting
        # parts (a part_id partition predicate: directory-level pruning,
        # old parts never listed beyond the filter), and the exact
        # documents files of the commit. snapshot_id=None reads HEAD
        # through the live layout exactly as before (no snapshot store
        # required — legacy indexes keep working).
        self.snapshot: dict | None = None
        stats_root = index_dir
        if snapshot_id is not None:
            from .snapshots import resolve_snapshot, stats_dir

            self.snapshot = resolve_snapshot(index_dir, snapshot_id)
            stats_root = str(stats_dir(index_dir, self.snapshot["stats_epoch"]))
        corpus = spark.read.parquet(f"{stats_root}/corpus_stats").collect()[0]
        # bucket layout is persisted with the index (corpus_stats.n_buckets);
        # a caller-supplied mismatch would silently prune the wrong partition
        # dirs, so fail loudly instead
        persisted = corpus.asDict().get("n_buckets")
        if persisted is not None:
            if n_buckets is not None and int(n_buckets) != int(persisted):
                raise ValueError(
                    f"index at {index_dir} was built with n_buckets="
                    f"{int(persisted)}, caller requested {n_buckets}"
                )
            self.n_buckets = int(persisted)
        else:  # pre-persistence index layout
            self.n_buckets = 16 if n_buckets is None else int(n_buckets)
        self.n_docs = int(corpus["n_docs"])
        # layout bound: doc_ids span [0, id_space) — on an index that ever
        # replaced docs (operators/deletes.py) this EXCEEDS n_docs (the
        # LIVE count BM25 scores with), so anything that turns a doc_id
        # into an array slot (search_many's range buckets, the MaxScore
        # grid) must size by id_space, never n_docs. Older indexes lack
        # the column; there ids are dense and n_docs IS the space.
        _isp = corpus.asDict().get("id_space")
        self.id_space = int(_isp) if _isp is not None else self.n_docs
        self.avgdl = float(corpus["avgdl"]) if corpus["avgdl"] else 1.0
        self.max_tf_sum = float(corpus["max_tf_sum"] or 1.0)
        _ep = corpus.asDict().get("stats_epoch")
        self._stats_epoch = int(_ep) if _ep is not None else None
        self.term_stats = spark.read.parquet(f"{stats_root}/term_stats")
        try:
            self.postings = spark.read.parquet(f"{index_dir}/postings")
        except AnalysisException as ex:
            # a valid index over an EMPTY corpus has zero parts and thus no
            # postings directory at all — queries must return empty, not
            # die. Anything but the missing-path case is a REAL error
            # (corrupt footer, permissions) and must propagate, never be
            # silently read as "no matches". The empty fallback is ONLY
            # legal when the corpus is actually empty: a populated index
            # with no postings dir means a crashed compaction swap
            # (postings renamed away, replacement not renamed in) — that
            # must stay loud, never become silently-zero results.
            # UNABLE_TO_INFER_SCHEMA = the postings dir EXISTS with part
            # dirs but zero data files: the committed shape of a build
            # whose every document analyzed to zero terms (non-blank but
            # symbol-only text — hygiene keeps the docs, the analyzer
            # emits nothing, and writing an empty partitioned frame
            # produces no files). That index is valid; queries are empty.
            if "UNABLE_TO_INFER_SCHEMA" in str(ex):
                self.postings = spark.createDataFrame(
                    [], schema=schemas.POSTINGS
                )
            else:
                if "PATH_NOT_FOUND" not in str(ex):
                    raise
                if self.n_docs > 0:
                    raise RuntimeError(
                        f"index at {index_dir} has n_docs={self.n_docs} but "
                        "no postings directory — likely a crashed "
                        "compact_index swap; restore _postings_old/"
                        "_postings_compacting or rebuild"
                    ) from ex
                self.postings = spark.createDataFrame(
                    [], schema=schemas.POSTINGS
                )
        if self.snapshot is not None:
            # as-of reads pin the commit's membership: parts by partition
            # predicate (isin over the part_id dir column — an empty live
            # set matches nothing), documents by exact file list (appends
            # only ever ADD files, so the pinned list is immutable)
            live = [int(p) for p in self.snapshot["part_ids"]]
            if "part_id" in self.postings.columns:
                self.postings = self.postings.filter(
                    F.col("part_id").isin(live) if live else F.lit(False)
                )
            files = [
                f"{index_dir}/documents/{name}"
                for name in self.snapshot["documents_files"]
            ]
            self.documents = (
                spark.read.parquet(*files)
                if files
                else spark.createDataFrame([], schema=schemas.DOCUMENTS)
            )
        else:
            self.documents = spark.read.parquet(f"{index_dir}/documents")
        # delete vector (operators/deletes.py, upsert support): collected
        # once per engine, masked out of every decode kernel and
        # anti-joined off the documents view, so replaced docs neither
        # score nor surface. Pinned snapshots load THEIR vector (a
        # snapshot taken before an upsert correctly still sees the old
        # doc). None (the common case) costs nothing anywhere.
        from .deletes import committed_delete_batch_dirs, load_deleted_ids

        # HEAD reads apply only COMMITTED batches (marker row present):
        # an in-flight/crashed batch's deletes are not state yet, and
        # masking them against pre-commit stats would score with an
        # n_docs/df counting docs that can never surface
        self._deleted = load_deleted_ids(
            spark,
            index_dir,
            self.snapshot.get("delete_dirs", [])
            if self.snapshot is not None
            else committed_delete_batch_dirs(index_dir),
        )
        # the decode kernels consume the vector via a Spark BROADCAST, not
        # a closure capture: a closure ships the O(replaced-docs) int64
        # array inside EVERY task's serialized UDF, a broadcast ships it
        # once per executor (torrent blocks) and tasks read the cached
        # value — the difference between O(tasks) and O(executors) copies
        # on a high-churn corpus between compactions. It lives as long as
        # the engine's SparkContext (vectors are compaction-bounded and
        # tiny next to executor memory, so no explicit unpersist).
        self._deleted_bc = (
            spark.sparkContext.broadcast(self._deleted)
            if self._deleted is not None
            else None
        )
        if self._deleted is not None:
            ddf = spark.createDataFrame(
                [(int(i),) for i in self._deleted], "doc_id long"
            )
            self.documents = self.documents.join(
                F.broadcast(ddf), "doc_id", "left_anti"
            )
        self._init_caches()

    def _init_caches(self) -> None:
        # A SearchEngine is a SNAPSHOT view of an immutable index (it
        # already pins corpus_stats at construction), so per-term
        # dictionary rows and block ranges can be memoized — repeated or
        # vocabulary-overlapping queries skip whole driver-coordinated
        # Spark jobs, the dominant fixed cost of the latency-bound read
        # path. Rebuild the engine after an incremental_update.
        self._df_cache: dict[str, int | None] = {}
        self._ranges_cache: dict[str, list[tuple[int, int]] | None] = {}
        self._stored_bmx_valid: bool | None = None
        # plan-audit breadcrumbs from the last _maxscore_topk run
        self.last_maxscore_stats: dict | None = None
        # store_positions=True builds widen postings with the per-block
        # positions stream; search_phrase picks the indexed path off it
        self.has_positions = "positions" in self.postings.columns

    VALID_MODES = ("bm25", "relevance_ref")

    @classmethod
    def _check_mode(cls, mode: str) -> None:
        # an unrecognized mode must never silently fall through to the
        # relevance_ref else-branches in the scoring kernels
        if mode not in cls.VALID_MODES:
            raise ValueError(
                f"unknown scoring mode {mode!r}; valid: {cls.VALID_MODES}"
            )

    # ------------------------------------------------------------------
    def lookup_terms(self, query: str, max_df: int | None = None) -> tuple[list[TermInfo], int]:
        """Analyze + dictionary lookup. Returns (present terms df-asc,
        n_missing = count of analyzed terms absent from the dictionary).
        Missing terms under conjunctive semantics make the result empty —
        the caller decides."""
        q_terms = sorted(set(analyze_text(query)))
        return self._infos_for_terms(q_terms, max_df=max_df)

    def _infos_for_terms(
        self, q_terms: list[str], max_df: int | None = None
    ) -> tuple[list[TermInfo], int]:
        """lookup_terms over an already-analyzed, sorted lemma set — the
        shared core, so search_many analyzes each query text exactly
        once."""
        if not q_terms:
            return [], 0
        self._fill_df_cache(q_terms)
        found = {
            t: self._df_cache[t]
            for t in q_terms
            if self._df_cache[t] is not None
        }
        n_missing = sum(1 for t in q_terms if t not in found)
        infos = [
            TermInfo(t, found[t], 0)
            for t in q_terms
            if t in found and (max_df is None or found[t] < max_df)
        ]
        infos.sort(key=lambda ti: (ti.df, ti.term))  # O1 rarest-first
        for i, ti in enumerate(infos):
            ti.order = i
        return infos, n_missing

    def _fill_df_cache(self, terms: list[str]) -> None:
        """Memoize dictionary rows for ``terms`` in one driver job; absent
        terms memoize as None (the single- and batch-query paths must
        share this contract — see lookup_terms / search_many)."""
        uncached = [t for t in terms if t not in self._df_cache]
        if not uncached:
            return
        rows = (
            self.term_stats.filter(F.col("term").isin(uncached))
            .select("term", "df")
            .collect()
        )
        hit = {r["term"]: int(r["df"]) for r in rows}
        for t in uncached:
            self._df_cache[t] = hit.get(t)

    def _idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------------
    # Block skipping (the distributed analog of WAND pointer advance,
    # SURVEY.md §7.3): under conjunctive semantics every match must fall in
    # a doc_id range covered by the RAREST term's blocks. Collect those
    # ranges (few — df-ascending order O1 makes term 0 the rarest), merge
    # them, and (a) push an OR-of-ranges filter into the parquet scan so
    # row-group min/max stats skip hot-term blocks entirely, (b) mask
    # decoded doc_ids to the ranges so pruned docs never enter the shuffle.
    PRUNE_MAX_RARE_BLOCKS = 4096   # skip pruning when the rarest term is hot
    PRUNE_MAX_FILTER_RANGES = 64   # OR-chain size Catalyst handles happily
    # Interactive plan routing: a plain search_ids runs the packed
    # search_many plan only when the query's summed df (= decoded
    # postings volume) clears this floor; below it the classic pivot
    # plan's lower fixed cost wins. Measured crossover ~1M postings at
    # local[8] on 717k- and 2.87M-doc corpora (BENCH.md).
    BATCH_PLAN_MIN_POSTINGS = 1_000_000

    @staticmethod
    def _merge_spans(
        spans: list[tuple[int, int]]
    ) -> list[tuple[int, int]]:
        spans = sorted(spans)
        merged = [spans[0]]
        for lo, hi in spans[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    def _rare_term_ranges(self, rare: TermInfo) -> list[tuple[int, int]] | None:
        if rare.term in self._ranges_cache:
            return self._ranges_cache[rare.term]
        from ..functions.spark_hash import spark_bucket

        # bucket partition filter first (like candidate_scores /
        # _collect_ranges_bulk) so this cold-path metadata collect lists
        # ONE bucket dir, not all N
        rows = (
            self.postings.filter(
                (F.col("bucket") == spark_bucket(rare.term, self.n_buckets))
                & (F.col("term") == rare.term)
            )
            .select("first_doc_id", "last_doc_id")
            .limit(self.PRUNE_MAX_RARE_BLOCKS + 1)
            .collect()
        )
        if not rows or len(rows) > self.PRUNE_MAX_RARE_BLOCKS:
            self._ranges_cache[rare.term] = None
            return None
        merged = self._merge_spans(
            [(int(r["first_doc_id"]), int(r["last_doc_id"])) for r in rows]
        )
        self._ranges_cache[rare.term] = merged
        return merged

    def _collect_ranges_bulk(self, terms: list[str]) -> None:
        """Fill _ranges_cache for MANY rarest terms in two driver jobs
        total (a per-term count, then one ranges fetch for the terms under
        the block cap) — the batch analog of _rare_term_ranges, so a
        whole search_many workload pays O(1) collects instead of one per
        query. Hot terms (> PRUNE_MAX_RARE_BLOCKS blocks) memoize as None
        (no pruning), exactly like the single-query path."""
        from ..functions.spark_hash import spark_bucket

        buckets = sorted({spark_bucket(t, self.n_buckets) for t in terms})
        scoped = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        n_by_term = {
            r["term"]: int(r["n"])
            for r in scoped.groupBy("term")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for t in terms:  # default: hot (or absent) -> no pruning
            self._ranges_cache[t] = None
        small = [
            t
            for t in terms
            if 0 < n_by_term.get(t, 0) <= self.PRUNE_MAX_RARE_BLOCKS
        ]
        if not small:
            return
        spans: dict[str, list[tuple[int, int]]] = {}
        for r in (
            scoped.filter(F.col("term").isin(small))
            .select("term", "first_doc_id", "last_doc_id")
            .collect()
        ):
            spans.setdefault(r["term"], []).append(
                (int(r["first_doc_id"]), int(r["last_doc_id"]))
            )
        for t, sp in spans.items():
            self._ranges_cache[t] = self._merge_spans(sp)

    # a scope's run count is structurally <= 1 + #incremental batches
    # (see _scope_ranges); blowing past this cap means the doc_id-order
    # invariant broke — stay loud rather than collect unbounded rows
    SCOPE_MAX_RANGES = 4096

    @staticmethod
    def _intersect_spans(
        a: list[tuple[int, int]], b: list[tuple[int, int]]
    ) -> list[tuple[int, int]]:
        """Intersect two sorted, merged interval lists (two-pointer)."""
        out: list[tuple[int, int]] = []
        i = j = 0
        while i < len(a) and j < len(b):
            lo = max(a[i][0], b[j][0])
            hi = min(a[i][1], b[j][1])
            if lo <= hi:
                out.append((lo, hi))
            if a[i][1] < b[j][1]:
                i += 1
            else:
                j += 1
        return out

    def _scope_ranges(self, scope: str) -> list[tuple[int, int]] | None:
        """P4 site-scope → doc_id ranges (SearchServiceImpl.java:105-114).
        doc_ids are dense in (conv_id, turn_idx) order WITHIN each build
        batch (fresh build = one batch; every incremental_update appends
        its own contiguously-numbered batch, compaction restores a single
        batch), so a conv_id PREFIX owns one contiguous doc_id run PER
        BATCH — not one global interval: after an incremental append, a
        naive [min, max] envelope would span every unrelated document
        between the base run and the appended run and scoped search would
        silently return out-of-scope hits. The exact maximal runs are
        recovered distributed-side with two anti-joins (a doc_id STARTS a
        run iff doc_id-1 is not in scope, ENDS one iff doc_id+1 is not),
        so only the ≤ 2·n_batches boundary rows reach the driver; the
        scan still prunes on row-group min/max over first/last_doc_id.
        Returns None when no document matches the scope. Memoized like
        the dictionary rows (immutable snapshot view)."""
        key = f"\x00scope:{scope}"
        if key in self._ranges_cache:
            return self._ranges_cache[key]
        ids = self.documents.filter(
            F.col("conv_id").startswith(scope)
        ).select("doc_id")
        starts = ids.join(
            ids.select((F.col("doc_id") + F.lit(1)).alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        ends = ids.join(
            ids.select((F.col("doc_id") - F.lit(1)).alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        cap = self.SCOPE_MAX_RANGES
        # ONE driver job for both boundary sets (the read path is
        # latency-bound; two sequential collects would double the cold
        # scope-lookup cost). In any doc_id-ordered prefix #starts >=
        # #ends, so a truncated collect of 2*(cap+1) rows always shows
        # > cap starts when the cap is exceeded.
        rows = (
            starts.select("doc_id", F.lit(1).alias("is_start"))
            .unionByName(ends.select("doc_id", F.lit(0).alias("is_start")))
            .orderBy("doc_id", F.desc("is_start"))
            .limit(2 * (cap + 1))
            .collect()
        )
        lo_ids = [int(r["doc_id"]) for r in rows if r["is_start"]]
        hi_ids = [int(r["doc_id"]) for r in rows if not r["is_start"]]
        if len(lo_ids) > cap:
            raise RuntimeError(
                f"scope '{scope}' spans more than {cap} doc_id runs — "
                "the per-batch contiguity invariant is broken (or the "
                "index has seen thousands of incremental batches); run "
                "compact_index to restore a single dense ordering"
            )
        runs = list(zip(lo_ids, hi_ids))
        result = self._merge_spans(runs) if runs else None
        self._ranges_cache[key] = result
        return result


    def _push_ranges(self, blocks: DataFrame,
                     ranges: list[tuple[int, int]] | None) -> DataFrame:
        """Shared doc_id-range row-group pushdown for the posting-block
        scans (candidate_scores + matching_doc_ids): an OR-of-ranges
        filter when the run list is small enough for Catalyst, else a
        LOUD warning — the decode-side numpy mask keeps results exact
        either way, but every block of every term gets scanned."""
        if ranges and len(ranges) <= self.PRUNE_MAX_FILTER_RANGES:
            overlap = None
            for lo, hi in ranges:
                c = (F.col("first_doc_id") <= hi) & (
                    F.col("last_doc_id") >= lo
                )
                overlap = c if overlap is None else (overlap | c)
            return blocks.filter(overlap)
        if ranges:
            # no silent caps: the post-decode numpy mask keeps results
            # exact, but every block of every term will now be scanned
            warnings.warn(
                f"{len(ranges)} doc_id ranges exceed "
                f"PRUNE_MAX_FILTER_RANGES={self.PRUNE_MAX_FILTER_RANGES}; "
                "row-group pushdown dropped (results stay exact via the "
                "decode-side mask). Many incremental batches? "
                "compact_index restores dense ordering.",
                stacklevel=3,
            )
        return blocks

    def candidate_scores(
        self,
        infos: list[TermInfo],
        mode: str = "bm25",
        conjunctive: bool = True,
        scope_ranges: list[tuple[int, int]] | None = None,
        blocks_df: DataFrame | None = None,
    ) -> DataFrame:
        """Decode matching posting blocks -> (doc_id, order, s) partial
        scores. Partition-pruned by bucket, row-group pruned by term,
        (conjunctive) by rarest-term doc_id ranges, and (scoped) by the
        scope's doc_id run list. Scoring statistics stay GLOBAL under a
        scope (idf/avgdl of the whole corpus — the scope excludes
        candidates, it does not define a sub-corpus; documented deviation
        from the reference's per-site lemma frequencies, SURVEY.md §7.5)."""
        terms = [ti.term for ti in infos]
        params = {
            ti.term: (ti.order, self._idf(ti.df)) for ti in infos
        }
        n_docs, avgdl, max_tf_sum = self.n_docs, self.avgdl, self.max_tf_sum

        ranges = None
        if conjunctive and len(infos) > 1:
            ranges = self._rare_term_ranges(infos[0])
        if scope_ranges is not None:
            if ranges is None:
                ranges = scope_ranges
            else:
                # intersect rare-term ranges with the scope's run list
                # (both sorted + merged)
                ranges = self._intersect_spans(ranges, scope_ranges)
                if not ranges:
                    ranges = [(1, 0)]  # empty intersection -> no blocks

        # bucket = pmod(hash(term), n_buckets) is a directory partition
        # column — computing the query terms' buckets driver-side (pure
        # Python murmur3, no Spark job) turns the term filter into
        # PartitionFilters (whole bucket dirs skipped)
        from ..functions.spark_hash import spark_bucket

        if blocks_df is not None:
            # caller supplies a pre-filtered block set (the block-max
            # seed / threshold-kept sets of _single_term_topk)
            blocks = blocks_df
        else:
            buckets = sorted(
                {spark_bucket(t, self.n_buckets) for t in terms}
            )
            blocks = self.postings.filter(
                F.col("bucket").isin(buckets) & F.col("term").isin(terms)
            )
        blocks = self._push_ranges(blocks, ranges)
        blocks = blocks.select("term", "doc_ids", "tfs", "dls")

        lo_arr = np.array([r[0] for r in ranges], dtype=np.int64) if ranges else None
        hi_arr = np.array([r[1] for r in ranges], dtype=np.int64) if ranges else None
        # ship-once-per-executor broadcast handle (None when no deletes);
        # the kernel dereferences .value executor-side
        deleted_bc = self._deleted_bc

        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("order", T.IntegerType(), False),
                T.StructField("s", T.DoubleType(), False),
            ]
        )

        def decode_score(batches):
            # grouped decode: all of a term's blocks in the batch go
            # through ONE vectorized codec pass (VByte buffers
            # concatenate; codec.decode_postings_grouped) instead of a
            # per-block Python loop
            from ..functions.codec import (
                decode_postings_grouped,
                varbyte_decode_groups,
            )

            deleted = deleted_bc.value if deleted_bc is not None else None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                outs = []
                ids_col = pdf["doc_ids"].to_numpy()
                tfs_col = pdf["tfs"].to_numpy()
                dls_col = pdf["dls"].to_numpy()
                for term, rows in pdf.groupby(
                    "term", sort=False
                ).indices.items():
                    order, idf = params[term]
                    ids, tfs, _ = decode_postings_grouped(
                        list(ids_col[rows]), list(tfs_col[rows])
                    )
                    if mode == "bm25":
                        dls, _ = varbyte_decode_groups(list(dls_col[rows]))
                        dls = dls.astype(np.float64)
                    if lo_arr is not None:
                        # mask to rarest-term ranges (lossless under
                        # conjunction) so pruned docs never hit the shuffle
                        pos = np.searchsorted(lo_arr, ids, side="right") - 1
                        keep = (pos >= 0) & (ids <= hi_arr[np.clip(pos, 0, None)])
                        if not keep.all():
                            ids, tfs = ids[keep], tfs[keep]
                            if mode == "bm25":
                                dls = dls[keep]
                    if deleted is not None and ids.size:
                        # delete-vector mask: replaced docs never score
                        keep = ~np.isin(ids, deleted)
                        if not keep.all():
                            ids, tfs = ids[keep], tfs[keep]
                            if mode == "bm25":
                                dls = dls[keep]
                    if ids.size == 0:
                        continue
                    if mode == "bm25":
                        denom = tfs + K1 * (1 - B + B * dls / avgdl)
                        s = idf * (tfs * (K1 + 1)) / denom
                    else:  # relevance_ref (IndexRepository.java:14-20)
                        s = tfs / max_tf_sum
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_id": ids,
                                "order": np.int32(order),
                                "s": s,
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return blocks.mapInPandas(decode_score, schema=out_schema)

    # ------------------------------------------------------------------
    def search_ids(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        mode: str = "bm25",
        max_df: int | None = None,
        conjunctive: bool = True,
        scope: str | None = None,
        role: str | None = None,
        use_batch_plan: bool | None = None,
        use_blockmax: bool | None = None,
        use_maxscore: bool | None = None,
    ) -> DataFrame:
        """Top-k (doc_id, score) — the rank-identity contract surface.
        ``scope`` restricts results to conversations whose conv_id starts
        with it (the reference's site-scoped search,
        SearchServiceImpl.java:105-114) via doc_id-range pushdown.
        ``role`` restricts results to turns whose doc-store role matches
        (transcript-shaped: 'search only what the user said') — one
        semi-join against the delete-masked doc store's (doc_id, role)
        projection BEFORE the top-k cut; rides the classic plan, scoring
        stats stay global like scope.

        Plan selection: by default (``use_batch_plan=None``) a plain
        query — no offset/scope/max_df — is routed by COST: the query
        terms' summed df (the exact decoded-postings volume, already
        memoized by the dictionary lookup) picks between the classic
        row-partials pivot (lower fixed cost — wins small volumes) and
        the packed varbyte exchange + dense-numpy scoring plan (flat
        until large volumes — 4.1 s -> 1.5 s on a 7.5M-posting query
        over a 2.8M-doc index at local[8]). Measured crossover ~1M
        postings on both the 717k- and 2.87M-doc corpora (BENCH.md
        "interactive plan routing"); both plans are bit-identical by
        contract (enforced by tests/test_query.py both ways). Pass
        ``use_batch_plan=False`` to force the classic plan (the
        regression tests compare the two), or True to assert batch
        eligibility. Hot SINGLE-term queries (df >=
        BLOCKMAX_MIN_POSTINGS) route to the two-pass block-max plan
        instead (``use_blockmax`` forces it on/off); hot MULTI-term
        DISJUNCTIVE queries (summed df over the threshold) route to the
        two-pass MaxScore bound-sum plan (``use_maxscore`` forces it —
        see _maxscore_topk). All plans are bit-identical by contract."""
        self._check_mode(mode)

        def empty() -> DataFrame:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )

        # block-max routing: only from the fully-default state (both
        # plan flags None) or when explicitly forced — an explicit
        # use_batch_plan True/False pins that plan for regression tests
        if use_blockmax is None:
            use_blockmax = False
            if (use_batch_plan is None and offset == 0 and scope is None
                    and max_df is None and role is None):
                infos, n_missing = self.lookup_terms(query)
                if len(infos) == 1 and not (conjunctive and n_missing):
                    use_blockmax = (
                        infos[0].df >= self.BLOCKMAX_MIN_POSTINGS
                    )
        if use_blockmax:
            if (offset != 0 or scope is not None or max_df is not None
                    or role is not None):
                raise ValueError(
                    "use_blockmax=True requires offset=0, scope=None, "
                    "role=None, max_df=None (those features ride the "
                    "classic plan)"
                )
            infos, n_missing = self.lookup_terms(query)
            if conjunctive and n_missing:
                return empty()
            if len(infos) != 1:
                raise ValueError(
                    "use_blockmax=True requires a single-term query; got "
                    f"{len(infos)} dictionary terms"
                )
            return self._single_term_topk(infos[0], k, mode)
        # MaxScore routing: the disjunctive analog of the single-term
        # block-max plan — only from the fully-default state or when
        # explicitly forced
        maxscore_auto = False
        if use_maxscore is None:
            use_maxscore = False
            if (not conjunctive and use_batch_plan is None and offset == 0
                    and scope is None and max_df is None and role is None):
                infos, _ = self.lookup_terms(query)
                if len(infos) > 1:
                    use_maxscore = (
                        sum(ti.df for ti in infos)
                        >= self.BLOCKMAX_MIN_POSTINGS
                    )
                    # auto-routed: the plan may still bail back to classic
                    # after the cheap grid pass if the corpus's bound
                    # distribution is too flat to prune (explicit
                    # use_maxscore=True runs the full plan regardless)
                    maxscore_auto = use_maxscore
        if use_maxscore:
            if (offset != 0 or scope is not None or max_df is not None
                    or role is not None):
                raise ValueError(
                    "use_maxscore=True requires offset=0, scope=None, "
                    "role=None, max_df=None (those features ride the "
                    "classic plan)"
                )
            if conjunctive:
                raise ValueError(
                    "use_maxscore=True requires conjunctive=False — "
                    "conjunctive queries already prune via rarest-term "
                    "doc_id ranges"
                )
            infos, _ = self.lookup_terms(query)
            if not infos:
                return empty()
            return self._maxscore_topk(
                infos, k, mode, allow_bailout=maxscore_auto
            )
        if use_batch_plan is None:
            use_batch_plan = False
            if (offset == 0 and scope is None and max_df is None
                    and role is None):
                infos, n_missing = self.lookup_terms(query)
                if infos and not (conjunctive and n_missing):
                    use_batch_plan = (
                        sum(ti.df for ti in infos)
                        >= self.BATCH_PLAN_MIN_POSTINGS
                    )
        if use_batch_plan:
            if (offset != 0 or scope is not None or max_df is not None
                    or role is not None):
                raise ValueError(
                    "use_batch_plan=True requires offset=0, scope=None, "
                    "role=None, max_df=None (those features ride the "
                    "classic plan)"
                )
            return (
                self.search_many(
                    {"_q": query}, k=k, mode=mode, conjunctive=conjunctive
                )
                .select("doc_id", "score")
                .orderBy(F.desc("score"), F.asc("doc_id"))
            )
        infos, n_missing = self.lookup_terms(query, max_df=max_df)
        if conjunctive and n_missing:
            # a query term absent from the dictionary -> no doc matches ALL
            # (reference error contract, SearchServiceImpl.java:60-62);
            # df-pruned terms (P3) do NOT trigger this — they are merely
            # excluded from scoring, matching the reference's pickNonFrequent
            return empty()
        if not infos:
            return empty()
        scope_ranges = None
        if scope is not None:
            scope_ranges = self._scope_ranges(scope)
            if scope_ranges is None:  # scope matches no documents
                return empty()

        return self._classic_topk(
            infos, k=k, offset=offset, mode=mode,
            conjunctive=conjunctive, scope_ranges=scope_ranges,
            role=role,
        )

    def _classic_topk(
        self,
        infos: list[TermInfo],
        k: int,
        offset: int = 0,
        mode: str = "bm25",
        conjunctive: bool = True,
        scope_ranges: list[tuple[int, int]] | None = None,
        role: str | None = None,
    ) -> DataFrame:
        """The classic pivot plan over an already-resolved term list —
        shared by ``search_ids`` and ``search_prefix``. ``role``
        semi-joins the scored set against the doc store's matching
        (doc_id, role) rows BEFORE the limit (a filtered-out doc must
        not occupy a result slot)."""
        partials = self.candidate_scores(
            infos, mode=mode, conjunctive=conjunctive,
            scope_ranges=scope_ranges,
        )
        scored = self._pivot_combine(partials, len(infos), conjunctive)
        if role is not None:
            keep = self.documents.filter(
                F.col("role") == role
            ).select("doc_id")
            scored = scored.join(keep, "doc_id", "left_semi")
        topk = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(offset + k)
        )
        if offset:
            # distributed offset: row_number over the already-limited
            # top-(offset+k) rows (TakeOrderedAndProject), then slice.
            # The single-partition window touches at most offset+k rows —
            # bounded — and the plan stays fused end-to-end (no
            # collect/createDataFrame round-trip through the driver).
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            return (
                topk.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") > offset)
                .drop("_rn")
            )
        return topk

    def _pivot_combine(
        self, partials: DataFrame, n: int, conjunctive: bool
    ) -> DataFrame:
        """(doc_id, order, s) partials -> (doc_id, score): pivot to one
        column per term (values are single partial scores, so the
        pivot-sum is exact), then combine left-to-right in df-ascending
        order — fixed float accumulation order, bit-identical to the
        single-node oracle. Shared by the classic plan and the MaxScore
        seed pass (the seed's tau must be a score the final plan could
        emit, or the prune threshold would drift by an ulp)."""
        pivoted = (
            partials.groupBy("doc_id")
            .pivot("order", list(range(n)))
            .agg(F.first("s"))
        )
        score = F.lit(0.0)
        for o in range(n):
            score = score + F.coalesce(F.col(f"`{o}`"), F.lit(0.0))
        scored = pivoted.withColumn("score", score)
        if conjunctive and n > 1:
            present = None
            for o in range(n):
                c = F.col(f"`{o}`").isNotNull()
                present = c if present is None else (present & c)
            scored = scored.filter(present)
        return scored.select("doc_id", "score")

    # ------------------------------------------------------------------
    # Single-term block-max pruning (SURVEY.md §7.3, the true block-max
    # half of "block-max WAND"): engage only when decoding the whole
    # posting list is expensive enough to buy back the extra seed job
    BLOCKMAX_MIN_POSTINGS = 100_000

    def _stored_blockmax_valid(self) -> bool:
        """True iff the stored per-block ``block_max_score`` column is
        provably consistent with CURRENT corpus stats: every part's
        manifest row carries the stats_epoch its encoder read, and all
        of them match the epoch stamped on corpus_stats. Any stats
        rewrite (incremental merge) bumps the corpus epoch without
        touching old parts' stamps, so this flips false until a
        compaction re-encodes every part under the new stats. Memoized
        (snapshot-view engine)."""
        if self._stored_bmx_valid is None:
            valid = False
            if self._stats_epoch is not None:
                from .index_build import _read_manifest

                parts = [
                    r
                    for name, r in _read_manifest(self.index_dir).items()
                    if name.startswith("part_")
                ]
                valid = bool(parts) and all(
                    r.get("stats_epoch") is not None
                    and int(r["stats_epoch"]) == self._stats_epoch
                    for r in parts
                )
            self._stored_bmx_valid = valid
        return self._stored_bmx_valid

    def _block_bound_col(self, info: TermInfo, mode: str) -> F.Column:
        """Per-block score UPPER BOUND as a Catalyst expression over the
        block row, from ``max_tf`` and the CURRENT corpus stats — never
        the stored ``block_max_score``, which is frozen at encode time
        and goes stale when incremental updates shift n_docs/avgdl
        (idf can then rise above the stored bound and pruning with it
        would silently drop true hits). The BM25 partial is increasing
        in tf and decreasing in dl, so f(max_tf, dl_eff) with
        dl_eff = max(min_dl, max_tf) upper-bounds every score in the
        block: docs with dl >= dl_eff are dominated directly, and a doc
        shorter than max_tf has tf <= dl < max_tf, so its score
        f(tf, dl) <= g(dl) <= g(max_tf) <= f(max_tf, dl_eff), where
        g(t) = f(t, t) is increasing. The arithmetic mirrors
        decode_score's numpy literally — when the block's best doc
        has (tf, dl) == (max_tf, dl_eff) the bound equals its score
        bit-for-bit, so the ``bound >= tau`` keep-test is tie-safe.
        Indexes encoded before the min_dl column exist fall back to
        dl_eff = max_tf (sound, looser)."""
        mt = F.col("max_tf").cast("double")
        if mode == "bm25":
            if self._stored_blockmax_valid():
                # exact per-block maximum, computed at encode with the
                # SAME expression shape as decode_score — far tighter
                # than any metadata bound (measured 5432 -> 206 blocks
                # on a 693k-df term, PERF.md)
                return F.col("block_max_score")
            dl_eff = (
                F.greatest(F.col("min_dl"), F.col("max_tf")).cast("double")
                if "min_dl" in self.postings.columns
                else mt
            )
            idf = self._idf(info.df)
            denom = mt + F.lit(K1) * (
                F.lit(1 - B) + F.lit(B) * dl_eff / F.lit(self.avgdl)
            )
            return (F.lit(idf) * (mt * F.lit(K1 + 1))) / denom
        return mt / F.lit(self.max_tf_sum)

    def _single_term_topk(self, info: TermInfo, k: int, mode: str) -> DataFrame:
        """Two-pass EXACT block-max top-k for a single-term query:

        1. seed: decode only the k blocks with the highest score bound
           (TakeOrderedAndProject over block metadata — no full decode)
           and collect their top-k -> provisional kth score ``tau``.
           Since the final top-k is over a superset of the seed docs,
           the true kth best score is >= tau.
        2. keep exactly the blocks whose bound >= tau; every doc in a
           dropped block scores <= bound < tau <= true-kth — strictly
           below, so it cannot enter the top-k even via the doc_id
           tie-break. The kept set necessarily contains every seed
           block (a block's bound >= its docs' scores >= tau for the
           block holding the tau doc). Decoding the kept set therefore
           yields the identical top-k, bit-for-bit.

        The win on a hot term (df ~ n_docs): the Arrow/numpy decode —
        the expensive half of the read path — runs over the few blocks
        whose max_tf competes, instead of df/block_size blocks; the
        bound filter itself is a cheap JVM predicate on block metadata
        rows."""
        from ..functions.spark_hash import spark_bucket

        if k <= 0:  # degenerate-but-valid; the classic plan returns empty
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        term_blocks = self.postings.filter(
            (F.col("bucket") == spark_bucket(info.term, self.n_buckets))
            & (F.col("term") == info.term)
        )
        bound = self._block_bound_col(info, mode)
        seed = (
            term_blocks.withColumn("_bms", bound)
            .orderBy(F.desc("_bms"), F.asc("first_doc_id"))
            .limit(k)
            .drop("_bms")
        )
        seed_rows = (
            self.candidate_scores(
                [info], mode=mode, conjunctive=False, blocks_df=seed
            )
            .orderBy(F.desc("s"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_rows) < k:
            kept = term_blocks  # fewer than k seed docs: no sound bound
        else:
            tau = float(seed_rows[-1]["s"])
            kept = term_blocks.filter(bound >= F.lit(tau))
        partials = self.candidate_scores(
            [info], mode=mode, conjunctive=False, blocks_df=kept
        )
        # single term: the partial IS the score (the classic pivot's
        # 0.0 + s chain is an IEEE no-op on the positive partial)
        return (
            partials.select("doc_id", F.col("s").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # ------------------------------------------------------------------
    # Multi-term block-max pruning (MaxScore / BMW's block-skip half in
    # batch form — SURVEY.md §7.3 "block-max WAND"; reference anchor: the
    # rarest-first candidate loop SearchServiceImpl.java:160-166,
    # generalized to disjunctive semantics the reference never had).
    MAXSCORE_GRID = 4096  # coarse doc_id buckets for the bound-sum sweep
    # auto-routed MaxScore bails back to classic when the p50 bucket
    # ceiling is within this fraction of the max (flat bound distribution
    # = nothing for any tau to prune; see _maxscore_topk)
    MAXSCORE_BAILOUT_P50 = 0.8

    def _bound_col_multi(self, infos: list[TermInfo], mode: str) -> F.Column:
        """Per-block score upper bound usable on a MULTI-term block frame
        — `_block_bound_col` with the per-term idf supplied via a literal
        term->idf map expression (|q| entries). Same soundness proof as
        the single-term bound; the stored `block_max_score` (exact, idf
        baked in at encode) is preferred whenever the stats-epoch
        handshake validates it."""
        mt = F.col("max_tf").cast("double")
        if mode == "bm25":
            if self._stored_blockmax_valid():
                return F.col("block_max_score")
            dl_eff = (
                F.greatest(F.col("min_dl"), F.col("max_tf")).cast("double")
                if "min_dl" in self.postings.columns
                else mt
            )
            idf_map = F.create_map(
                *[
                    lit
                    for ti in infos
                    for lit in (F.lit(ti.term), F.lit(self._idf(ti.df)))
                ]
            )
            denom = mt + F.lit(K1) * (
                F.lit(1 - B) + F.lit(B) * dl_eff / F.lit(self.avgdl)
            )
            return (idf_map[F.col("term")] * (mt * F.lit(K1 + 1))) / denom
        return mt / F.lit(self.max_tf_sum)

    def _maxscore_topk(
        self, infos: list[TermInfo], k: int, mode: str,
        allow_bailout: bool = False,
    ) -> DataFrame:
        """Two-pass EXACT block-max pruning for a multi-term DISJUNCTIVE
        query — the case rarest-term range pruning cannot touch (it is
        only lossless under conjunction) and where a hot OR query
        otherwise decodes every subscribed block.

        1. bound grid (one small distributed agg): every query-term block's
           score upper bound is folded into a coarse doc_id grid of
           MAXSCORE_GRID buckets — max bound per (term, bucket), a block
           contributing to every bucket it overlaps. Collecting the grid
           is O(|q| * GRID) rows regardless of df, so the driver never
           sees per-block metadata of a hot term (at 10^12 docs a hot
           term's block LIST is itself too big to collect — the grid is
           the scale-safe summary).
        2. seed (one bounded decode): the k best-bounded blocks PER TERM
           (WindowGroupLimit over block metadata) are decoded and combined
           through the SAME pivot/fixed-order accumulation as the classic
           plan; the provisional kth score tau under-estimates each seed
           doc's true score (other terms' undecoded blocks can only add),
           so tau <= the true kth score.
        3. sweep (driver-side numpy over the grid): a bucket's score
           ceiling is sum over terms of its max bound — any doc in the
           bucket scores <= that sum. Buckets with ceiling < tau are
           dropped WHOLE (every term's postings for those doc_ids), so a
           surviving doc keeps ALL its term contributions and its final
           score is bit-identical to the classic plan; a dropped doc
           scores <= ceiling < tau <= true-kth, strictly below, so it
           cannot enter the top-k even via the doc_id tie-break. Every
           true top-k doc's bucket necessarily survives (its ceiling >=
           its score >= true-kth >= tau).
        4. the kept buckets merge into doc_id spans (coarsened to
           PRUNE_MAX_FILTER_RANGES by bridging the smallest gaps — a
           superset, always sound) and the classic plan runs with them as
           scope_ranges: row-group min/max skips non-competitive blocks
           at the SCAN, the decode-side mask drops stragglers.

        Records {tau, buckets_total, buckets_kept, n_spans} in
        ``last_maxscore_stats`` for plan audits."""
        from ..functions.spark_hash import spark_bucket

        if k <= 0:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        terms = [ti.term for ti in infos]
        buckets = sorted({spark_bucket(t, self.n_buckets) for t in terms})
        blocks = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        bound = self._bound_col_multi(infos, mode)

        # -- pass 1a: per-(term, grid-bucket) max bound ------------------
        grid_n = self.MAXSCORE_GRID
        width = max(1, -(-(self.id_space + 1) // grid_n))  # ceil div
        g_first = (F.col("first_doc_id") / F.lit(width)).cast("long")
        g_last = (F.col("last_doc_id") / F.lit(width)).cast("long")
        grid_rows = (
            blocks.withColumn("_bms", bound)
            .select(
                "term",
                F.explode(F.sequence(g_first, g_last)).alias("g"),
                "_bms",
            )
            .groupBy("term", "g")
            .agg(F.max("_bms").alias("bmax"))
            .collect()
        )
        if not grid_rows:  # no postings for any query term
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )

        # fold the grid BEFORE the seed decode: the bail-out below must
        # only cost the cheap grid agg, never pass 1b's bounded decode
        ub = np.zeros(grid_n + 1, dtype=np.float64)  # +1: last block may
        for r in grid_rows:  # round last_doc_id into a final part bucket
            g = int(r["g"])
            if 0 <= g <= grid_n:
                ub[g] += float(r["bmax"])
        nz = ub[ub > 0.0]

        # -- adaptive bail-out (auto-routed queries only) -----------------
        # tau can never exceed the global ceiling, so when the bucket
        # ceilings are nearly uniform (p50 within MAXSCORE_BAILOUT_P50 of
        # the max — e.g. a synthetic corpus with near-identical BM25 score
        # ranges everywhere) no achievable tau prunes a meaningful
        # fraction, and the full plan would pay the seed decode + sweep
        # for nothing (measured 3x classic latency on a flat 1.4M-doc
        # corpus). Real Zipf-headed corpora sit far below the threshold.
        # Bailing to the classic plan is always sound — it IS the exact
        # plan; this only skips a pointless pruning attempt.
        if allow_bailout and nz.size > 1:
            p50 = float(np.percentile(nz, 50))
            if p50 >= self.MAXSCORE_BAILOUT_P50 * float(nz.max()):
                self.last_maxscore_stats = {
                    "bailout": True,
                    "p50_over_max": round(p50 / float(nz.max()), 4),
                    "buckets_total": int(nz.size),
                }
                return self._classic_topk(
                    infos, k=k, mode=mode, conjunctive=False
                )

        # -- pass 1b: seed tau from the k best-bounded blocks per term --
        w = Window.partitionBy("term").orderBy(
            F.desc("_bms"), F.asc("first_doc_id")
        )
        seed_blocks = (
            blocks.withColumn("_bms", bound)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_bms")
        )
        seed_partials = self.candidate_scores(
            infos, mode=mode, conjunctive=False, blocks_df=seed_blocks
        )
        seed_rows = (
            self._pivot_combine(seed_partials, len(infos), False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_rows) < k:
            # fewer than k candidate docs exist in the seed superset: no
            # sound threshold — decode everything (classic disjunctive)
            self.last_maxscore_stats = None
            return self._classic_topk(infos, k=k, mode=mode, conjunctive=False)
        tau = float(seed_rows[-1]["score"])

        # -- pass 2: driver-side bound-sum sweep over the grid ------------
        kept = np.flatnonzero(ub >= tau)
        self.last_maxscore_stats = {
            "tau": tau,
            "buckets_total": int((ub > 0.0).sum()),
            "buckets_kept": int(kept.size),
        }
        if kept.size == 0:
            # cannot happen with a sound bound (the tau doc's own bucket
            # clears it) — fail safe, not fast
            return self._classic_topk(infos, k=k, mode=mode, conjunctive=False)
        spans = self._merge_spans(
            [(int(g) * width, int(g) * width + width - 1) for g in kept]
        )
        if len(spans) > self.PRUNE_MAX_FILTER_RANGES:
            spans = self._coarsen_spans(spans, self.PRUNE_MAX_FILTER_RANGES)
        self.last_maxscore_stats["n_spans"] = len(spans)
        return self._classic_topk(
            infos, k=k, mode=mode, conjunctive=False, scope_ranges=spans
        )

    @staticmethod
    def _coarsen_spans(
        spans: list[tuple[int, int]], cap: int
    ) -> list[tuple[int, int]]:
        """Reduce a sorted merged span list to <= cap spans by bridging
        the SMALLEST inter-span gaps (keeping a superset is always sound
        for pruning; the scan filter just skips a little less)."""
        if len(spans) <= cap:
            return spans
        gaps = np.array(
            [spans[i + 1][0] - spans[i][1] for i in range(len(spans) - 1)]
        )
        # keep the (cap - 1) largest gaps as separators; bridge the rest
        sep = set(np.argsort(gaps)[-(cap - 1):].tolist()) if cap > 1 else set()
        out: list[tuple[int, int]] = []
        cur_lo, cur_hi = spans[0]
        for i in range(1, len(spans)):
            if (i - 1) in sep:
                out.append((cur_lo, cur_hi))
                cur_lo, cur_hi = spans[i]
            else:
                cur_hi = spans[i][1]
        out.append((cur_lo, cur_hi))
        return out

    # ------------------------------------------------------------------
    PREFIX_MAX_EXPANSIONS = 64

    def search_prefix(
        self,
        prefix: str,
        k: int = 10,
        mode: str = "bm25",
        max_expansions: int | None = None,
    ) -> DataFrame:
        """Prefix query: expand ``prefix`` against the dictionary
        (term_stats, the J3 lookup surface) to every term starting with
        it, then score DISJUNCTIVELY over the expansion set with the same
        df-ascending fixed-order accumulation as ``search_ids`` — so
        ``search_prefix("sp")`` ranks exactly like a disjunctive search
        for every dictionary term in ['sp', 'spz'). Beyond the reference
        (its query path is exact-lemma only) but a standard fulltext
        surface (Lucene PrefixQuery).

        The expansion collect is bounded: more than ``max_expansions``
        matching dictionary terms raises loudly (no silent caps — a
        1-char prefix over a 100 TB vocabulary is a user error, and
        silently scoring a truncated expansion set would change ranking;
        Lucene throws TooManyClauses for the same reason)."""
        self._check_mode(mode)
        if not prefix:
            raise ValueError("prefix must be non-empty")
        return self._expand_terms_topk(
            F.col("term").startswith(prefix), f"prefix '{prefix}'",
            k=k, mode=mode, max_expansions=max_expansions,
        )

    # ------------------------------------------------------------------
    def search_suffix(
        self,
        suffix: str,
        k: int = 10,
        mode: str = "bm25",
        max_expansions: int | None = None,
    ) -> DataFrame:
        """Leading-wildcard query (`*ing`): expand ``suffix`` against the
        dictionary to every term ENDING with it, then score disjunctively
        with the same fixed-order accumulation — the suffix twin of
        ``search_prefix`` (Lucene WildcardQuery's leading-* case), same
        loud expansion cap.

        Plan note: unlike a prefix (which dictionary sort order could
        serve), a suffix match is a full vocab-sized dictionary scan —
        the same cost class as ``suggest``'s scan path, fine at any
        corpus scale because the vocabulary grows ~sublinearly. The
        classic index-side fix (a reversed-term dictionary column
        turning suffix into prefix) is the documented next step if the
        vocabulary ever warranted it."""
        self._check_mode(mode)
        if not suffix:
            raise ValueError("suffix must be non-empty")
        return self._expand_terms_topk(
            F.col("term").endswith(suffix), f"suffix '{suffix}'",
            k=k, mode=mode, max_expansions=max_expansions,
        )

    def _expand_terms_topk(
        self, pred, desc: str, k: int, mode: str,
        max_expansions: int | None,
    ) -> DataFrame:
        """Shared dictionary-expansion tail for prefix/suffix queries:
        bounded expansion collect (loudly refusing past the cap — a
        silently truncated expansion set would change ranking, Lucene's
        TooManyClauses contract), df-asc ordered TermInfos, disjunctive
        classic plan."""
        cap = (
            self.PREFIX_MAX_EXPANSIONS
            if max_expansions is None
            else int(max_expansions)
        )
        rows = (
            self.term_stats.filter(pred)
            .select("term", "df")
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"{desc} expands to more than {cap} dictionary "
                "terms; use a longer pattern or raise max_expansions"
            )
        if not rows:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        found = {r["term"]: int(r["df"]) for r in rows}
        self._df_cache.update(found)
        infos = [
            TermInfo(t, d, 0)
            for t, d in sorted(found.items(), key=lambda kv: (kv[1], kv[0]))
        ]
        for i, ti in enumerate(infos):
            ti.order = i
        return self._classic_topk(infos, k=k, mode=mode, conjunctive=False)

    # ------------------------------------------------------------------
    def _positions_rows(
        self,
        infos: list[TermInfo],
        ranges: list[tuple[int, int]] | None,
    ) -> DataFrame:
        """(doc_id, term, positions) rows decoded from the positions
        stream of the given terms' posting blocks (store_positions=True
        builds) — bucket-pruned and range-pruned exactly like
        candidate_scores. positions are the 0-based token indexes in the
        analyzed lemma array (the phrase_count_col coordinate space)."""
        from ..functions.codec import (
            decode_positions_grouped,
            decode_postings_grouped,
        )
        from ..functions.spark_hash import spark_bucket

        terms = [ti.term for ti in infos]
        buckets = sorted({spark_bucket(t, self.n_buckets) for t in terms})
        blocks = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if ranges and len(ranges) <= self.PRUNE_MAX_FILTER_RANGES:
            overlap = None
            for lo, hi in ranges:
                c = (F.col("first_doc_id") <= hi) & (
                    F.col("last_doc_id") >= lo
                )
                overlap = c if overlap is None else (overlap | c)
            blocks = blocks.filter(overlap)
        sel = blocks.select("term", "doc_ids", "tfs", "positions")

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                ids, tfs, n = decode_postings_grouped(
                    pdf["doc_ids"].tolist(), pdf["tfs"].tolist()
                )
                pos_flat = decode_positions_grouped(
                    pdf["positions"].tolist(), tfs
                ).astype(np.int32)
                offs = np.zeros(tfs.size + 1, dtype=np.int64)
                np.cumsum(tfs, out=offs[1:])
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "term": np.repeat(pdf["term"].to_numpy(), n),
                        "positions": [
                            pos_flat[offs[i]:offs[i + 1]]
                            for i in range(tfs.size)
                        ],
                    }
                )

        return sel.mapInPandas(
            gen, schema="doc_id long, term string, positions array<int>"
        )

    # ------------------------------------------------------------------
    def _pivot_positions(
        self,
        infos: list[TermInfo],
        ranges: list[tuple[int, int]] | None,
        distinct: list[str],
    ) -> DataFrame:
        """Per-doc position arrays for the distinct lemmas: one `_p{i}`
        array column per lemma, NULL when the doc lacks it — a NULL
        pivots any exists() over it to non-true, which is exactly what
        conjunctive semantics require. Shared by the positional phrase
        and proximity plans (the match predicate is the only thing that
        differs between them)."""
        return self._positions_rows(infos, ranges).groupBy("doc_id").agg(
            *[
                F.max(
                    F.when(F.col("term") == t, F.col("positions"))
                ).alias(f"_p{i}")
                for i, t in enumerate(distinct)
            ]
        )

    def _range_pruned_docs(
        self, ranges: list[tuple[int, int]] | None
    ) -> DataFrame:
        """(doc_id, text) view pruned to the rarest-term doc_id spans —
        the scan side of the residual phrase/proximity fallback, so row
        groups that cannot hold a candidate are skipped."""
        docs = self.documents.select("doc_id", "text")
        if ranges and len(ranges) <= self.PRUNE_MAX_FILTER_RANGES:
            overlap = None
            for lo, hi in ranges:
                c = F.col("doc_id").between(lo, hi)
                overlap = c if overlap is None else (overlap | c)
            docs = docs.filter(overlap)
        return docs

    @staticmethod
    def _topk_matched(scored: DataFrame, matched: DataFrame, k: int) -> DataFrame:
        """Standard tail: restrict the conjunctive scores to the matched
        docs, (score DESC, doc_id ASC) top-k."""
        return (
            scored.join(matched, "doc_id")
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # ------------------------------------------------------------------
    def search_phrase(
        self, phrase_text: str, k: int = 10, mode: str = "bm25",
        via_positions: bool | None = None,
    ) -> DataFrame:
        """Indexed exact-phrase top-k, candidate-first (the composition
        PERF.md documents; positions-in-codec is explicitly traded away
        for ~2x smaller postings): BM25 candidates come THROUGH the
        index — the analyzed phrase's distinct lemmas run the classic
        conjunctive plan (rarest-term range pruning, pivot, fixed-order
        accumulation), uncut — and the phrase test (contiguous lemma run,
        functions/phrase.phrase_count_col) is a RESIDUAL Catalyst filter
        evaluated only around the k-bounded candidate join, never as a
        full-corpus re-analysis (the naive plan a positional-index-less
        engine falls into; phrase_match keeps that shape as the oracle
        baseline). The documents side of the join is additionally
        range-pruned to the rarest lemma's doc_id spans, so the scan
        skips row groups that cannot hold a candidate.

        Scores are the conjunctive BM25 scores of the surviving docs —
        bit-identical to search_ids on the same lemma set restricted to
        phrase matches (the filter drops rows, never touches floats).
        A phrase lemma missing from the dictionary means no document can
        contain the phrase: empty result (the search_ids contract).
        Cite: SearchServiceImpl.java:155-168 (the candidate loop this
        composes with); beyond-reference surface like search_prefix.

        On a store_positions=True index (``via_positions`` defaults to
        the index's capability) the phrase test never touches the doc
        store at all: the phrase lemmas' position streams are decoded
        from the SAME range-pruned blocks, pivoted per doc, and the
        contiguity check (exists p in pos[L0]: p+j in pos[Lj] for all j)
        runs as a JVM higher-order array expression — the true
        positional-index plan, at the documented ~storage cost."""
        from ..functions.analyzer import terms_col
        from ..functions.phrase import phrase_count_col

        self._check_mode(mode)
        if via_positions is None:
            via_positions = self.has_positions
        if via_positions and not self.has_positions:
            raise ValueError(
                "via_positions=True requires a store_positions=True index "
                "(postings have no positions column)"
            )
        lemmas = analyze_text(phrase_text)  # ordered, duplicates kept
        if not lemmas:
            raise ValueError("phrase analyzes to zero lemmas")
        distinct = sorted(set(lemmas))
        infos, n_missing = self._infos_for_terms(distinct)
        if n_missing:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        partials = self.candidate_scores(infos, mode=mode, conjunctive=True)
        scored = self._pivot_combine(partials, len(infos), conjunctive=True)
        ranges = self._rare_term_ranges(infos[0])
        if via_positions and len(lemmas) > 1:
            # indexed phrase test: decode the phrase lemmas' position
            # streams (already range-pruned to the rarest lemma's spans),
            # pivot to one array column per distinct lemma, keep docs
            # where some occurrence of lemmas[0] is followed contiguously
            # by the rest. A doc missing a lemma pivots to NULL and the
            # exists() evaluates non-true — dropped, as conjunctive
            # semantics require (scored already enforces it too).
            col_of = {t: i for i, t in enumerate(distinct)}
            pivot = self._pivot_positions(infos, ranges, distinct)

            def _contig(x):
                c = None
                for j in range(1, len(lemmas)):
                    cj = F.array_contains(
                        F.col(f"_p{col_of[lemmas[j]]}"), x + j
                    )
                    c = cj if c is None else (c & cj)
                return c

            matched = pivot.filter(
                F.exists(F.col(f"_p{col_of[lemmas[0]]}"), _contig)
            ).select("doc_id")
            return self._topk_matched(scored, matched, k)
        if via_positions:
            # single-lemma phrase: presence IS the phrase test; scored is
            # already exactly the containing docs — no positions needed
            return (
                scored.select("doc_id", "score")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
            )
        docs = self._range_pruned_docs(ranges)
        occ = phrase_count_col(terms_col(F.col("text")), tuple(lemmas))
        return self._topk_matched(
            scored, docs.filter(occ >= F.lit(1)).select("doc_id"), k
        )

    # ------------------------------------------------------------------
    def search_proximity(
        self, term_a: str, term_b: str, window: int, k: int = 10,
        mode: str = "bm25", via_positions: bool | None = None,
    ) -> DataFrame:
        """Indexed proximity top-k: docs where the two terms' lemmas
        co-occur within ``window`` tokens, scored with the conjunctive
        BM25 of the pair — the within-k twin of ``search_phrase``, and
        the indexed replacement for the full-corpus text-scan plan
        (functions/phrase.min_distance_col over re-analyzed text, kept
        as the oracle baseline). Candidates come THROUGH the index
        (rarest-term range pruning, pivot, fixed-order accumulation).

        On a store_positions=True index (``via_positions`` defaults to
        the index's capability) the within-window test never touches the
        doc store: both lemmas' position streams decode from the SAME
        range-pruned posting blocks, pivot per doc, and the test
        (exists i in pos[a], j in pos[b]: |i - j| <= window) runs as a
        JVM higher-order array expression. Without positions the test is
        a residual Catalyst filter over the range-pruned doc store, same
        as the phrase fallback. Both plans are bit-identical: the filter
        drops rows, never touches floats (tests/test_positions.py).

        A term missing from the dictionary, or both terms analyzing to
        the same lemma, can never satisfy the two-distinct-lemmas
        contract the distance is defined over — empty result / loud
        error respectively. Cite: beyond-reference surface (the
        reference stores per-doc lemma counts only,
        IndexationServiceImpl.java); VERDICT r4 "Next round #4"."""
        from ..functions.analyzer import terms_col
        from ..functions.phrase import min_distance_col

        self._check_mode(mode)
        if window < 0:
            raise ValueError("window must be >= 0")
        if via_positions is None:
            via_positions = self.has_positions
        if via_positions and not self.has_positions:
            raise ValueError(
                "via_positions=True requires a store_positions=True index "
                "(postings have no positions column)"
            )
        la = analyze_text(term_a)
        lb = analyze_text(term_b)
        if len(la) != 1 or len(lb) != 1:
            raise ValueError(
                f"each proximity term must analyze to exactly one lemma "
                f"(got {la!r} / {lb!r})"
            )
        la, lb = la[0], lb[0]
        if la == lb:
            raise ValueError(
                f"proximity terms analyze to the same lemma {la!r}"
            )
        distinct = sorted((la, lb))
        infos, n_missing = self._infos_for_terms(distinct)
        if n_missing:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        partials = self.candidate_scores(infos, mode=mode, conjunctive=True)
        scored = self._pivot_combine(partials, len(infos), conjunctive=True)
        ranges = self._rare_term_ranges(infos[0])
        if via_positions:
            # indexed within-window test over the shared pivot (a doc
            # missing a lemma pivots to NULL and the exists() evaluates
            # non-true — dropped, as conjunctive semantics require)
            pivot = self._pivot_positions(infos, ranges, distinct)
            w = F.lit(int(window))
            matched = pivot.filter(
                F.exists(
                    F.col("_p0"),
                    lambda i: F.exists(
                        F.col("_p1"), lambda j: F.abs(i - j) <= w
                    ),
                )
            ).select("doc_id")
            return self._topk_matched(scored, matched, k)
        docs = self._range_pruned_docs(ranges)
        mind = min_distance_col(terms_col(F.col("text")), la, lb)
        return self._topk_matched(
            scored, docs.filter(mind <= F.lit(int(window))).select("doc_id"), k
        )

    # ------------------------------------------------------------------
    def matching_doc_ids(
        self,
        infos: list[TermInfo],
        ranges: list[tuple[int, int]] | None = None,
    ) -> DataFrame:
        """One row per (containing doc, term) for ``infos``' terms —
        membership only, no scores, term identity not materialized.
        Decodes ONLY the doc_ids stream (the parquet scan reads the
        doc_ids binary column instead of all three, and the kernel
        skips the tfs/dls VByte passes; bucket partition pruning and
        term row-group pushdown as in candidate_scores). ``ranges``
        pushes a doc_id-range OR-filter into the scan plus a
        decode-side mask — lossless under conjunctive semantics,
        INVALID for negation (a NOT caller must see every containing
        doc, so search_not never passes ranges). The delete vector is
        subtracted like every posting reader (a replaced doc's old id
        must not act on any result). A (doc, term) pair yields exactly
        one row (salted hot-term blocks split by DISJOINT doc
        subranges, parts hold disjoint doc batches), so a per-doc row
        count equals the number of query terms the doc contains —
        match_count's conjunctive test; anti-join callers need no
        distinct, any-match callers dedup."""
        from ..functions.spark_hash import spark_bucket

        terms = [ti.term for ti in infos]
        buckets = sorted({spark_bucket(t, self.n_buckets) for t in terms})
        blocks = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        blocks = self._push_ranges(blocks, ranges)
        blocks = blocks.select("doc_ids")
        deleted_bc = self._deleted_bc
        lo_arr = (
            np.array([r[0] for r in ranges], dtype=np.int64)
            if ranges else None
        )
        hi_arr = (
            np.array([r[1] for r in ranges], dtype=np.int64)
            if ranges else None
        )
        out_schema = T.StructType(
            [T.StructField("doc_id", T.LongType(), False)]
        )

        def decode_ids(batches):
            from ..functions.codec import decode_doc_ids_grouped

            deleted = deleted_bc.value if deleted_bc is not None else None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids, _ = decode_doc_ids_grouped(list(pdf["doc_ids"]))
                if lo_arr is not None and ids.size:
                    pos = np.searchsorted(lo_arr, ids, side="right") - 1
                    keep = (pos >= 0) & (
                        ids <= hi_arr[np.clip(pos, 0, None)]
                    )
                    ids = ids[keep]
                if deleted is not None and ids.size:
                    ids = ids[~np.isin(ids, deleted)]
                if ids.size:
                    yield pd.DataFrame({"doc_id": ids})

        return blocks.mapInPandas(decode_ids, schema=out_schema)

    # ------------------------------------------------------------------
    def match_count(
        self, query: str, conjunctive: bool = True
    ) -> DataFrame:
        """TOTAL number of matching documents — the 'about N results'
        figure next to a ranked page — without computing a single
        score: the membership-only reader (ids-stream decode, 1 binary
        column read) feeds a per-doc term count (= conjunctive test)
        and a global count. Conjunctive queries keep the rarest-term
        doc_id-range pruning (lossless, as in candidate_scores).
        Returns one row (n_matches long). Cite: the reference's result
        count A7 (SearchServiceImpl.java:78-90) generalized to the
        whole match set instead of the page."""

        infos, n_missing = self.lookup_terms(query)
        if (conjunctive and n_missing) or not infos:
            return self.spark.createDataFrame(
                [(0,)], schema="n_matches long"
            )
        ranges = (
            self._rare_term_ranges(infos[0])
            if conjunctive and len(infos) > 1
            else None
        )
        pairs = self.matching_doc_ids(infos, ranges=ranges)
        if conjunctive and len(infos) > 1:
            matched = (
                pairs.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") == len(infos))
            )
        else:
            matched = pairs.select("doc_id").distinct()
        return matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_matches")
        )

    # ------------------------------------------------------------------
    def search_not(
        self, query: str, exclude_query: str, k: int = 10,
        mode: str = "bm25", conjunctive: bool = True,
    ) -> DataFrame:
        """Boolean NOT: top-k for ``query`` restricted to docs containing
        NO lemma of ``exclude_query`` — the missing boolean connective
        next to conjunctive (AND) and disjunctive (OR) search_ids modes.
        Cite: beyond-reference surface (the reference's query language is
        conjunctive-only, SearchServiceImpl.java:34-103).

        Plan: the classic pivot plan scores the positive terms (rarest-
        term range pruning intact), then ONE left-anti join against the
        excluded lemmas' decoded doc_ids drops excluded docs BEFORE the
        top-k cut (an excluded doc must not occupy a result slot). The
        exclusion side cannot be range-pruned — NOT must see every doc
        that contains the excluded lemma, that's inherent to negation —
        but it runs the membership-only reader (matching_doc_ids):
        bucket partition pruning + term row-group pushdown like any
        scan, ONE binary column read, ids-stream-only decode. Exclusion lemmas absent from the dictionary
        exclude nothing; positive-term semantics are exactly search_ids'.
        Both sides run the delete-vector-masked decode kernels, so a
        replaced doc can neither match nor shield a match."""
        self._check_mode(mode)

        def empty() -> DataFrame:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )

        infos, n_missing = self.lookup_terms(query)
        if (conjunctive and n_missing) or not infos:
            return empty()
        ex_terms = sorted(set(analyze_text(exclude_query)))
        ex_infos, _ = self._infos_for_terms(ex_terms)
        partials = self.candidate_scores(
            infos, mode=mode, conjunctive=conjunctive
        )
        scored = self._pivot_combine(partials, len(infos), conjunctive)
        if ex_infos:
            scored = scored.join(
                self.matching_doc_ids(ex_infos), "doc_id", "left_anti"
            )
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        )

    # ------------------------------------------------------------------
    def _suggest_index_usable(self, word: str, max_edit: int) -> bool:
        """True iff the symmetric-delete index (operators/
        suggest_index.py) can answer (word, max_edit) EXACTLY: built,
        covering the requested edit distance, fresh (its recorded
        stats_epoch matches the live corpus — incremental merges grow
        the vocabulary, which only the scan path sees), word short
        enough that the builder's term-length cap cannot hide a true
        match, and the engine not pinned to a snapshot (the delete
        index is a HEAD-derived cache)."""
        if self.snapshot is not None:
            return False
        from .suggest_index import read_suggest_manifest

        m = read_suggest_manifest(self.index_dir)
        if m is None or max_edit > m["max_edit"]:
            return False
        if m["stats_epoch"] is None or m["stats_epoch"] != self._stats_epoch:
            return False
        return len(word) <= m["max_term_len"] - m["max_edit"]

    def suggest(
        self, word: str, max_edit: int = 2, k: int = 10,
        use_delete_index: bool | None = None,
    ) -> DataFrame:
        """Spell suggestion ("did you mean"): dictionary lemmas within
        Levenshtein distance ``max_edit`` of the lowercased ``word``,
        ranked (dist ASC, df DESC, term ASC) top-k — closest first, most
        common within a distance first. Cite: beyond-reference surface
        (the reference hard-fails unknown lemmas, SearchServiceImpl.java:
        60-62 — this is the recovery path a user hits right after).

        Scan path (the exact baseline): ONE narrow scan of the
        vocab-sized dictionary (term_stats) with a length-band prefilter
        (|len(term) - len(word)| <= max_edit lower-bounds the edit
        distance, so most of the vocabulary never reaches the DP), the
        JVM levenshtein expression for survivors, and a
        TakeOrderedAndProject top-k. No shuffle, no Python, no collect.

        Scale path (``use_delete_index``, default: auto when fresh): the
        symmetric-delete index (operators/suggest_index.py) — the query
        word's own delete variants probe the range-partitioned delete-key
        table (file/row-group pruning), the candidate superset joins the
        LIVE term_stats for df, and the same exact levenshtein filter +
        ordering run over the few candidates. Bit-identical to the scan
        path by construction (superset + exact filter; parity-tested and
        oracle-gated by ``engine_suggest_fast``); silently degrades to
        the scan path when the index is missing, stale (stats_epoch
        handshake), too narrow for the requested edit distance, or the
        engine is snapshot-pinned."""
        w = (word or "").strip().lower()
        if not w:
            raise ValueError("suggest() needs a non-empty word")
        max_edit = int(max_edit)
        if max_edit < 0:
            raise ValueError("max_edit must be >= 0")
        if use_delete_index is None:
            use_delete_index = max_edit >= 1 and self._suggest_index_usable(
                w, max_edit
            )
        elif use_delete_index and not self._suggest_index_usable(w, max_edit):
            raise ValueError(
                "use_delete_index=True but the delete index cannot answer "
                "this lookup exactly: it is missing, stale, narrower than "
                "the requested max_edit, built with a term-length cap too "
                "small for this word, or the engine is snapshot-pinned — "
                "rebuild with build_suggest_index() (or a larger "
                "max_term_len), or use the scan path"
            )
        dist = F.levenshtein(F.col("term"), F.lit(w)).cast("long")
        if use_delete_index:
            from .suggest_index import suggest_candidates

            cand = suggest_candidates(
                self.spark, self.index_dir, w, max_edit
            )
            base = cand.join(self.term_stats, "term")
        else:
            base = self.term_stats.filter(
                F.abs(F.length("term") - F.lit(len(w))) <= F.lit(max_edit)
            )
        return (
            base
            .withColumn("dist", dist)
            .filter(F.col("dist") <= F.lit(max_edit))
            .select("term", F.col("df").cast("long").alias("df"), "dist")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(int(k))
        )

    # ------------------------------------------------------------------
    def mlt_terms(self, doc_id: int, n_terms: int = 3) -> list[str]:
        """The term-selection half of ``more_like_this``: the source
        doc's top ``n_terms`` dictionary lemmas by tf*idf (tie: term
        ASC), returned sorted — one pruned point-read of the doc store
        plus the memoized dictionary lookup; the idf is the scorer's
        own (_idf over LIVE n_docs), so selection and scoring can never
        disagree about term weight. Exposed so presentation layers
        (api.similar) can highlight the very terms the query used.
        Raises ValueError for an unknown (or deleted/replaced) doc."""
        doc_id = int(doc_id)
        rows = (
            self.documents.filter(F.col("doc_id") == doc_id)
            .select("text").collect()
        )
        if not rows:
            raise ValueError(
                f"doc_id {doc_id} not found in the doc store "
                "(or deleted/replaced)"
            )
        from collections import Counter

        tf = Counter(analyze_text(rows[0]["text"] or ""))
        self._fill_df_cache(sorted(tf))
        ranked = sorted(
            (
                (t, c) for t, c in tf.items()
                if self._df_cache[t] is not None
            ),
            key=lambda tc: (
                -(tc[1] * self._idf(self._df_cache[tc[0]])), tc[0]
            ),
        )
        return sorted(t for t, _ in ranked[: int(n_terms)])

    def more_like_this(
        self, doc_id: int, n_terms: int = 3, k: int = 10,
        mode: str = "bm25", terms: list[str] | None = None,
    ) -> DataFrame:
        """Find documents similar to ``doc_id``: the source doc's top
        ``n_terms`` lemmas by tf*idf (tie: term ASC) become a disjunctive
        query over the index; the source doc itself is excluded BEFORE
        the top-k cut. Cite: beyond-reference surface (Lucene's
        MoreLikeThis shape re-expressed over the classic pivot plan).

        Plan: ONE pruned point-read of the doc store fetches the source
        text (k-row work); term selection is driver-side arithmetic over
        its |doc| lemma counts plus the already-memoized dictionary rows
        (no extra job beyond the <=|doc|-row dictionary lookup); then the
        standard disjunctive classic plan — bucket/term-pruned scan,
        pivot, FIXED df-asc accumulation order — scores the candidates.
        tf*idf selection uses the same idf the scorer uses (_idf over
        LIVE n_docs), so selection and scoring can never disagree about
        term weight. The doc store read and the decode kernels are both
        delete-vector-masked: a replaced doc is not a valid source and
        never appears as a neighbor."""
        self._check_mode(mode)
        # ``terms``: a presentation layer that already called mlt_terms
        # (api.similar does, for snippet highlighting) passes the
        # selection back to avoid re-paying the doc-store point-read
        sel = (
            sorted(terms) if terms is not None
            else self.mlt_terms(doc_id, n_terms=n_terms)
        )
        doc_id = int(doc_id)
        if not sel:
            return self.spark.createDataFrame(
                [], schema="doc_id long, score double"
            )
        infos, _ = self._infos_for_terms(sel)
        partials = self.candidate_scores(
            infos, mode=mode, conjunctive=False
        )
        scored = self._pivot_combine(
            partials, len(infos), conjunctive=False
        )
        return (
            scored.filter(F.col("doc_id") != F.lit(doc_id))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(int(k))
        )

    # ------------------------------------------------------------------
    def facet_counts(
        self, query: str, by: str = "conv_id", mode: str = "bm25",
        conjunctive: bool = True,
    ) -> DataFrame:
        """Facet the FULL match set of ``query`` by a doc-store column:
        (facet, n_matches, best_score), n_matches DESC / facet ASC — the
        "refine by source/site" panel next to the ranked list. Cite:
        beyond-reference surface (the reference returns a flat ranked
        list only, SearchServiceImpl.java:34-103).

        Plan: the classic pivot plan produces the scored match set
        (NOT top-k cut — facets summarize everything that matched), one
        doc_id-equi join attaches the facet column from the (delete-
        masked) doc store, and a facet-keyed aggregate — partial map-side
        combine, then one exchange of n_facets rows — produces the
        counts. count and max are order-insensitive, so the result is
        deterministic regardless of plan shape. At 100 TB the join is
        the standard doc-metadata attach (AQE picks broadcast when the
        match set is small); a dedicated facet-column posting stream
        would remove it, documented as the next step in PERF.md."""
        self._check_mode(mode)
        if by not in self.documents.columns:
            raise ValueError(
                f"facet column {by!r} not in the doc store "
                f"(have: {self.documents.columns})"
            )

        def empty() -> DataFrame:
            return self.spark.createDataFrame(
                [], schema="facet string, n_matches long, best_score double"
            )

        infos, n_missing = self.lookup_terms(query)
        if (conjunctive and n_missing) or not infos:
            return empty()
        partials = self.candidate_scores(
            infos, mode=mode, conjunctive=conjunctive
        )
        scored = self._pivot_combine(partials, len(infos), conjunctive)
        side = self.documents.select(
            "doc_id", F.col(by).cast("string").alias("facet")
        )
        return (
            scored.join(side, "doc_id")
            .groupBy("facet")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_matches"),
                F.max("score").alias("best_score"),
            )
            .orderBy(F.desc("n_matches"), F.asc("facet"))
        )

    # ------------------------------------------------------------------
    def search_many(
        self,
        queries: dict[str, str] | list[str],
        k: int = 10,
        mode: str = "bm25",
        conjunctive: bool = True,
    ) -> DataFrame:
        """Batch top-k: score MANY queries in ONE Spark job, returning
        (query_id, doc_id, score). The sequential read path is
        latency-bound — each ``search`` is a few driver-coordinated jobs
        with ~0.5 s of fixed cost — so an offline query workload (eval
        suites, relevance regressions, query-log replays over a 100 TB
        index) should be scored in bulk: one scan covers the union
        vocabulary, every posting block is decoded ONCE and fanned out to
        all subscribing queries, and the per-query fixed cost disappears;
        throughput then scales with executors instead of round-trips.

        Per query the result is bit-identical to ``search_ids``:
        per-(doc, term) partials are query-independent, accumulation is
        the same left-to-right df-ascending COALESCE chain (orders a
        shorter query never emits coalesce to +0.0, an IEEE no-op on the
        positive partials), conjunctive presence is enforced per query,
        and top-k uses the same (score DESC, doc_id ASC) tie-break.
        Queries that are empty after analysis, or conjunctive queries
        with a dictionary-missing term, contribute zero rows (the
        ``search_ids`` empty-result contract). Rarest-term block-range
        pruning carries over from the single-query path, amortized:
        ALL queries' rarest-term ranges are fetched in two driver jobs
        (_collect_ranges_bulk, memoized per engine snapshot), decoded
        doc_ids are masked per TERM before the shuffle (a (term, doc)
        row is dropped only when EVERY subscribing query prunes that
        doc — lossless, since such a doc lacks each subscriber's rarest
        term and fails their conjunctive filters regardless), and a
        coarse union-of-ranges filter is pushed into the parquet scan.

        Exchange volume is per-TERM and PACKED, not per-subscription:
        BM25/relevance partials are query-independent, so each (term,
        doc) posting crosses the exchange exactly ONCE no matter how
        many queries share the term — and it crosses as a delta-varbyte
        slice keyed by doc-range bucket (~4-6 bytes/posting), re-encoded
        vectorized in the decode stage, never as a row. The scoring
        stage decodes each bucket straight into dense (docs x terms)
        numpy arrays (doc -> row is arithmetic on the bucket layout — no
        sort/unique over postings), evaluates every query's score as a
        left-to-right sum of its df-ascending term columns, applies the
        conjunctive/disjunctive presence mask, and emits per-partition
        top-k (argpartition + tie-safe (score DESC, doc_id ASC)
        lexsort) — k-bounded rows per (query, partition). The final
        combine is a row_number window over |queries| x partitions x k
        rows that compiles to WindowGroupLimit."""
        self._check_mode(mode)
        if not isinstance(queries, dict):
            queries = {f"q{i}": q for i, q in enumerate(queries)}
        out_schema = "query_id string, doc_id long, score double"
        # analyze each query text exactly ONCE, then one dictionary
        # lookup for the union vocabulary (the per-query info builds
        # below are pure cache hits on the pre-analyzed lemma sets)
        q_lemmas = {
            qid: sorted(set(analyze_text(q))) for qid, q in queries.items()
        }
        union_terms = sorted({t for ts in q_lemmas.values() for t in ts})
        self._fill_df_cache(union_terms)
        per_q: dict[str, list[TermInfo]] = {}
        for qid, q_terms in q_lemmas.items():
            infos, n_missing = self._infos_for_terms(q_terms)
            if not infos or (conjunctive and n_missing):
                continue
            per_q[qid] = infos
        if not per_q:
            return self.spark.createDataFrame([], schema=out_schema)
        # query ids travel the hot path as dense int32 — a string id on
        # every partial row is pure Arrow/shuffle weight (the partials
        # frame is |queries| x df-sized); the string comes back via a
        # broadcast join on the k-bounded result
        qid_idx = {qid: i for i, qid in enumerate(per_q)}
        # rarest-term doc_id ranges per query (conjunctive, multi-term
        # only — same rule as search_ids), fetched for the WHOLE workload
        # in two driver jobs and memoized
        q_ranges: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if conjunctive:
            rare_uncached = sorted(
                {
                    infos[0].term
                    for infos in per_q.values()
                    if len(infos) > 1
                    and infos[0].term not in self._ranges_cache
                }
            )
            if rare_uncached:
                self._collect_ranges_bulk(rare_uncached)
            for qid, infos in per_q.items():
                if len(infos) <= 1:
                    continue
                merged = self._ranges_cache.get(infos[0].term)
                if merged:
                    q_ranges[qid_idx[qid]] = (
                        np.array([r[0] for r in merged], dtype=np.int64),
                        np.array([r[1] for r in merged], dtype=np.int64),
                    )
        # term -> [qid_idx] subscriber lists (partials are query-
        # independent; subscribers matter only for the pruning union)
        subs: dict[str, list[int]] = {}
        for qid, infos in per_q.items():
            for ti in infos:
                subs.setdefault(ti.term, []).append(qid_idx[qid])
        terms = sorted(subs)
        term_ti = {t: i for i, t in enumerate(terms)}
        term_idf = {
            ti.term: self._idf(ti.df)
            for infos in per_q.values()
            for ti in infos
        }
        # per-term union mask: a (term, doc) partial may be dropped pre-
        # shuffle only if EVERY query subscribing to the term prunes the
        # doc (doc outside that query's rarest-term ranges -> the doc
        # lacks the query's rarest term -> its conjunctive filter rejects
        # the doc whether or not this partial exists). Any unpruned
        # subscriber (single-term query, hot rarest term, disjunctive
        # mode) disables the term's mask entirely.
        term_ranges: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for t, sub_qis in subs.items():
            if all(qi in q_ranges for qi in sub_qis):
                spans = sorted(
                    {
                        (int(lo), int(hi))
                        for qi in sub_qis
                        for lo, hi in zip(*q_ranges[qi])
                    }
                )
                merged = self._merge_spans(spans)
                term_ranges[term_ti[t]] = (
                    np.array([r[0] for r in merged], dtype=np.int64),
                    np.array([r[1] for r in merged], dtype=np.int64),
                )
        avgdl, max_tf_sum = self.avgdl, self.max_tf_sum

        from ..functions.spark_hash import spark_bucket

        buckets = sorted({spark_bucket(t, self.n_buckets) for t in terms})
        blocks = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        # coarse scan filter: a block can be skipped only if EVERY query
        # that subscribes to its term prunes it — so the pushed predicate
        # is (term has an unpruned subscriber) OR (overlaps any range).
        # Catalyst turns the range OR into parquet row-group min/max skips.
        unpruned_terms = sorted(
            t for t in terms if term_ti[t] not in term_ranges
        )
        all_ranges = sorted(
            {
                (int(lo), int(hi))
                for lo_a, hi_a in term_ranges.values()
                for lo, hi in zip(lo_a, hi_a)
            }
        )
        if term_ranges and len(all_ranges) <= self.PRUNE_MAX_FILTER_RANGES:
            overlap = None
            for lo, hi in all_ranges:
                c = (F.col("first_doc_id") <= hi) & (
                    F.col("last_doc_id") >= lo
                )
                overlap = c if overlap is None else (overlap | c)
            if unpruned_terms:
                overlap = F.col("term").isin(unpruned_terms) | overlap
            blocks = blocks.filter(overlap)
        elif term_ranges:
            # no silent caps (same contract as candidate_scores): results
            # stay exact via the decode-side union mask, but the scan loses
            # row-group pushdown — say so
            warnings.warn(
                f"{len(all_ranges)} doc_id ranges exceed "
                f"PRUNE_MAX_FILTER_RANGES={self.PRUNE_MAX_FILTER_RANGES}; "
                "batch-scan row-group pushdown dropped (results stay exact "
                "via the decode-side mask). Many incremental batches? "
                "compact_index restores dense ordering.",
                stacklevel=2,
            )
        blocks = blocks.select(
            "term", "first_doc_id", "doc_ids", "tfs", "dls"
        )

        # ---- packed exchange layout -----------------------------------
        # The candidate partials for a big batch are |union df|-sized; a
        # row-per-posting exchange ships ~28B+ per posting (ints + row
        # overhead). Instead the decode stage RE-ENCODES each term's
        # postings into delta-varbyte slices keyed by doc-RANGE bucket
        # (~4-6B per posting), so the wide exchange moves packed buffers,
        # and the scoring stage decodes them straight into dense
        # per-bucket arrays — no per-posting rows ever cross a shuffle.
        # A term's blocks are disjoint, ordered doc runs (within AND
        # across part_ids — parts split the doc_id space), so sorting a
        # scan batch by (term, first_doc_id) makes the grouped decode
        # output globally sorted per term; range slicing is then one
        # searchsorted against the bucket edges.
        n_score_parts = self.spark.sparkContext.defaultParallelism
        n_rb = 8 * n_score_parts  # over-decompose: hash smooths rb->part
        edges = (
            np.arange(n_rb + 1, dtype=np.int64) * (self.id_space + 2)
        ) // n_rb
        rb_widths = np.diff(edges)
        idf_by_ti = np.array(
            [term_idf[t] for t in terms], dtype=np.float64
        )

        pack_schema = T.StructType(
            [
                T.StructField("rb", T.IntegerType(), False),
                T.StructField("ti", T.IntegerType(), False),
                T.StructField("ids_b", T.BinaryType(), False),
                T.StructField("tf_b", T.BinaryType(), False),
                T.StructField("dl_b", T.BinaryType(), False),
            ]
        )
        # delete-vector broadcast handle (see candidate_scores)
        deleted_bc = self._deleted_bc

        def decode_pack(batches):
            from ..functions.codec import (
                decode_postings_grouped,
                varbyte_decode_groups,
                varbyte_encode_sliced,
            )

            deleted = deleted_bc.value if deleted_bc is not None else None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(
                    ["term", "first_doc_id"], ignore_index=True
                )
                ids_col = pdf["doc_ids"].to_numpy()
                tfs_col = pdf["tfs"].to_numpy()
                dls_col = pdf["dls"].to_numpy()
                o_rb, o_ti, o_ids, o_tf, o_dl = [], [], [], [], []
                for term, rows in pdf.groupby(
                    "term", sort=False
                ).indices.items():
                    ids, tfs, _ = decode_postings_grouped(
                        list(ids_col[rows]), list(tfs_col[rows])
                    )
                    if ids.size == 0:
                        continue
                    # dl is only a BM25 input — relevance_ref never reads
                    # dl_b (score_topk guards on mode), so skip the decode
                    # + re-encode and ship empty buffers instead of ~1/3
                    # extra exchange bytes per posting
                    dls = (
                        varbyte_decode_groups(list(dls_col[rows]))[0]
                        if mode == "bm25"
                        else None
                    )
                    ti = term_ti[term]
                    rng = term_ranges.get(ti)
                    if rng is not None:
                        # union mask over ALL subscribing queries' rarest
                        # ranges (lossless, see docstring) so pruned docs
                        # never enter the exchange
                        lo_arr, hi_arr = rng
                        pos = np.searchsorted(lo_arr, ids, side="right") - 1
                        keep = (pos >= 0) & (
                            ids <= hi_arr[np.clip(pos, 0, None)]
                        )
                        if not keep.all():
                            ids, tfs = ids[keep], tfs[keep]
                            if dls is not None:
                                dls = dls[keep]
                    if deleted is not None and ids.size:
                        keep = ~np.isin(ids, deleted)
                        if not keep.all():
                            ids, tfs = ids[keep], tfs[keep]
                            if dls is not None:
                                dls = dls[keep]
                    if ids.size == 0:
                        continue
                    cut = np.searchsorted(ids, edges[1:-1])
                    starts = np.concatenate(([0], cut))
                    lens = np.diff(np.concatenate((starts, [ids.size])))
                    # delta stream, absolute value at each slice start
                    ids_u = ids.astype(np.uint64)
                    g = np.empty(ids.size, dtype=np.uint64)
                    g[0] = ids_u[0]
                    g[1:] = ids_u[1:] - ids_u[:-1]
                    snz = starts[lens > 0]
                    g[snz] = ids_u[snz]
                    ids_bufs = varbyte_encode_sliced(g, starts)
                    tf_bufs = varbyte_encode_sliced(
                        tfs.astype(np.uint64), starts
                    )
                    dl_bufs = (
                        varbyte_encode_sliced(dls, starts)
                        if dls is not None
                        else None
                    )
                    for j in np.flatnonzero(lens):
                        o_rb.append(j)
                        o_ti.append(ti)
                        o_ids.append(ids_bufs[j])
                        o_tf.append(tf_bufs[j])
                        o_dl.append(dl_bufs[j] if dl_bufs is not None else b"")
                if o_rb:
                    yield pd.DataFrame(
                        {
                            "rb": np.array(o_rb, dtype=np.int32),
                            "ti": np.array(o_ti, dtype=np.int32),
                            "ids_b": o_ids,
                            "tf_b": o_tf,
                            "dl_b": o_dl,
                        }
                    )

        partials = blocks.mapInPandas(decode_pack, schema=pack_schema)
        # co-locate each doc's term partials, then score EVERY query and
        # take per-partition top-k in ONE vectorized numpy pass: a dense
        # (docs x terms) matrix per partition, each query's score as a
        # left-to-right sum of its df-ascending term columns (missing
        # terms contribute literally +0.0 — the exact COALESCE-chain
        # accumulation order of search_ids), presence as a bool-matrix
        # AND (conjunctive) / OR (disjunctive), and (score DESC, doc_id
        # ASC) top-k per query via lexsort. Output is k-bounded per
        # (query, partition), so the final combine touches at most
        # |queries| x partitions x k rows. (A Catalyst formulation —
        # per-doc map + per-query struct array + explode + window — was
        # measured 2-4x slower here: the |queries|-way expression fanout
        # runs per doc row, and the pre-window sort pays
        # O(matches log matches) on the exploded set.)
        m = len(terms)
        q_cols = [
            [term_ti[info.term] for info in infos]
            for qid, infos in per_q.items()
        ]
        topk_schema = T.StructType(
            [
                T.StructField("qi", T.IntegerType(), False),
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("score", T.DoubleType(), False),
            ]
        )

        def score_topk(batches):
            # a (rb, ti) group's packed rows may straddle Arrow batches —
            # concat first; the per-partition frame holds only packed
            # buffers (~handful of rows per (rb, ti)), never posting rows
            from ..functions.codec import (
                decode_postings_grouped,
                varbyte_decode_groups,
            )

            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 \
                else pdfs[0]
            # dense layout: this partition's present range buckets laid
            # out contiguously — doc -> row is pure arithmetic (no
            # np.unique / sort over postings)
            rb_col = pdf["rb"].to_numpy()
            rbs = np.unique(rb_col)
            cum = np.concatenate(
                ([0], np.cumsum(rb_widths[rbs], dtype=np.int64))
            )
            n_rows = int(cum[-1])
            rb_lo = edges[rbs]  # doc lower bound per present bucket
            mat = np.zeros((n_rows, m), dtype=np.float64)
            hit = np.zeros((n_rows, m), dtype=bool)
            ids_col = pdf["ids_b"].to_numpy()
            tf_col = pdf["tf_b"].to_numpy()
            dl_col = pdf["dl_b"].to_numpy()
            for ti_val, rows in pdf.groupby("ti", sort=False).indices.items():
                ids, tfs, cnt = decode_postings_grouped(
                    list(ids_col[rows]), list(tf_col[rows])
                )
                if ids.size == 0:
                    continue
                if mode == "bm25":
                    dls, _ = varbyte_decode_groups(list(dl_col[rows]))
                    dls = dls.astype(np.float64)
                    numer = tfs * (K1 + 1)
                    denom = tfs + K1 * (1 - B + B * dls / avgdl)
                    # literal operation order of the single-query path:
                    # (idf * numer) / denom — NOT idf * (numer / denom),
                    # which differs by an ulp
                    s = idf_by_ti[ti_val] * numer / denom
                else:  # relevance_ref
                    s = tfs / max_tf_sum
                row_rank = np.searchsorted(rbs, rb_col[rows])
                rank = np.repeat(row_rank, cnt)
                idx = cum[rank] + (ids - rb_lo[rank])
                mat[idx, ti_val] = s
                hit[idx, ti_val] = True
            qi_a, doc_a, s_a = [], [], []
            for qi, cols in enumerate(q_cols):
                # presence first (1-byte bool traffic), THEN score only
                # the candidate rows (8-byte gathers) — same left-to-right
                # df-ascending additions as search_ids on a row subset,
                # so the doubles are bit-identical
                present = hit[:, cols[0]].copy()
                for c in cols[1:]:
                    if conjunctive:
                        present &= hit[:, c]
                    else:
                        present |= hit[:, c]
                cand = np.flatnonzero(present)
                if cand.size == 0:
                    continue
                cs = mat[cand, cols[0]].copy()
                for c in cols[1:]:  # df-ascending, left to right
                    cs += mat[cand, c]
                # dense row -> doc_id (needed for the ASC tie-break too)
                rank = np.searchsorted(cum, cand, side="right") - 1
                docs = cand - cum[rank] + rb_lo[rank]
                if cand.size > 4 * k:
                    # O(n) preselect by score alone, then tie-safe: keep
                    # EVERY candidate scoring >= the provisional k-th
                    # before the (score DESC, doc_id ASC) lexsort decides
                    thr = cs[np.argpartition(-cs, k - 1)[k - 1]]
                    keep = np.flatnonzero(cs >= thr)
                    order = np.lexsort((docs[keep], -cs[keep]))[:k]
                    sel_d, sel_s = docs[keep[order]], cs[keep[order]]
                else:
                    order = np.lexsort((docs, -cs))[:k]
                    sel_d, sel_s = docs[order], cs[order]
                qi_a.append(np.full(sel_d.size, qi, dtype=np.int32))
                doc_a.append(sel_d)
                s_a.append(sel_s)
            if qi_a:
                yield pd.DataFrame(
                    {
                        "qi": np.concatenate(qi_a),
                        "doc_id": np.concatenate(doc_a),
                        "score": np.concatenate(s_a),
                    }
                )

        # explicit partition count: without it AQE's advisory-size
        # coalescing is free to merge this exchange down to a handful of
        # partitions (the packed frame is small in BYTES), strangling the
        # scoring stage's parallelism — its cost is numpy work per
        # POSTING, not shuffle bytes
        scored = partials.repartition(n_score_parts, "rb").mapInPandas(
            score_topk, schema=topk_schema
        )
        names = self.spark.createDataFrame(
            [(i, qid) for qid, i in qid_idx.items()],
            schema="qi int, query_id string",
        )
        # final per-query top-k over the k-bounded per-partition winners:
        # row_number <= k compiles to WindowGroupLimit (partial top-k
        # before the qi exchange)
        w = Window.partitionBy("qi").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .join(F.broadcast(names), "qi")
            .select("query_id", "doc_id", "score")
        )

    # ------------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        mode: str = "bm25",
        max_df: int | None = None,
        conjunctive: bool = True,
        with_snippets: bool = True,
        scope: str | None = None,
        role: str | None = None,
        exclude: str | None = None,
    ) -> DataFrame:
        """Full result projection (P6): doc metadata + score + snippet.
        ``exclude`` routes through search_not (boolean NOT; first page
        only — pagination/scope/role/df-cutoff ride the classic plan);
        ``role`` restricts to matching doc-store roles (search_ids)."""
        if exclude is not None:
            if (offset != 0 or scope is not None or max_df is not None
                    or role is not None):
                raise ValueError(
                    "exclude= requires offset=0, scope=None, role=None, "
                    "max_df=None"
                )
            ids = self.search_not(
                query, exclude, k=k, mode=mode, conjunctive=conjunctive
            )
        else:
            ids = self.search_ids(
                query, k=k, offset=offset, mode=mode, max_df=max_df,
                conjunctive=conjunctive, scope=scope, role=role,
            )
        joined = self.documents.join(F.broadcast(ids), "doc_id")
        if with_snippets:
            lemmas = set(analyze_text(query))

            @F.pandas_udf(T.StringType())
            def snippet_udf(texts: pd.Series) -> pd.Series:
                return texts.apply(lambda t: make_snippet(t, lemmas))

            joined = joined.withColumn("snippet", snippet_udf(F.col("text")))
        else:
            joined = joined.withColumn("snippet", F.lit(None).cast("string"))
        return joined.select(
            "doc_id", "conv_id", "turn_idx", "score", "snippet"
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    # ------------------------------------------------------------------
    def statistics(self) -> DataFrame:
        """Index statistics report (A6/A7; StatisticsServiceImpl.java:33-51
        analog): per-role doc counts + global totals."""
        docs = self.documents
        per_role = docs.groupBy("role").agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("n_tokens"),
        )
        return per_role.withColumn("n_docs_total", F.lit(self.n_docs))
