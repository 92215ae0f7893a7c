"""Top-k rank identity vs the pandas oracle over the fixed reference query
set (tests/fixtures/queries.json; FIXTURES.md F4) — both scoring modes,
conjunctive + disjunctive, pagination, df cutoff. Comparison is EXACT
(doc_ids and float64 scores bit-equal) thanks to fixed accumulation order.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.oracle import oracle_search
from search_engine_spark.operators.query import SearchEngine

QUERIES = json.loads(
    (Path(__file__).parent / "fixtures" / "queries.json").read_text()
)["queries"]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    out, _ = built_index
    return SearchEngine(spark, out)


@pytest.mark.parametrize("spec", QUERIES, ids=[q["name"] for q in QUERIES])
@pytest.mark.parametrize("mode", ["bm25", "relevance_ref"])
def test_rank_identity(spec, mode, engine, oracle_idx):
    kwargs = dict(
        k=spec.get("k", 10),
        offset=spec.get("offset", 0),
        max_df=spec.get("max_df"),
        mode=mode,
    )
    got = engine.search_ids(spec["q"], **kwargs).toPandas().reset_index(drop=True)
    exp = oracle_search(oracle_idx, spec["q"], **kwargs)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist(), spec["name"]
    assert got["score"].tolist() == exp["score"].tolist(), spec["name"]


@pytest.mark.parametrize("spec", QUERIES[:8], ids=[q["name"] for q in QUERIES[:8]])
def test_rank_identity_disjunctive(spec, engine, oracle_idx):
    got = (
        engine.search_ids(spec["q"], k=10, conjunctive=False)
        .toPandas()
        .reset_index(drop=True)
    )
    exp = oracle_search(oracle_idx, spec["q"], k=10, conjunctive=False)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_full_search_projection(engine):
    res = engine.search("token batch", k=5).toPandas()
    assert list(res.columns) == ["doc_id", "conv_id", "turn_idx", "score", "snippet"]
    assert len(res) <= 5
    assert (res["score"] > 0).all()
    # snippets highlight at least one query surface form
    assert res["snippet"].str.contains("<b>").all()


@pytest.mark.parametrize(
    "spec",
    [q for q in QUERIES if not q.get("offset") and q.get("max_df") is None],
    ids=[
        q["name"]
        for q in QUERIES
        if not q.get("offset") and q.get("max_df") is None
    ],
)
def test_batch_plan_equals_classic_plan(spec, engine):
    """search_ids auto-routes plain queries through the packed
    search_many plan; the two physical plans must stay bit-identical on
    the whole (plain) reference query set."""
    k = spec.get("k", 10)
    fast = engine.search_ids(spec["q"], k=k, use_batch_plan=True).toPandas()
    classic = engine.search_ids(
        spec["q"], k=k, use_batch_plan=False
    ).toPandas()
    assert fast["doc_id"].tolist() == classic["doc_id"].tolist(), spec["name"]
    assert fast["score"].tolist() == classic["score"].tolist(), spec["name"]


def test_batch_plan_rejects_unsupported_args(engine):
    with pytest.raises(ValueError):
        engine.search_ids("query index", offset=5, use_batch_plan=True)


def test_pagination_slices_consistently(engine, oracle_idx):
    full = engine.search_ids("query index", k=30).toPandas()
    page2 = engine.search_ids("query index", k=10, offset=10).toPandas()
    assert page2["doc_id"].tolist() == full["doc_id"].tolist()[10:20]


def test_scoped_search_is_exclusion(engine):
    """P4 scope (site-scoped search analog): scoped top-k must equal the
    unscoped scored set restricted to the scope then re-cut — scoring
    statistics stay global, the scope only excludes candidates."""
    docs = engine.documents.select("doc_id", "conv_id").toPandas()
    scope = "conv-00001"  # conv-000010 .. conv-000019
    all_hits = engine.search_ids("query index", k=100000).toPandas()
    merged = all_hits.merge(docs, on="doc_id")
    exp = (
        merged[merged["conv_id"].str.startswith(scope)]
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
    )
    got = engine.search_ids("query index", k=10, scope=scope).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()
    assert len(got) > 0
    # a scope matching no conversation returns empty, never errors
    assert engine.search_ids("query index", k=5, scope="zz-none").count() == 0


def test_statistics(engine):
    stats = engine.statistics().toPandas()
    assert stats["n_docs"].sum() == engine.n_docs
    assert set(stats["role"]) <= {"user", "assistant", "system", "tool"}


def test_search_many_matches_sequential(engine):
    """Batching must be bit-invisible: search_many over a mixed-width
    workload (3/2/1-term, shared vocabulary, a dictionary-missing term,
    an analyzes-to-nothing query) returns exactly each query's
    search_ids rows — same doc_ids, bit-equal float scores."""
    workload = {
        "multi": "query index merge",
        "pair": "token batch",
        "single": "spark",
        "missing": "token zzznope",  # conjunctive + absent term -> empty
        "blank": "🚀 ...",           # analyzer emits nothing -> empty
    }
    got = engine.search_many(workload, k=7).toPandas()
    assert list(got.columns) == ["query_id", "doc_id", "score"]
    for qid, q in workload.items():
        part = (
            got[got["query_id"] == qid]
            .sort_values(["score", "doc_id"], ascending=[False, True])
        )
        # use_batch_plan=False: compare against the CLASSIC row-partials
        # plan — search_ids now auto-routes plain queries through
        # search_many itself, which would make this test circular
        exp = engine.search_ids(q, k=7, use_batch_plan=False).toPandas()
        assert part["doc_id"].tolist() == exp["doc_id"].tolist(), qid
        assert part["score"].tolist() == exp["score"].tolist(), qid
    assert (got["query_id"] == "missing").sum() == 0
    assert (got["query_id"] == "blank").sum() == 0


def test_search_many_disjunctive_and_modes(engine):
    for mode in ["bm25", "relevance_ref"]:
        got = (
            engine.search_many(
                {"x": "dup spark token"}, k=6, mode=mode, conjunctive=False
            )
            .toPandas()
            .sort_values(["score", "doc_id"], ascending=[False, True])
        )
        exp = engine.search_ids(
            "dup spark token", k=6, mode=mode, conjunctive=False,
            use_batch_plan=False,
        ).toPandas()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), mode
        assert got["score"].tolist() == exp["score"].tolist(), mode
    # an all-empty workload returns an empty frame with the right schema
    empty = engine.search_many(["zzznope"], k=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "doc_id", "score",
    ]


def _hot_terms(engine, n=5):
    """The n highest-df dictionary terms — the queries block-max exists
    for (deterministic: df desc, term asc)."""
    import pyspark.sql.functions as F

    rows = (
        engine.term_stats.orderBy(F.desc("df"), F.asc("term"))
        .limit(n)
        .collect()
    )
    return [r["term"] for r in rows]


@pytest.mark.parametrize("mode", ["bm25", "relevance_ref"])
def test_blockmax_equals_classic_plan(engine, mode):
    """Two-pass block-max single-term top-k must be bit-identical to the
    classic full-decode plan on the hottest dictionary terms (where the
    seed threshold actually prunes blocks) for both scoring modes."""
    for term in _hot_terms(engine):
        fast = engine.search_ids(
            term, k=10, mode=mode, use_blockmax=True
        ).toPandas()
        classic = engine.search_ids(
            term, k=10, mode=mode, use_batch_plan=False
        ).toPandas()
        assert fast["doc_id"].tolist() == classic["doc_id"].tolist(), term
        assert fast["score"].tolist() == classic["score"].tolist(), term


def test_blockmax_threshold_actually_prunes(spark, tmp_path):
    """On a corpus with real tf spread (a few tf-heavy docs over a sea
    of tf=1 mentions — the Zipf-head shape block-max exists for), the
    bound >= tau filter must keep strictly fewer blocks than the term
    has, while the pruned plan stays bit-identical to the classic one.

    The shared fixture corpus is deliberately NOT used: its tfs are
    near-uniform, so the drift-immune dl:=tf bound clusters and the
    threshold keeps everything (correct, just no pruning to observe)."""
    import datetime

    import pandas as pd
    import pyspark.sql.functions as F

    from search_engine_spark.functions.spark_hash import spark_bucket
    from search_engine_spark.operators.index_build import build_index

    filler = "alpha bravo charlie delta echo foxtrot golf hotel " * 2
    texts = [f"{filler} hot mention{i}" for i in range(600)]
    # tf-heavy docs: short, term-dominated (their dl:=tf bound is tight)
    texts += ["hot " * 8] * 5
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:04d}" for i in range(len(texts))],
            "turn_idx": 0,
            "role": "user",
            "text": texts,
            "tool": None,
            "ts": datetime.datetime(2025, 1, 1),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = str(tmp_path / "idx_bmx")
    build_index(spark, spark.createDataFrame(pdf), out, n_parts=2,
                resume=False)
    eng = SearchEngine(spark, out)
    infos, _ = eng.lookup_terms("hot")
    info = infos[0]
    term_blocks = eng.postings.filter(
        (F.col("bucket") == spark_bucket(info.term, eng.n_buckets))
        & (F.col("term") == info.term)
    )
    total = term_blocks.count()
    assert total >= 4  # 605 postings / 128-block ~ 5 blocks
    bound = eng._block_bound_col(info, "bm25")
    seed = (
        term_blocks.withColumn("_bms", bound)
        .orderBy(F.desc("_bms"), F.asc("first_doc_id"))
        .limit(3)
        .drop("_bms")
    )
    rows = (
        eng.candidate_scores(
            [info], mode="bm25", conjunctive=False, blocks_df=seed
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(3)
        .collect()
    )
    tau = float(rows[-1]["s"])
    kept = term_blocks.filter(bound >= F.lit(tau)).count()
    assert kept < total
    fast = eng.search_ids("hot", k=3, use_blockmax=True).toPandas()
    classic = eng.search_ids("hot", k=3, use_batch_plan=False).toPandas()
    assert fast["doc_id"].tolist() == classic["doc_id"].tolist()
    assert fast["score"].tolist() == classic["score"].tolist()
    # fresh index -> the epoch handshake validates the STORED bound
    assert eng._stored_blockmax_valid() is True

    # invalidate the stored bound (incremental merge bumps the stats
    # epoch) and re-check the DRIFT-IMMUNE max_tf/min_dl bound: it must
    # also prune on this corpus (boilerplate blocks have max_tf=1 and
    # min_dl ~ the 16-word filler, far below tau from the tf=8 short
    # docs) and stay exact
    from search_engine_spark.operators.incremental import incremental_update

    extra = pd.DataFrame(
        {
            "conv_id": ["zz01"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["unrelated tail words here"],
            "tool": [None],
            "ts": [datetime.datetime(2025, 1, 2)],
        }
    )
    extra["ts"] = extra["ts"].astype("datetime64[us]")
    incremental_update(spark, spark.createDataFrame(extra), out)
    eng2 = SearchEngine(spark, out)
    assert eng2._stored_blockmax_valid() is False
    infos2, _ = eng2.lookup_terms("hot")
    bound2 = eng2._block_bound_col(infos2[0], "bm25")
    tb2 = eng2.postings.filter(
        (F.col("bucket") == spark_bucket("hot", eng2.n_buckets))
        & (F.col("term") == "hot")
    )
    seed2 = (
        tb2.withColumn("_bms", bound2)
        .orderBy(F.desc("_bms"), F.asc("first_doc_id"))
        .limit(3)
        .drop("_bms")
    )
    rows2 = (
        eng2.candidate_scores(
            [infos2[0]], mode="bm25", conjunctive=False, blocks_df=seed2
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(3)
        .collect()
    )
    tau2 = float(rows2[-1]["s"])
    assert tb2.filter(bound2 >= F.lit(tau2)).count() < tb2.count()
    fast2 = eng2.search_ids("hot", k=3, use_blockmax=True).toPandas()
    classic2 = eng2.search_ids("hot", k=3, use_batch_plan=False).toPandas()
    assert fast2["doc_id"].tolist() == classic2["doc_id"].tolist()
    assert fast2["score"].tolist() == classic2["score"].tolist()


def test_blockmax_rejects_unsupported_args(engine):
    with pytest.raises(ValueError):
        engine.search_ids("query", offset=5, use_blockmax=True)
    with pytest.raises(ValueError):  # multi-term query
        engine.search_ids("query index", use_blockmax=True)


def test_unknown_mode_raises(engine):
    with pytest.raises(ValueError):
        engine.search_ids("query", mode="BM25")
    with pytest.raises(ValueError):
        engine.search_many(["query"], mode="bm-25")
    with pytest.raises(ValueError):
        engine.search_prefix("qu", mode="tfidf")


# ---------------------------------------------------------------------------
# Multi-term MaxScore (disjunctive block-max bound-sum pruning)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["bm25", "relevance_ref"])
@pytest.mark.parametrize(
    "spec",
    [q for q in QUERIES if not q.get("offset") and q.get("max_df") is None][:6],
    ids=[
        q["name"]
        for q in QUERIES
        if not q.get("offset") and q.get("max_df") is None
    ][:6],
)
def test_maxscore_equals_classic_plan(spec, mode, engine):
    """The forced MaxScore plan must be bit-identical to the classic
    disjunctive full-decode plan on the reference query set, both
    scoring modes."""
    k = spec.get("k", 10)
    fast = engine.search_ids(
        spec["q"], k=k, mode=mode, conjunctive=False, use_maxscore=True
    ).toPandas()
    classic = engine.search_ids(
        spec["q"], k=k, mode=mode, conjunctive=False, use_batch_plan=False
    ).toPandas()
    assert fast["doc_id"].tolist() == classic["doc_id"].tolist(), spec["name"]
    assert fast["score"].tolist() == classic["score"].tolist(), spec["name"]


def test_maxscore_fallback_bound_equals_classic(engine):
    """MaxScore on the drift-immune max_tf/min_dl bound (stored bound
    invalidated — the post-incremental-merge configuration) must stay
    exact too."""
    eng = SearchEngine(engine.spark, engine.index_dir)
    eng._stored_bmx_valid = False
    fast = eng.search_ids(
        "query index", k=10, conjunctive=False, use_maxscore=True
    ).toPandas()
    classic = eng.search_ids(
        "query index", k=10, conjunctive=False, use_batch_plan=False
    ).toPandas()
    assert fast["doc_id"].tolist() == classic["doc_id"].tolist()
    assert fast["score"].tolist() == classic["score"].tolist()


def test_maxscore_rejects_unsupported_args(engine):
    with pytest.raises(ValueError, match="conjunctive"):
        engine.search_ids("query index", use_maxscore=True)
    with pytest.raises(ValueError, match="offset"):
        engine.search_ids(
            "query index", offset=5, conjunctive=False, use_maxscore=True
        )


def test_maxscore_missing_term_is_ignored_disjunctively(engine, oracle_idx):
    """Disjunctive semantics: a dictionary-missing term contributes
    nothing but does not empty the result."""
    got = engine.search_ids(
        "query zzzznonexistent", k=10, conjunctive=False, use_maxscore=True
    ).toPandas()
    exp = oracle_search(oracle_idx, "query", k=10, conjunctive=False)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_maxscore_actually_prunes_and_stays_exact(spark, tmp_path):
    """On a Zipf-head corpus (a handful of tf-heavy docs clustered at the
    tail of the doc_id space over a sea of tf=1 mentions), the bound-sum
    sweep must drop most grid buckets while the pruned plan stays
    bit-identical to the classic disjunctive plan — for BOTH bound
    sources (stored block_max_score and the drift-immune fallback)."""
    import datetime

    import pandas as pd

    from search_engine_spark.operators.index_build import build_index

    filler = "alpha bravo charlie delta echo foxtrot golf hotel " * 2
    texts = [f"{filler} hot warm mention{i}" for i in range(600)]
    # tf-heavy docs cluster at the END of (conv_id, turn_idx) order
    texts += ["hot warm " * 6] * 5
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:04d}" for i in range(len(texts))],
            "turn_idx": 0,
            "role": "user",
            "text": texts,
            "tool": None,
            "ts": datetime.datetime(2025, 1, 1),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = str(tmp_path / "idx_ms")
    build_index(spark, spark.createDataFrame(pdf), out, n_parts=2,
                resume=False)
    eng = SearchEngine(spark, out)
    for stored in (True, False):
        eng2 = SearchEngine(spark, out)
        if not stored:
            eng2._stored_bmx_valid = False
        fast = eng2.search_ids(
            "hot warm", k=3, conjunctive=False, use_maxscore=True
        ).toPandas()
        classic = eng2.search_ids(
            "hot warm", k=3, conjunctive=False, use_batch_plan=False
        ).toPandas()
        assert fast["doc_id"].tolist() == classic["doc_id"].tolist(), stored
        assert fast["score"].tolist() == classic["score"].tolist(), stored
        st = eng2.last_maxscore_stats
        assert st is not None and st["buckets_kept"] < st["buckets_total"], (
            stored,
            st,
        )


def test_maxscore_auto_routes_on_hot_disjunctive(engine):
    """Plain disjunctive multi-term queries route through MaxScore when
    the summed df clears the threshold (instance-shadowed here) and stay
    on the classic plan below it."""
    eng = SearchEngine(engine.spark, engine.index_dir)
    eng.last_maxscore_stats = None
    eng.search_ids("query index", k=5, conjunctive=False).collect()
    assert eng.last_maxscore_stats is None  # tiny dfs: classic plan
    eng.BLOCKMAX_MIN_POSTINGS = 1  # instance shadow: force eligibility
    eng.search_ids("query index", k=5, conjunctive=False).collect()
    assert eng.last_maxscore_stats is not None  # routed through MaxScore


def test_maxscore_autoroute_bails_on_flat_bounds(engine, oracle_idx):
    """An AUTO-routed MaxScore query on a corpus whose bucket ceilings
    are near-uniform (nothing for any tau to prune) must bail back to
    the classic plan after the grid pass — paying only the small agg,
    never the seed decode — and stay exact. A FORCED use_maxscore=True
    on the same query must still run the full plan (no bailout key)."""
    eng = SearchEngine(engine.spark, engine.index_dir)
    eng.BLOCKMAX_MIN_POSTINGS = 1
    eng.MAXSCORE_BAILOUT_P50 = 0.0  # any distribution reads as flat
    got = eng.search_ids("query index", k=10, conjunctive=False).toPandas()
    st = eng.last_maxscore_stats
    assert st is not None and st.get("bailout") is True
    assert 0.0 < st["p50_over_max"] <= 1.0 and st["buckets_total"] > 0
    exp = oracle_search(oracle_idx, "query index", k=10, conjunctive=False)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()
    # forced: full plan even under the same shadowed threshold
    eng.search_ids(
        "query index", k=10, conjunctive=False, use_maxscore=True
    ).collect()
    assert "bailout" not in eng.last_maxscore_stats


# ---------------------------------------------------------------------------
# Indexed candidate-first phrase search
# ---------------------------------------------------------------------------
def _expected_phrase_topk(engine, lemmas, k):
    """Independent residual-filter oracle: classic conjunctive scores for
    the distinct lemmas (uncut), intersected with a FULL-SCAN phrase
    count — the naive shape search_phrase exists to avoid."""
    from search_engine_spark.functions.analyzer import terms_col
    from search_engine_spark.functions.phrase import phrase_count_col

    infos, n_missing = engine._infos_for_terms(sorted(set(lemmas)))
    assert not n_missing
    scored = engine._pivot_combine(
        engine.candidate_scores(infos, mode="bm25", conjunctive=True),
        len(infos),
        True,
    )
    occ = phrase_count_col(terms_col(F.col("text")), tuple(lemmas))
    hits = engine.documents.select("doc_id", occ.alias("n")).filter(
        F.col("n") >= 1
    )
    return (
        scored.join(hits.select("doc_id"), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .toPandas()
    )


def test_search_phrase_equals_residual_oracle(engine):
    from search_engine_spark.functions.analyzer import analyze_text

    # pick a REAL contiguous bigram from a fixture doc so the result is
    # non-empty regardless of synth corpus details
    text = engine.documents.filter(F.col("dl") >= 4).first()["text"]
    lemmas = analyze_text(text)[:2]
    assert len(lemmas) == 2
    got = engine.search_phrase(" ".join(lemmas), k=10).toPandas()
    exp = _expected_phrase_topk(engine, lemmas, 10)
    assert len(got) > 0
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_search_phrase_single_lemma_equals_search_ids(engine):
    got = engine.search_phrase("query", k=10).toPandas()
    exp = engine.search_ids("query", k=10, use_batch_plan=False).toPandas()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_search_phrase_missing_lemma_is_empty(engine):
    assert engine.search_phrase("query zzzznonexistent", k=10).count() == 0


def test_search_phrase_rejects_empty(engine):
    with pytest.raises(ValueError, match="zero lemmas"):
        engine.search_phrase("...", k=10)
