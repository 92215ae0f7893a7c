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
