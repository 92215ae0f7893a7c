"""API facade contracts (reference endpoint parity) + compaction."""

from __future__ import annotations

import pytest

from search_engine_spark.api import (
    ERR_EMPTY_QUERY,
    EngineAPI,
)
from search_engine_spark.operators.compaction import compact_index
from search_engine_spark.operators.incremental import incremental_update
from search_engine_spark.operators.query import SearchEngine
from search_engine_spark.synth import make_transcripts


def _sdf(spark, pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("api") / "idx")
    a = EngineAPI(spark, idx)
    pdf = make_transcripts(n_conversations=50, seed=5)
    res = a.start_indexing(_sdf(spark, pdf), n_parts=2, resume=False)
    assert res == {"result": True}
    a.wait(300)
    assert not a.is_indexing()
    return a


def test_search_envelope(spark, api):
    out = api.search("query index", limit=5)
    assert out["result"] and out["count"] == 5
    row = out["data"][0]
    assert {"doc_id", "conv_id", "turn_idx", "relevance", "snippet"} <= set(row)
    assert "<b>" in row["snippet"]


def test_search_empty_query_error(spark, api):
    assert api.search("   ") == {"result": False, "error": ERR_EMPTY_QUERY}


def test_search_no_results(spark, api):
    out = api.search("zzzznonexistent")
    assert out == {"result": True, "count": 0, "data": []}


def test_statistics(spark, api):
    st = api.statistics()
    tot = st["statistics"]["total"]
    assert tot["docs"] > 0 and tot["terms"] > 0 and not tot["is_indexing"]
    assert len(st["statistics"]["parts"]) == 2
    assert all(p["status"] == "DONE" for p in st["statistics"]["parts"])


def test_index_batch_and_compaction(spark, api, tmp_path_factory):
    extra = make_transcripts(n_conversations=12, seed=99)
    extra["conv_id"] = "x-" + extra["conv_id"]
    out = api.index_batch(_sdf(spark, extra))
    assert out["result"] and out["new_docs"] > 0

    eng = SearchEngine(spark, api.index_dir)
    before = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in eng.search_ids("query index", k=30)
        .join(eng.documents.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .collect()
    }
    res = compact_index(spark, api.index_dir, n_parts=3)
    assert res["parts_before"] == 3  # 2 base + 1 incremental
    assert res["parts_after"] == 3

    eng2 = SearchEngine(spark, api.index_dir)
    after = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in eng2.search_ids("query index", k=30)
        .join(eng2.documents.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .collect()
    }
    assert before == after  # bit-identical scores across the rewrite


def test_index_batch_without_index_errors(spark, tmp_path):
    a = EngineAPI(spark, str(tmp_path / "noidx"))
    pdf = make_transcripts(n_conversations=3, seed=1)
    out = a.index_batch(_sdf(spark, pdf))
    assert out["result"] is False and "no complete index" in out["error"]
