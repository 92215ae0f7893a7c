"""Property test: the pure-Python murmur3 equals Spark's hash() exactly
(bucket pruning correctness depends on it)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_spark.functions.spark_hash import spark_hash_string


def test_matches_spark_hash_on_random_strings(spark):
    cases: list[str] = []

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def collect(s):
        cases.append(s)

    collect()
    rows = (
        spark.createDataFrame([(s,) for s in set(cases)], "s string")
        .select("s", F.hash("s").alias("h"))
        .collect()
    )
    assert rows
    for r in rows:
        assert spark_hash_string(r["s"]) == r["h"], repr(r["s"])
