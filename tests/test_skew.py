"""Salting must change only the physical distribution, never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.skew import (
    salted_join,
    skewed_collect_list,
    two_phase_agg,
)
from streaming_data_pipeline_capstone_spark.sources.readers import read_table


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_join_matches_plain_join(spark, sf_smoke):
    li = read_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    orders = orders.withColumnRenamed("o_orderkey", "l_orderkey")

    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", salt=8)
    assert _sorted_rows(plain, "l_orderkey", "l_quantity", "o_totalprice") == _sorted_rows(
        salted, "l_orderkey", "l_quantity", "o_totalprice"
    )


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(big, small, "k", how="left", salt=4)
    rows = {r["k"]: r["w"] for r in out.collect()}
    assert rows == {1: "x", 2: None, 3: None}
    assert out.count() == 3  # no duplication from replication


def test_two_phase_agg_sum_matches(spark, sf_smoke):
    events = read_table(spark, sf_smoke, "events")
    plain = events.groupBy("user_id").agg(
        F.sum("value").alias("s"), F.count("*").alias("n")
    )
    salted = two_phase_agg(
        events,
        "user_id",
        partial_aggs=[F.sum("value").alias("ps"), F.count("*").alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    )
    a = {r["user_id"]: (round(r["s"], 6), r["n"]) for r in plain.collect()}
    b = {r["user_id"]: (round(r["s"], 6), r["n"]) for r in salted.collect()}
    assert a == b


def test_skewed_collect_list_same_multiset(spark, sf_smoke):
    events = read_table(spark, sf_smoke, "events").limit(2000)
    plain = events.groupBy("user_id").agg(F.collect_list("event_id").alias("event_id_list"))
    salted = skewed_collect_list(events, "user_id", "event_id", salt=8)
    a = {r["user_id"]: sorted(r["event_id_list"]) for r in plain.collect()}
    b = {r["user_id"]: sorted(r["event_id_list"]) for r in salted.collect()}
    assert a == b


def test_salted_join_rejects_right_and_full(spark):
    import pytest as _pytest

    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)
