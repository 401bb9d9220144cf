"""Storage-layout tests: the written layout must change the READ plans —
date partitions prune, buckets kill the join exchange. These assertions
are on `.explain` output because the layout's entire point is the plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.sources.readers import read_table
from streaming_data_pipeline_capstone_spark.sources.writers import (
    write_bucketed_table,
    write_csv,
    write_date_partitioned,
    write_parquet,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_partitioned_write_prunes(spark, sf_smoke, tmpdir):
    events = read_table(spark, sf_smoke, "events")
    path = os.path.join(str(tmpdir), "events_by_date")
    write_date_partitioned(events, path, ts_col="ts")

    back = spark.read.parquet(path)
    one_day = back.select("event_id").filter(F.col("event_date") == "2024-01-01")

    # partition pruning: the scan's PartitionFilters carry the date predicate
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan
    # directory layout exists and the filter actually restricts input
    dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(dirs) > 1
    total = back.count()
    assert 0 < one_day.count() < total


def test_partitioned_write_roundtrip(spark, sf_smoke, tmpdir):
    events = read_table(spark, sf_smoke, "events")
    path = os.path.join(str(tmpdir), "events_flat")
    write_parquet(events, path, max_records_per_file=1000)
    assert spark.read.parquet(path).count() == events.count()


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmpdir):
    orders = read_table(spark, sf_smoke, "orders")
    li = read_table(spark, sf_smoke, "lineitem")
    wh = str(tmpdir)
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "t_orders_b",
        "o_orderkey",
        num_buckets=4,
        path=os.path.join(wh, "orders_b"),
    )
    write_bucketed_table(
        li.select("l_orderkey", "l_quantity"),
        "t_lineitem_b",
        "l_orderkey",
        num_buckets=4,
        path=os.path.join(wh, "lineitem_b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale broadcast would win and bypass bucketing; disable it
        # to surface the layout the large-large (100 TB) case relies on
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = _plan(joined)
        # co-located buckets: sort-merge join with NO shuffle on either side
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_csv_roundtrip(spark, sf_smoke, tmpdir):
    nation = read_table(spark, sf_smoke, "nation")
    path = os.path.join(str(tmpdir), "nation_csv")
    write_csv(nation.select("n_nationkey", "n_name"), path)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == nation.count()


def test_ivf_cell_partitioned_layout_prunes(spark, sf_smoke, tmpdir):
    """The IVF scale path: embeddings written partitioned by coarse cell,
    probes read only their cell's directory (partition-pruned scan)."""
    from streaming_data_pipeline_capstone_spark.queries.extras import ivf_cell

    emb = read_table(spark, sf_smoke, "embeddings")
    cells = emb.withColumn("cell", ivf_cell(F.col("embedding")))
    path = os.path.join(str(tmpdir), "emb_ivf")
    write_parquet(cells, path, partition_by=["cell"])

    back = spark.read.parquet(path)
    some_cell = back.select("cell").head()["cell"]
    probe = back.filter(F.col("cell") == some_cell).select("vec_id")
    plan = _plan(probe)
    assert "PartitionFilters" in plan and "cell" in plan
    # at most 2^3 cells exist; the probe reads exactly one
    dirs = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert 1 < len(dirs) <= 8
    n_probe, n_all = probe.count(), back.count()
    assert 0 < n_probe < n_all
