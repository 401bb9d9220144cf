"""RocksDB state-store soak (T5/T7 at scale): the two stateful streaming
operators at 100k keys, across a checkpoint restart, on the provider a
100 TB deployment would run (incremental checkpoints, state off-heap).

The input is generated executor-side (spark.range → parquet chunks), not
through the driver-collect replay helper — 100k keys is deliberately past
driver-loop territory. Run 2 feeds ONLY a new chunk touching 1% of keys;
its output can reference run-1 timestamps only if the full 100k-key state
was restored from the RocksDB checkpoint. State-store metrics
(numRowsTotal from lastProgress) are asserted, not just row counts.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_capstone_spark.sources.replay import stream_from_replay
from streaming_data_pipeline_capstone_spark.streaming.state import (
    gap_fill_stream,
    last_k_per_key_stream,
)

N_KEYS = 100_000
SAMPLE_EVERY = 100  # run-2 touches keys 0, 100, 200, ... (1% of keys)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sdpc-soak-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture
def rocksdb(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    yield
    if prev:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _write_chunk(spark, replay_dir, i, minute, every=1):
    """chunk i = one event per key (or every Nth key) at 10:<minute>,
    value = user_id + minute. Written by executors, no driver collect."""
    df = (
        spark.range(0, N_KEYS, every)
        .select(
            F.col("id").alias("user_id"),
            F.lit(dt.datetime(2024, 1, 1, 10, minute)).alias("ts"),
            (F.col("id") + minute).cast("double").alias("value"),
        )
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{replay_dir}/chunk={i:05d}")


def _run(spark, replay_dir, make_stream, out_dir, ckpt_dir, mode):
    out = make_stream(stream_from_replay(spark, replay_dir, SCHEMA))

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return q.lastProgress


def _state_rows(progress) -> int:
    ops = (progress or {}).get("stateOperators") or []
    return sum(op.get("numRowsTotal", 0) for op in ops)


def _log_state_size(progress, label: str) -> dict:
    """Surface the RocksDB store SIZE (not just row count) from the query
    progress — the metric the blocked transformWithState soak leg would
    have tracked (round-3 ask #8 fallback; protobuf install verified
    impossible: no network in this container). Returns the aggregate and
    prints it so the soak run leaves a size trail in the test log."""
    ops = (progress or {}).get("stateOperators") or []
    agg = {
        "numRowsTotal": sum(op.get("numRowsTotal", 0) for op in ops),
        "stateMemoryBytes": sum(op.get("memoryUsedBytes", 0) for op in ops),
        "rocksdbSstFileSize": sum(
            int(op.get("customMetrics", {}).get("rocksdbSstFileSize", 0)) for op in ops
        ),
        "rocksdbTotalMemoryUsage": sum(
            int(op.get("customMetrics", {}).get("rocksdbTotalMemoryUsage", 0))
            for op in ops
        ),
    }
    print(f"\n[soak:{label}] state-store size: {agg}")
    return agg


def test_rocksdb_soak_last_k_100k_keys_restart(spark, tmpdir, rocksdb):
    replay = f"{tmpdir}/replay"
    _write_chunk(spark, replay, 0, minute=0)
    _write_chunk(spark, replay, 1, minute=10)

    def lastk(stream):
        return last_k_per_key_stream(
            stream, key="user_id", ts_col="ts", value_cols=["value"], k=3
        )

    p1 = _run(spark, replay, lastk, f"{tmpdir}/last_out1", f"{tmpdir}/last_ckpt", "update")
    assert _state_rows(p1) == N_KEYS, p1  # one state row per key, all keys live
    size1 = _log_state_size(p1, "last_k run1")
    # the 100k-key store must report real bytes, not a zeroed metric
    assert size1["rocksdbTotalMemoryUsage"] > 0 or size1["stateMemoryBytes"] > 0, p1

    # restart: one new chunk touching 1% of keys
    _write_chunk(spark, replay, 2, minute=20, every=SAMPLE_EVERY)
    p2 = _run(spark, replay, lastk, f"{tmpdir}/last_out2", f"{tmpdir}/last_ckpt", "update")
    assert _state_rows(p2) == N_KEYS, p2  # untouched keys still in the store
    _log_state_size(p2, "last_k run2")

    out2 = spark.read.parquet(f"{tmpdir}/last_out2")
    # only the sampled keys re-emit, each with its full restored top-3
    assert out2.count() == (N_KEYS // SAMPLE_EVERY) * 3
    probe = {
        r["rn"]: r["value"]
        for r in out2.filter(F.col("user_id") == 4200).collect()
    }
    # rn1 = new event (4200+20); rn2/rn3 restored from run-1 state
    assert probe == {1: 4220.0, 2: 4210.0, 3: 4200.0}


def test_rocksdb_soak_gap_fill_100k_keys_restart(spark, tmpdir, rocksdb):
    replay = f"{tmpdir}/replay"
    _write_chunk(spark, replay, 0, minute=0)
    _write_chunk(spark, replay, 1, minute=10)

    def gapfill(stream):
        return gap_fill_stream(
            stream, key="user_id", ts_col="ts", value_col="value",
            gap_seconds=300, step_seconds=300,
        )

    p1 = _run(spark, replay, gapfill, f"{tmpdir}/gap_out1", f"{tmpdir}/gap_ckpt", "append")
    assert _state_rows(p1) == N_KEYS, p1
    size1 = _log_state_size(p1, "gap_fill run1")
    assert size1["rocksdbTotalMemoryUsage"] > 0 or size1["stateMemoryBytes"] > 0, p1

    out1 = spark.read.parquet(f"{tmpdir}/gap_out1")
    # per key: t0 real + (t10 real + one interpolated point at t5)
    assert out1.count() == N_KEYS * 3
    assert out1.filter("is_interpolated = 1").count() == N_KEYS

    # restart: the 600 s gap from t10 to t20 interpolates only if last-seen
    # (t10) state for the sampled keys survived the restart
    _write_chunk(spark, replay, 2, minute=20, every=SAMPLE_EVERY)
    p2 = _run(spark, replay, gapfill, f"{tmpdir}/gap_out2", f"{tmpdir}/gap_ckpt", "append")
    assert _state_rows(p2) == N_KEYS, p2
    _log_state_size(p2, "gap_fill run2")

    out2 = spark.read.parquet(f"{tmpdir}/gap_out2")
    n_sample = N_KEYS // SAMPLE_EVERY
    assert out2.count() == n_sample * 2
    interp = out2.filter("is_interpolated = 1")
    assert interp.count() == n_sample
    row = interp.filter(F.col("user_id") == 4200).collect()[0]
    assert row["ts"] == dt.datetime(2024, 1, 1, 10, 15)
    assert row["value"] == pytest.approx(4215.0)  # midpoint of 4210 → 4220
