"""Stateful-streaming throughput at 100k keys (VERDICT r5 ask #5).

The driver bench shows the keyed last-3 job (applyInPandasWithState,
Python-side state) running at ~67% of the plain ingest job (watermarked
sliding agg, JVM-side state) at sf0.1's ~1k keys. This tool asks the
question that matters at scale: what closes the gap at 100k keys — the
key cardinality of the RocksDB soak — and is the bottleneck the state
store (fixable with RocksDB + changelog checkpointing) or the per-key
Python invocation (fixable with larger micro-batches, which amortize the
one-update-call-per-key-per-batch cost over more rows)?

Method: 10 replay chunks, one event per key per chunk (1M rows total),
generated executor-side exactly like tests/test_rocksdb_soak.py — 100k
keys is past driver-loop territory. Both jobs consume the same chunks
with trigger(availableNow):

- plain   = watermarked 2-min/1-min sliding avg per key (JVM incremental
            state — the entry-point-B shape);
- stateful = keyed last-3 via applyInPandasWithState (Python state — the
            entry-point-C shape).

Each (provider, files-per-trigger) cell runs with a fresh checkpoint.
The ratio reported per cell is stateful_rate / plain_rate at the SAME
files-per-trigger, so batch-size wins in the stateless path don't
inflate the stateful story.

Prints ONE JSON line; ``--out`` also writes the full artifact.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_capstone_spark.session import get_spark
from streaming_data_pipeline_capstone_spark.sources.replay import stream_from_replay
from streaming_data_pipeline_capstone_spark.streaming.state import (
    last_k_per_key_stream,
)

N_KEYS = 100_000
N_CHUNKS = 10
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
CHANGELOG = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_chunks(spark, replay_dir: str) -> int:
    """One event per key per chunk, minute-spaced, written by executors."""
    for i in range(N_CHUNKS):
        df = spark.range(0, N_KEYS).select(
            F.col("id").alias("user_id"),
            F.lit(dt.datetime(2024, 1, 1, 10, i)).alias("ts"),
            (F.col("id") + i).cast("double").alias("value"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{replay_dir}/chunk={i:05d}")
    return N_KEYS * N_CHUNKS


def plain_job(stream):
    """Entry-point-B shape: watermark + sliding window avg per key.

    JVM-side incremental aggregation state — the comparison anchor."""
    return (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "2 minutes", "1 minute"), "user_id")
        .agg(F.avg("value").alias("avg_value"), F.count("*").alias("n"))
    )


def stateful_job(stream):
    """Entry-point-C shape: keyed last-3, Python-side state."""
    return last_k_per_key_stream(
        stream, key="user_id", ts_col="ts", value_cols=["value"], k=3
    )


def run_jvm_state(spark, replay_dir, ckpt, fpt: int, state_dir: str) -> float:
    """Same last-3 semantics, JVM-side state: foreachBatch union-upsert
    (the J1 operator the flagship pipeline uses) — merge the micro-batch
    with the persisted state table, rank with row_number per key, keep 3,
    rewrite. State never passes through Python; the per-batch cost is one
    exchange on the key plus a 3k-row-per-key parquet rewrite, which is
    how a lakehouse pipeline (Delta MERGE) keeps hot state at scale."""
    from streaming_data_pipeline_capstone_spark.operators.windows import (
        last_k_per_key,
    )

    stream = stream_from_replay(spark, replay_dir, SCHEMA, files_per_trigger=fpt)
    holder: dict = {"cur": None}

    def sink(batch, epoch_id):
        sess = batch.sparkSession
        merged = batch
        if holder["cur"] is not None:
            merged = batch.unionByName(
                sess.read.parquet(holder["cur"]).drop("rn")
            )
        out = last_k_per_key(
            merged, key="user_id", order_col="ts", k=3, tiebreak="value"
        )
        new_dir = os.path.join(state_dir, f"v{epoch_id}")
        out.write.mode("overwrite").parquet(new_dir)
        holder["cur"] = new_dir

    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def run_query(spark, replay_dir, ckpt, job, fpt: int) -> float:
    stream = stream_from_replay(spark, replay_dir, SCHEMA, files_per_trigger=fpt)
    t0 = time.perf_counter()
    q = (
        job(stream)
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_stateful_r06.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="bench-stateful")
    spark.range(1).count()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Same sizing rule as tools/bench_streaming.py: state-store overhead is
    # per (partition x micro-batch); 8 partitions for local state.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    workdir = tempfile.mkdtemp(prefix="bench_stateful_")
    replay_dir = os.path.join(workdir, "replay")
    results: dict = {}
    try:
        n_rows = write_chunks(spark, replay_dir)

        def cell(label, job, fpt, provider=None, changelog=False):
            if provider:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", provider
                )
            spark.conf.set(CHANGELOG, "true" if changelog else "false")
            ckpt = os.path.join(workdir, "ckpt", label)
            elapsed = run_query(spark, replay_dir, ckpt, job, fpt)
            rate = round(n_rows / elapsed, 1)
            print(f"# {label}: {elapsed:.2f}s = {rate} ev/s", file=sys.stderr)
            return {"elapsed_sec": round(elapsed, 3), "rate": rate}

        # Plain anchors at both batch sizes (ratio denominator per fpt).
        results["plain_fpt1"] = cell("plain_fpt1", plain_job, 1, HDFS)
        results["plain_fpt10"] = cell("plain_fpt10", plain_job, 10, HDFS)

        # Stateful sweep: provider x changelog x batch size.
        results["stateful_hdfs_fpt1"] = cell(
            "stateful_hdfs_fpt1", stateful_job, 1, HDFS
        )
        results["stateful_rocksdb_fpt1"] = cell(
            "stateful_rocksdb_fpt1", stateful_job, 1, ROCKSDB
        )
        results["stateful_rocksdb_changelog_fpt1"] = cell(
            "stateful_rocksdb_changelog_fpt1", stateful_job, 1, ROCKSDB, True
        )
        results["stateful_hdfs_fpt10"] = cell(
            "stateful_hdfs_fpt10", stateful_job, 10, HDFS
        )
        results["stateful_rocksdb_changelog_fpt10"] = cell(
            "stateful_rocksdb_changelog_fpt10", stateful_job, 10, ROCKSDB, True
        )

        # JVM-state strategy: same semantics, state never enters Python.
        for fpt in (1, 10):
            label = f"stateful_jvm_upsert_fpt{fpt}"
            elapsed = run_jvm_state(
                spark,
                replay_dir,
                os.path.join(workdir, "ckpt", label),
                fpt,
                os.path.join(workdir, "state", label),
            )
            rate = round(n_rows / elapsed, 1)
            print(f"# {label}: {elapsed:.2f}s = {rate} ev/s", file=sys.stderr)
            results[label] = {"elapsed_sec": round(elapsed, 3), "rate": rate}
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.unset(CHANGELOG)
        spark.stop()

    ratios = {
        "hdfs_fpt1": round(
            results["stateful_hdfs_fpt1"]["rate"] / results["plain_fpt1"]["rate"], 3
        ),
        "rocksdb_fpt1": round(
            results["stateful_rocksdb_fpt1"]["rate"] / results["plain_fpt1"]["rate"],
            3,
        ),
        "rocksdb_changelog_fpt1": round(
            results["stateful_rocksdb_changelog_fpt1"]["rate"]
            / results["plain_fpt1"]["rate"],
            3,
        ),
        "hdfs_fpt10": round(
            results["stateful_hdfs_fpt10"]["rate"] / results["plain_fpt10"]["rate"],
            3,
        ),
        "rocksdb_changelog_fpt10": round(
            results["stateful_rocksdb_changelog_fpt10"]["rate"]
            / results["plain_fpt10"]["rate"],
            3,
        ),
        "jvm_upsert_fpt1": round(
            results["stateful_jvm_upsert_fpt1"]["rate"]
            / results["plain_fpt1"]["rate"],
            3,
        ),
        "jvm_upsert_fpt10": round(
            results["stateful_jvm_upsert_fpt10"]["rate"]
            / results["plain_fpt10"]["rate"],
            3,
        ),
    }
    out = {
        "metric": "stateful_vs_plain_rate_100k_keys",
        "value": max(ratios.values()),
        "unit": "ratio (stateful/plain at same files-per-trigger)",
        "n_keys": N_KEYS,
        "n_rows": N_KEYS * N_CHUNKS,
        "n_chunks": N_CHUNKS,
        "target": 0.75,
        "results": results,
        "ratios": ratios,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"ratios": ratios, "best": out["value"],
                      "plain_fpt1_rate": results["plain_fpt1"]["rate"]}))


if __name__ == "__main__":
    main()
