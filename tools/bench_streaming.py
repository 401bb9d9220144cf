"""Streaming ingest benchmark — the BASELINE's ≥2,800 events/s target.

The reference's production AIS feed ran ~2,800 msg/s (README.md:110) while
its replay harness capped at ~100 msg/s (server.py:56, a 10 ms sleep per
row). This tool measures what the rebuilt engine sustains end-to-end on the
reference's entry-point-B job: JSON envelope decode → 17-col schema →
WKT extract → bbox filter → ECEF → timestamp parse → sentinel null-out →
watermarked 2-min/1-min sliding kinematic aggregation.

Method: events at $SPARK_GRAFT_SF_DIR are dressed as AIS wire JSON (same
field names/types the reference's Kafka topic carried), written as replay
chunks, then consumed as a multi-micro-batch file stream (the deterministic
Kafka stand-in) with trigger(availableNow). Throughput = input rows /
wall-clock from query start to drain, startup included.

Prints ONE JSON line: {"metric": "streaming_ingest_rate", "value": N,
"unit": "events_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_pipeline_capstone_spark.plans.preprocess import (
    kinematic_aggs,
    preprocess_from_envelope,
)
from streaming_data_pipeline_capstone_spark.session import get_spark
from streaming_data_pipeline_capstone_spark.sources.readers import read_table
from streaming_data_pipeline_capstone_spark.sources.replay import (
    ais_wire_from_events,
    replay_to_files,
    stream_from_replay,
)

NUM_CHUNKS = 10


def run_streaming_bench(spark, sf_dir: str) -> dict:
    """Run both streaming jobs and return the metrics dict (no printing).

    Callable from bench.py so the driver's single BENCH JSON line carries
    the streaming numbers too. Restores ``spark.sql.shuffle.partitions``
    on exit so a shared session isn't left reconfigured.
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Streaming state-store overhead is per (partition × micro-batch): each
    # stateful partition snapshots to the checkpoint every trigger. At this
    # key cardinality (~1k mmsi) 8 state partitions beat 32; a real cluster
    # sizes this to executor count × a small factor, not to batch CPU.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    events = read_table(spark, sf_dir, "events")
    n_events = events.count()

    workdir = tempfile.mkdtemp(prefix="bench_streaming_")
    replay_dir = os.path.join(workdir, "replay")
    ckpt_dir = os.path.join(workdir, "ckpt")
    try:
        envelope = ais_wire_from_events(events)
        schema = replay_to_files(envelope, replay_dir, NUM_CHUNKS, order_col=None)

        def run(sink_df, mode, ckpt):
            t0 = time.perf_counter()
            q = (
                sink_df.writeStream.outputMode(mode)
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            elapsed = time.perf_counter() - t0
            batches = len([p for p in q.recentProgress if p.get("numInputRows", 0) > 0])
            return elapsed, batches

        # entry point B: decode → clean → geo → watermarked sliding agg
        stream = stream_from_replay(spark, replay_dir, schema, files_per_trigger=1)
        aggs = kinematic_aggs(preprocess_from_envelope(stream), watermark="5 minutes")
        el_b, nb_b = run(aggs, "update", os.path.join(ckpt_dir, "b"))

        # entry point C: decode → clean → keyed last-3 state (executor-side)
        from streaming_data_pipeline_capstone_spark.streaming.state import (
            last_k_per_key_stream,
        )

        stream2 = stream_from_replay(spark, replay_dir, schema, files_per_trigger=1)
        state = last_k_per_key_stream(
            preprocess_from_envelope(stream2),
            key="mmsi",
            ts_col="timestamp_utc",
            value_cols=["speed_over_ground", "longitude", "latitude"],
            k=3,
        )
        el_c, nb_c = run(state, "update", os.path.join(ckpt_dir, "c"))

        return {
            "metric": "streaming_ingest_rate",
            "value": round(n_events / el_b, 1),
            "unit": "events_per_sec",
            "events": n_events,
            "elapsed_sec": round(el_b, 3),
            "micro_batches": nb_b,
            "stateful_last3_rate": round(n_events / el_c, 1),
            "stateful_elapsed_sec": round(el_c, 3),
            "baseline_target": 2800,
            "sf_dir": sf_dir,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-streaming")
    spark.range(1).count()
    print(json.dumps(run_streaming_bench(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
