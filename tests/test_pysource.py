"""Spark 4 Python DataSource replay source: offsets, partitioning,
checkpoint-restart resume, and end-to-end compatibility with the
preprocess chain."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from streaming_data_pipeline_capstone_spark.plans.preprocess import (
    preprocess_from_envelope,
)
from streaming_data_pipeline_capstone_spark.sources.pysource import (
    AisWireReplaySource,
    _AisReplayStreamReader,
    _wire_row,
)
from streaming_data_pipeline_capstone_spark.streaming.sinks import to_memory


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sdpc-pysource-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_reader_offsets_and_partitions():
    r = _AisReplayStreamReader({"rows": "10", "numpartitions": "3"})
    assert r.initialOffset() == {"offset": 0}
    # idempotent availability report, engine-safe to call repeatedly
    assert [r.latestOffset() for _ in range(2)] == [{"offset": 10}, {"offset": 10}]
    parts = r.partitions({"offset": 0}, {"offset": 10})
    ranges = [(p.start, p.end) for p in parts]
    assert ranges == [(0, 4), (4, 8), (8, 10)]
    got = [row for p in parts for row in r.read(p)]
    assert [i for i, _ in got] == list(range(10))
    assert got == [_wire_row(i) for i in range(10)]  # deterministic replay


def test_pysource_stream_through_preprocess(spark):
    """The generated wire JSON feeds the FULL preprocess chain: decode →
    WKT → bbox → ECEF → timestamp parse; partitioned executor-side reads."""
    spark.dataSource.register(AisWireReplaySource)
    stream = (
        spark.readStream.format("ais_wire_replay")
        .option("rows", 100)
        .option("numPartitions", 3)
        .load()
    )
    proc = preprocess_from_envelope(stream.select("value"))
    q = to_memory(proc, "pysource_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("pysource_out").collect()
    # generator stays inside the bbox and uses only kept message types →
    # nothing is dropped
    assert len(rows) == 100
    assert {r["mmsi"] for r in rows} == {200_000_000 + i for i in range(50)}
    assert all(r["timestamp_utc"] is not None for r in rows)
    assert all(r["cartesian_x"] is not None for r in rows)


def test_pysource_checkpoint_restart_resumes_at_high_water_mark(spark, tmpdir):
    """Engine-checkpointed offsets: run 1 drains a 60-row corpus; run 2
    (same checkpoint, corpus grown to 100) must emit ONLY rows 60..99 —
    no re-delivery, no gaps."""
    spark.dataSource.register(AisWireReplaySource)
    out, ckpt = f"{tmpdir}/out", f"{tmpdir}/ckpt"

    def run(rows):
        stream = (
            spark.readStream.format("ais_wire_replay")
            .option("rows", rows)
            .option("numPartitions", 2)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(60)
    assert spark.read.parquet(out).count() == 60
    run(100)
    offsets = sorted(r["offset"] for r in spark.read.parquet(out).collect())
    assert offsets == list(range(100))  # resumed at 60, no dups, no gaps
