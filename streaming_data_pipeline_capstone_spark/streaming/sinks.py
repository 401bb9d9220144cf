"""Streaming sinks (SURVEY §2.1 S2/S5/S6/S10, §2.9 T1/T2).

Kafka / file / console / memory writers with checkpoint management, plus
the foreachBatch escape hatch. The reference's sink layering bug — it
chained ``.foreachBatch(...).format("csv")`` and discovered empirically
that the last one wins (``predict_path.py:94-95``) — can't happen here:
one function per sink, checkpoint location always explicit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from streaming_data_pipeline_capstone_spark.schemas import encode_json_envelope


def _with_trigger(
    w: DataStreamWriter,
    processing_time: str | None = None,
    available_now: bool = False,
) -> DataStreamWriter:
    if available_now:
        return w.trigger(availableNow=True)
    if processing_time:
        # the reference's 30-second micro-batch cadence (predict_path.py:95)
        return w.trigger(processingTime=processing_time)
    return w


def to_kafka(
    df: DataFrame,
    topic: str,
    checkpoint: str,
    bootstrap_servers: str = "127.0.0.1:9092",
    output_mode: str = "update",
    processing_time: str | None = None,
) -> StreamingQuery:
    """All columns → single JSON value → Kafka (reference preprocess.py:67-74)."""
    w = (
        encode_json_envelope(df)
        .writeStream.outputMode(output_mode)
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    return _with_trigger(w, processing_time).start()


def to_files(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    processing_time: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Append-mode file sink. The reference wrote CSV (predict_path.py:95);
    default here is parquet, optionally partitioned (date/key-bucket) so
    downstream scans get partition pruning."""
    w = (
        df.writeStream.outputMode("append")
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return _with_trigger(w, processing_time, available_now).start()


def to_memory(
    df: DataFrame,
    table_name: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Memory sink — deterministic test harness (SURVEY §5 item 3)."""
    w = df.writeStream.outputMode(output_mode).format("memory").queryName(table_name)
    return _with_trigger(w, available_now=available_now).start()


def to_console(df: DataFrame, output_mode: str = "append") -> StreamingQuery:
    """Debug sink (reference used print(df.show()) inside foreachBatch)."""
    return df.writeStream.outputMode(output_mode).format("console").start()


def for_each_batch(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "update",
    processing_time: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Arbitrary per-micro-batch logic (reference predict_path.py:55-71).

    The body runs on the driver, so fn must not hold per-key state (that
    belongs in streaming/state.py) — use it for sink fan-out, MERGE
    upserts, or side effects.
    """
    w = (
        df.writeStream.outputMode(output_mode)
        .foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
    )
    return _with_trigger(w, processing_time, available_now).start()
