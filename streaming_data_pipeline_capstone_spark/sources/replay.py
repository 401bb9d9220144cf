"""Deterministic stream replay (replaces the reference's TCP pair).

The reference replayed its corpus through a hand-rolled socket server at
≤100 msg/s (``server.py:43-100``, 10 ms sleep per row) into a Kafka
producer client (``client.py``). For tests and local development the
engine replays a batch DataFrame as a sequence of files that a
file-stream source consumes one-per-micro-batch — same unbounded
semantics, fully deterministic, no sockets, no sleeps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_capstone_spark.sources.readers import read_stream_files


def replay_to_files(
    df: DataFrame,
    path: str,
    num_chunks: int,
    order_col: str | None = None,
) -> T.StructType:
    """Split ``df`` into ``num_chunks`` parquet files under ``path`` in
    ``order_col`` order (chunk i = micro-batch i). Returns the schema for
    the matching stream reader."""
    os.makedirs(path, exist_ok=True)
    src = df.orderBy(order_col) if order_col else df
    rows = src.collect()
    schema = df.schema
    n = max(1, (len(rows) + num_chunks - 1) // num_chunks)
    spark = df.sparkSession
    for i in range(num_chunks):
        chunk = rows[i * n : (i + 1) * n]
        if not chunk:
            break
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/chunk={i:05d}"
        )
    return schema


def stream_from_replay(
    spark: SparkSession, path: str, schema: T.StructType, files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over a replay directory: each trigger consumes
    ``files_per_trigger`` chunks — the deterministic Kafka stand-in."""
    return read_stream_files(
        spark,
        f"{path}/chunk=*",
        schema,
        fmt="parquet",
        max_files_per_trigger=files_per_trigger,
    )


def rate_to_envelope(rate_df: DataFrame) -> DataFrame:
    """Shape the rate source like a Kafka envelope (value bytes) for
    load-generation benchmarks at the reference's 2,800 msg/s feed rate."""
    return rate_df.select(
        F.to_json(F.struct("timestamp", "value")).cast("binary").alias("value")
    )
