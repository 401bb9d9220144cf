"""Flagship query: last-3-events-per-key with per-key rolling averages.

This is the reference's core stateful semantics (keep the 3 most recent
positions per vessel, ``predict_path.py:60-66``) fused with its dormant
rolling kinematic averages (``preprocess.py:78-88``), run batch-mode on the
``events`` testdata twin of ``position_history`` (ts≈timestamp_utc,
user_id≈mmsi, value≈speed_over_ground).

Physical plan at scale: ONE hash exchange on user_id feeds both the
row_number sort and the partition-wide average — no driver state, no
second shuffle, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.windows import last_k_per_key
from streaming_data_pipeline_capstone_spark.registry import register
from streaming_data_pipeline_capstone_spark.sources.readers import read_table

_FLAGSHIP_ORACLE = """
WITH ranked AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS INTEGER) AS rn
  FROM events
)
SELECT user_id, event_id, ts, value, rn,
       round(avg(value) OVER (PARTITION BY user_id), 6) AS avg_value_last3
FROM ranked
WHERE rn <= 3
"""


@register("flagship_last3_rolling", _FLAGSHIP_ORACLE)
def flagship_last3_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    kept = last_k_per_key(events, key="user_id", order_col="ts", k=3, tiebreak="event_id")
    return kept.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "rn",
        F.round(F.avg("value").over(Window.partitionBy("user_id")), 6).alias(
            "avg_value_last3"
        ),
    )
