"""Entry point D, genuinely trained: next-position prediction with a
model fit ON THE DATA at query time — the live replacement for the
reference's declared-but-never-built MLlib/TensorFlow trajectory
predictor (reference README.md:5-6,94,98; SURVEY §3.3 stratum D).

Model: per-step autoregressive OLS ``lat_next ~ 1 + lat + dlat`` over the
per-user kinematic series (same synthetic lat mapping as
``pipeline_predict_full``), trained by the normal equations on the
training split (user_id % 5 != 4), evaluated on the HELD-OUT users
(user_id % 5 == 4). Training is one map-side-combined aggregation of
sufficient statistics + a 3x3 numpy solve on the driver (plans/train.py)
— the only driver traffic is ten rounded floats, at any corpus size.

The oracle replicates the ENTIRE pipeline including training: the same
rounded sufficient statistics feed a generated Cramer's-rule solve
(plans/train.cramer_sql), so CORRECTNESS checks feature build, split,
normal equations, solve, and prediction end to end. Both engines round
the stats (3 dp) before solving and the coefficients (8 dp) before
predicting, which makes the float pipeline deterministic across engines
(see plans/train.py docstring).

The RMSE gate (tests/test_trained_model.py) asserts the trained model
beats both dead-reckoning baselines (persist: pred=lat; velocity:
pred=lat+dlat) on the held-out users — the quality bar that makes this
"a model", not "a formula".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.plans.train import (
    cramer_sql,
    fit_ols,
    predict_expr,
    stats_sql,
)
from streaming_data_pipeline_capstone_spark.registry import register
from streaming_data_pipeline_capstone_spark.sources.readers import read_table

_HOLDOUT_MOD = 5   # user_id % 5 == 4 → held-out evaluation users
_FEATURES = ["one", "lat", "dlat"]
_TARGET = "lat_next"

# SQL twins of the Spark feature columns (order matches _FEATURES)
_FEATURE_SQL = ["1.0", "lat", "dlat"]

_ORACLE = f"""
    WITH src AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             7.0 + CAST(event_id % 16 AS DOUBLE) + 0.5 AS lat
      FROM events
    ), frame AS (
      SELECT user_id, event_id, lat,
             lat - lag(lat) OVER w AS dlat,
             lead(lat) OVER w AS lat_next
      FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), rows_ AS (
      SELECT * FROM frame WHERE dlat IS NOT NULL AND lat_next IS NOT NULL
    ), stats AS (
      SELECT {stats_sql(_FEATURE_SQL, _TARGET)}
      FROM rows_ WHERE user_id % {_HOLDOUT_MOD} <> {_HOLDOUT_MOD - 1}
    ), coef AS (
      SELECT {cramer_sql(len(_FEATURES))} FROM stats
    )
    SELECT user_id, event_id, lat, dlat, lat_next,
           round(c0 + c1 * lat + c2 * dlat, 5) AS pred_lat_next
    FROM rows_, coef
    WHERE user_id % {_HOLDOUT_MOD} = {_HOLDOUT_MOD - 1}
    """


def prediction_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (lat, dlat, lat_next) rows — one exchange on user_id
    serves the lag and the lead."""
    events = read_table(spark, sf_dir, "events")
    src = events.select(
        "event_id",
        "user_id",
        "ts",
        (F.lit(7.0) + (F.col("event_id") % 16).cast("double") + F.lit(0.5)).alias("lat"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = src.select(
        "user_id",
        "event_id",
        "lat",
        (F.col("lat") - F.lag("lat").over(w)).alias("dlat"),
        F.lead("lat").over(w).alias(_TARGET),
    )
    return frame.filter(F.col("dlat").isNotNull() & F.col(_TARGET).isNotNull())


def fit_path_model(frame: DataFrame) -> list[float]:
    """OLS on the training split; ten rounded floats to the driver."""
    train = frame.filter(F.col("user_id") % _HOLDOUT_MOD != _HOLDOUT_MOD - 1)
    train = train.withColumn("one", F.lit(1.0))
    return fit_ols(train, _FEATURES, _TARGET)


@register("pipeline_predict_trained", _ORACLE)
def pipeline_predict_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    frame = prediction_frame(spark, sf_dir)
    coefs = fit_path_model(frame)
    holdout = frame.filter(F.col("user_id") % _HOLDOUT_MOD == _HOLDOUT_MOD - 1)
    holdout = holdout.withColumn("one", F.lit(1.0))
    return holdout.select(
        "user_id",
        "event_id",
        "lat",
        "dlat",
        _TARGET,
        predict_expr(_FEATURES, coefs).alias("pred_lat_next"),
    )
