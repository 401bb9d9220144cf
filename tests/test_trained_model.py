"""Quality gate for the genuinely-trained path model (entry point D).

The oracle check (pipeline_predict_trained) proves Spark and DuckDB
agree on training + prediction; THESE tests prove the model is worth
training — it must beat both dead-reckoning baselines on users it never
saw — and that the normal-equations trainer is numerically sound.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.plans.train import fit_ols, predict_expr
from streaming_data_pipeline_capstone_spark.queries.trained import (
    _HOLDOUT_MOD,
    fit_path_model,
    prediction_frame,
)


def test_fit_ols_recovers_exact_linear_model(spark):
    """On exactly-linear data, OLS must recover the generating
    coefficients (rounded to the trainer's 8 dp)."""
    rows = [(float(a), float(b)) for a in range(10) for b in range(7)]
    df = spark.createDataFrame(rows, "a double, b double")
    df = df.withColumn("one", F.lit(1.0)).withColumn(
        "y", F.lit(2.0) + 3.0 * F.col("a") - 1.0 * F.col("b")
    )
    coefs = fit_ols(df, ["one", "a", "b"], "y")
    assert coefs == pytest.approx([2.0, 3.0, -1.0], abs=1e-6)


def _rmse(df, pred_col: str) -> float:
    row = df.agg(
        F.sqrt(F.avg(F.pow(F.col(pred_col) - F.col("lat_next"), 2))).alias("rmse")
    ).collect()[0]
    return float(row["rmse"])


def test_trained_model_beats_dead_reckoning_on_holdout(spark, sf_oracle):
    frame = prediction_frame(spark, sf_oracle)
    coefs = fit_path_model(frame)

    holdout = frame.filter(
        F.col("user_id") % _HOLDOUT_MOD == _HOLDOUT_MOD - 1
    ).withColumn("one", F.lit(1.0))
    holdout = (
        holdout.withColumn("pred_trained", predict_expr(["one", "lat", "dlat"], coefs))
        .withColumn("pred_persist", F.col("lat"))  # dead-reckoning: stay put
        .withColumn("pred_velocity", F.col("lat") + F.col("dlat"))  # keep moving
    )
    holdout = holdout.cache()
    try:
        rmse_trained = _rmse(holdout, "pred_trained")
        rmse_persist = _rmse(holdout, "pred_persist")
        rmse_velocity = _rmse(holdout, "pred_velocity")
    finally:
        holdout.unpersist()

    assert math.isfinite(rmse_trained)
    # the quality bar: better than BOTH dead-reckoning baselines on
    # users the trainer never saw
    assert rmse_trained < rmse_persist, (rmse_trained, rmse_persist)
    assert rmse_trained < rmse_velocity, (rmse_trained, rmse_velocity)


def test_training_stats_are_tiny_driver_traffic(spark, sf_smoke):
    """The trainer's only collect is one row of sufficient statistics —
    assert the aggregation output really is one row with d(d+3)/2 + 1
    columns (n, upper-triangle X'X, X'y), independent of input size."""
    from streaming_data_pipeline_capstone_spark.plans.train import xtx_xty_sums

    frame = prediction_frame(spark, sf_smoke).withColumn("one", F.lit(1.0))
    stats = frame.agg(*xtx_xty_sums(frame, ["one", "lat", "dlat"], "lat_next"))
    collected = stats.collect()
    assert len(collected) == 1
    d = 3
    assert len(collected[0]) == 1 + d * (d + 1) // 2 + d
