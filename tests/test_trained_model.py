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


# -- trained quality classifier (damped IRLS logistic) ------------------------


def test_fit_logistic_irls_learns_a_separable_rule(spark):
    """On cleanly separable data the fixed-iteration trainer must
    classify every training row correctly (coefficients stay finite
    because the iteration count is fixed)."""
    from streaming_data_pipeline_capstone_spark.plans.train import (
        dot_expr,
        fit_logistic_irls,
    )

    rows = [(float(x), 1.0 if x > 0 else 0.0) for x in range(-20, 21) if x != 0]
    df = (
        spark.createDataFrame(rows, "x double, y double")
        .withColumn("one", F.lit(1.0))
    )
    beta = fit_logistic_irls(df, ["one", "x"], "y", iters=3)
    assert all(math.isfinite(b) for b in beta)
    assert beta[1] > 0, "slope must point toward the positive class"
    scored = df.withColumn(
        "p", F.lit(1.0) / (F.lit(1.0) + F.exp(-dot_expr(["one", "x"], beta)))
    )
    wrong = scored.filter(
        ((F.col("p") >= 0.5) & (F.col("y") == 0.0))
        | ((F.col("p") < 0.5) & (F.col("y") == 1.0))
    ).count()
    assert wrong == 0


def test_cramer_solve_matches_numpy_on_well_conditioned_system():
    """The SQL-mirroring Cramer solve must agree with numpy's LU solve to
    well past the 8-dp coefficient rounding on a benign system."""
    import numpy as np

    from streaming_data_pipeline_capstone_spark.plans.train import cramer_solve

    a = np.array(
        [
            [4.0, 1.0, 0.5, 0.2],
            [1.0, 3.0, 0.4, 0.1],
            [0.5, 0.4, 2.0, 0.3],
            [0.2, 0.1, 0.3, 1.5],
        ]
    )
    t = np.array([1.0, -2.0, 0.7, 3.1])
    row = {f"s_{i}_{j}": a[i, j] for i in range(4) for j in range(i, 4)}
    row.update({f"t_{i}": t[i] for i in range(4)})
    got = cramer_solve(row, 4)
    want = np.linalg.solve(a, t)
    # cramer_solve rounds to COEF_ROUND (8 dp), so agreement is bounded
    # by the rounding half-ulp, not float epsilon
    assert got == pytest.approx(want, abs=6e-9)


def test_quality_classifier_beats_majority_baseline(spark, sf_oracle):
    """The point of training: on HELD-OUT docs the model must beat the
    majority-class baseline at reproducing the Gopher rule verdict — else
    it is a formula, not a model."""
    from streaming_data_pipeline_capstone_spark.queries.quality import (
        _QC_HOLDOUT_MOD,
        quality_classifier_trained,
    )

    rows = quality_classifier_trained(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % _QC_HOLDOUT_MOD == _QC_HOLDOUT_MOD - 1
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["pred_keep"] == (r["quality_score"] >= 0.5)
    acc = sum(r["pred_keep"] == r["passes_quality"] for r in rows) / len(rows)
    pos = sum(r["passes_quality"] for r in rows) / len(rows)
    majority = max(pos, 1.0 - pos)
    assert acc > majority, f"accuracy {acc:.3f} <= majority baseline {majority:.3f}"
    # and it must actually find some of the minority class, not just
    # inflate accuracy on the easy negatives
    tp = sum(r["pred_keep"] and r["passes_quality"] for r in rows)
    assert tp > 0
