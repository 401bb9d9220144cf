"""Feature/scoring stage tests (plans/predict.py): path angle excludes
interpolated points; pandas_udf scorer runs Arrow-batched."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.plans.predict import score_paths, step_features


def _pos(mmsi, minute, lon, lat, x, y, interp=0):
    return (
        mmsi,
        dt.datetime(2024, 1, 1, 10, minute),
        10.0,
        90.0,
        0.0,
        lon,
        lat,
        x,
        y,
        interp,
    )


_SCHEMA = (
    "mmsi int, timestamp_utc timestamp, speed_over_ground double, "
    "course_over_ground double, rate_of_turn double, longitude double, "
    "latitude double, cartesian_x double, cartesian_y double, is_interpolated int"
)


def test_path_angle_straight_vs_turn(spark):
    # straight line (0°) then a 90° turn
    rows = [
        _pos(1, 0, 110.0, 15.0, 0.0, 0.0),
        _pos(1, 1, 110.1, 15.0, 1.0, 0.0),
        _pos(1, 2, 110.2, 15.0, 2.0, 0.0),  # straight → angle 0
        _pos(1, 3, 110.2, 15.1, 2.0, 1.0),  # 90° turn
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {r.timestamp_utc.minute: r.path_angle_deg for r in step_features(df).collect()}
    assert out[2] == 0.0
    assert out[3] == 90.0


def test_path_angle_skips_interpolated_points(spark):
    # interpolated midpoint must not participate in the angle at minute 4
    rows = [
        _pos(1, 0, 110.0, 15.0, 0.0, 0.0),
        _pos(1, 2, 110.2, 15.0, 2.0, 0.0),
        _pos(1, 3, 110.3, 15.0, 3.0, 0.5, interp=1),  # synthetic, off-path
        _pos(1, 4, 110.4, 15.0, 4.0, 0.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = step_features(df)
    row4 = out.filter(F.minute("timestamp_utc") == 4).collect()[0]
    # angle computed from real points (0,0)->(2,0)->(4,0): straight = 0°,
    # NOT via the off-path synthetic point
    assert row4.path_angle_deg == 0.0
    # step distance still uses every point (continuity): row4's step is
    # from the synthetic minute-3 point
    assert row4.step_km is not None


def test_scorer_pandas_udf(spark):
    rows = [_pos(1, m, 110.0 + m / 10, 15.0, float(m), 0.0) for m in range(4)]
    df = spark.createDataFrame(rows, _SCHEMA)
    scored = score_paths(step_features(df))
    assert "path_score" in scored.columns
    vals = [r.path_score for r in scored.collect()]
    assert all(v is not None for v in vals)
