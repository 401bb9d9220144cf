"""Golden-fixture tests for the AIS preprocess chain (SURVEY §5 item 2)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.plans.preprocess import (
    kinematic_aggs,
    preprocess_from_envelope,
    preprocess_positions,
)
from streaming_data_pipeline_capstone_spark.schemas import AIS_WIRE_SCHEMA


def _wire_row(
    ts="2021-04-05 10:00:00Z",
    mmsi=229906000,
    position="POINT(110.5 15.25)",
    sog=12.5,
    cog=90.0,
    mtype=1,
    heading=90.0,
    rot=4.733,
):
    return (
        ts, mmsi, position, 0.0, sog, cog, mtype, "src", 1, 0, 0,
        "VESSEL", "Cargo", 30, heading, rot, 0,
    )


def _wire_df(spark, rows):
    return spark.createDataFrame(rows, AIS_WIRE_SCHEMA)


def test_preprocess_happy_path(spark):
    df = preprocess_positions(_wire_df(spark, [_wire_row()]))
    row = df.collect()[0]
    assert row.mmsi == 229906000
    assert row.longitude == 110.5 and row.latitude == 15.25
    assert row.timestamp_utc.hour == 10
    # ECEF at (lon=110.5, lat=15.25, h=124): N = a/sqrt(1-e2 sin^2)
    a, inv_f = 6378137.0, 298.257223563
    f = 1 / inv_f
    e2 = f * (2 - f)
    lat, lon = math.radians(15.25), math.radians(110.5)
    n = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
    assert abs(row.cartesian_x - (n + 124) * math.cos(lat) * math.cos(lon)) < 1e-6
    assert abs(row.cartesian_y - (n + 124) * math.cos(lat) * math.sin(lon)) < 1e-6


def test_preprocess_bbox_strict(spark):
    rows = [
        _wire_row(position="POINT(105.0 15.0)"),  # lon == corner → excluded (strict)
        _wire_row(position="POINT(105.1 15.0)"),  # inside
        _wire_row(position="POINT(124.0 15.0)"),  # outside
        _wire_row(position="POINT(110.0 7.0)"),  # lat == corner → excluded
        _wire_row(position="POINT(110.0 23.1)"),  # outside
    ]
    df = preprocess_positions(_wire_df(spark, rows))
    assert df.count() == 1
    assert df.collect()[0].longitude == 105.1


def test_preprocess_sentinels_and_mtype(spark):
    rows = [
        _wire_row(heading=511.0, rot=-128.0),
        _wire_row(mtype=5),  # static/voyage message → dropped
    ]
    df = preprocess_positions(_wire_df(spark, rows))
    out = df.collect()
    assert len(out) == 1
    assert out[0].true_heading is None and out[0].rate_of_turn is None


def test_rot_decode_sign_preserved(spark):
    rows = [_wire_row(rot=4.733), _wire_row(rot=-4.733)]
    df = preprocess_positions(_wire_df(spark, rows), decode_rot=True)
    vals = sorted(r.rate_of_turn for r in df.collect())
    assert abs(vals[0] + 1.0) < 1e-12 and abs(vals[1] - 1.0) < 1e-12


def test_envelope_decode_permissive_nulls(spark):
    import json

    good = dict(zip(
        [f.name for f in AIS_WIRE_SCHEMA.fields], _wire_row(), strict=True
    ))
    env = spark.createDataFrame(
        [(json.dumps(good),), ("{not json at all",)], "value string"
    )
    df = preprocess_from_envelope(env, message_type_filter=False)
    # malformed row decodes to all-null struct → fails bbox filter → dropped
    assert df.count() == 1


def test_kinematic_aggs_windows(spark):
    # 3 msgs for one vessel inside 10:00-10:02, sliding 2min/1min windows
    rows = [
        _wire_row(ts="2021-04-05 10:00:10Z", sog=10.0),
        _wire_row(ts="2021-04-05 10:00:50Z", sog=20.0),
        _wire_row(ts="2021-04-05 10:01:30Z", sog=30.0),
    ]
    agg = kinematic_aggs(preprocess_positions(_wire_df(spark, rows)))
    out = {
        (r.window.start.minute, r.window.end.minute): r.avg_speed_over_ground
        for r in agg.collect()
    }
    # windows: [09:59,10:01) avg(10,20)=15; [10:00,10:02) avg(10,20,30)=20;
    # [10:01,10:03) avg(30)=30
    assert out[(59, 1)] == 15.0
    assert out[(0, 2)] == 20.0
    assert out[(1, 3)] == 30.0
