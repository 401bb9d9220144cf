from __future__ import annotations

from pyspark.sql import functions as F


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "event_id", "ts", "value", "rn", "avg_value_last3"} == set(df.columns)


def test_last3_invariant(spark, sf_smoke):
    """State never exceeds K=3 rows per key (SURVEY §5 property 4)."""
    import __spark_entry__ as e

    df = e.queries()["flagship_last3_rolling"](spark, sf_smoke)
    per_key = df.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 3 for r in per_key)
    assert df.filter((F.col("rn") < 1) | (F.col("rn") > 3)).count() == 0


def test_flagship_oracle_match(spark, sf_oracle):
    from tools.check_oracle import canon, duck_connection

    import __spark_entry__ as e

    sdf = e.queries()["flagship_last3_rolling"](spark, sf_oracle).toPandas()
    con = duck_connection(sf_oracle)
    ddf = con.execute(e.oracle_sql()["flagship_last3_rolling"]).fetchdf()
    assert len(sdf) == len(ddf)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert canon(sdf) == canon(ddf)
