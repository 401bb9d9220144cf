"""Dtype-parity gate between Spark outputs and their DuckDB oracles.

The driver's correctness hash is dtype/repr-sensitive: round 2's only red
row (`text_quality_gopher`) had VALUE-identical outputs that hashed apart
because DuckDB promoted `SUM(BIGINT)` to HUGEINT (pandas float64) while
Spark emitted int64 — `123.0` vs `123`. The local value checker
(`tools/check_oracle.py`) string-normalizes per value and provably misses
this class, so this test closes the gap: for every oracle-backed registry
query, the pandas dtype KIND of each output column must match between
`df.toPandas()` (Spark) and `con.fetchdf()` (DuckDB).

Kind-level (numpy ``dtype.kind``) is the right altitude:

- int vs float (`i` vs `f`) is exactly the HUGEINT failure — caught.
- int vs object (HUGEINT out of float range → Python int) — caught.
- a Spark int column silently going nullable-float (nulls introduced
  upstream) while the oracle stays int — caught.
- int32 vs int64 (`i` vs `i`) reprs identically ("123") — allowed.
- datetime64[ns] vs datetime64[us] both render isoformat — allowed.

Runs at sf0.001 so the sweep stays cheap; dtypes don't depend on SF.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tools.check_oracle import duck_connection

SF = "/root/testdata/sf0.001"

_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()
_ORACLE_BACKED = sorted(n for n in _QUERIES if n in _ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_output_dtype_kinds_match(spark, duck, name):
    sdf = _QUERIES[name](spark, SF).toPandas()
    ddf = duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns), "column sets diverged"
    mismatches = {}
    for col in sdf.columns:
        sk = sdf[col].dtype.kind
        dk = ddf[col].dtype.kind
        # Empty/all-null columns surface as object on one side at tiny SF;
        # only flag mismatches where both sides actually carry typed data.
        if sk != dk:
            if (sk == "O" and sdf[col].isna().all()) or (
                dk == "O" and ddf[col].isna().all()
            ):
                continue
            mismatches[col] = (str(sdf[col].dtype), str(ddf[col].dtype))
    assert not mismatches, (
        f"{name}: dtype drift spark vs oracle (driver hash would diverge): "
        f"{mismatches}"
    )
