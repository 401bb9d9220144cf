"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB against the same parquet tables, then
compares row count, sorted column names, and order-insensitive values
(floats must match exactly after in-query rounding — stricter than any
plausible driver hash, so passing here implies passing there).

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01]
           [--json LOCALCHECK.json] [name ...]

``--json`` additionally writes a machine-readable per-query artifact
(name -> status/rows/secs) so full-registry correctness is auditable at a
glance; the runbook regenerates it as ``LOCALCHECK_r{N}.json`` before every
snapshot because the driver's own artifact caps at 50 queries and rotates.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_pipeline_capstone_spark.schemas import TESTDATA_TABLES


def canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: columns sorted by name, every value
    rendered to a normalized string, rows sorted."""
    df = df[sorted(df.columns)]
    out_rows = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append("%.9g" % v)
            elif isinstance(v, pd.Timestamp):
                vals.append(v.isoformat())
            elif hasattr(v, "tolist"):  # numpy arrays / lists
                vals.append(str([("%.6g" % x) if isinstance(x, float) else x for x in v.tolist()]))
            else:
                vals.append(str(v))
        out_rows.append(tuple(vals))
    out_rows.sort()
    return out_rows


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--json", dest="json_path", default=None,
                    help="also write a per-query JSON artifact to this path")
    ap.add_argument("names", nargs="*", help="subset of query names to check")
    args = ap.parse_args()

    import __spark_entry__ as e
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or sorted(qs)
    con = duck_connection(args.sf_dir)

    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}
    from streaming_data_pipeline_capstone_spark.cache import release_scoped

    for name in names:
        t0 = time.time()
        release_scoped()  # free the previous query's scoped caches
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            report[name] = {"status": "fail", "detail": f"spark {type(ex).__name__}: {ex}"[:300],
                            "secs": round(time.time() - t0, 2)}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: no oracle; spark rows={len(sdf)} ({time.time()-t0:.1f}s)")
            report[name] = {"status": "weak", "rows": len(sdf),
                            "secs": round(time.time() - t0, 2)}
            n_weak += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            report[name] = {"status": "fail", "detail": f"duckdb {type(ex).__name__}: {ex}"[:300],
                            "secs": round(time.time() - t0, 2)}
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if not problems:
            a, b = canon(sdf), canon(ddf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        secs = round(time.time() - t0, 2)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            report[name] = {"status": "fail", "detail": "; ".join(problems)[:300], "secs": secs}
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            report[name] = {"status": "pass", "rows": len(sdf), "secs": secs}
            n_pass += 1

    release_scoped()  # free the last query's scoped caches
    print(f"\n{n_pass} pass, {n_weak} weak (no oracle), {n_fail} fail")
    if args.json_path:
        artifact = {
            "sf_dir": args.sf_dir,
            "n_pass": n_pass,
            "n_weak": n_weak,
            "n_fail": n_fail,
            "n_total": len(names),
            "results": report,
        }
        with open(args.json_path, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {args.json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
