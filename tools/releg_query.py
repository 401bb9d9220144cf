"""Dedicated per-query re-measure (the BENCH_minhash_releg recipe, made
generic — VERDICT r15 ask #8 pins ``flagship_last3_rolling`` with it).

A suite bench interleaves 39 queries per leg, so one query's min-of-3-legs
can still catch an ambient load spike. This tool isolates ONE query:
N fresh-subprocess/JVM legs, each running the driver bench's protocol for
that query alone (same deep warmup, cold once, warm = min of 2, plus a
steady-state min of 4) on an otherwise idle machine.

Usage::

    python tools/releg_query.py --query flagship_last3_rolling \
        --legs 5 --out BENCH_flagship_releg_r16.json
    python tools/releg_query.py --query X --leg      # one leg (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_leg(query: str, sf_dir: str) -> dict:
    """One fresh-JVM leg replicating bench.py's measurement protocol for
    one query: the same deep warmup (parquet scan, codegen'd
    regex/explode, hash-agg + window exchanges, broadcast join), cold
    once, then warm attempts (min of first 2 = the bench-protocol number;
    min of all 4 = steady state past whole-stage-codegen JIT depth)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    spark = get_spark(app_name=f"releg-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    langs = d.groupBy("lang").agg(F.count("*").alias("n"))
    (
        d.select("lang", F.explode(F.split(F.lower("text"), "\\s+")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w"))
            ),
        )
        .filter("r <= 5")
        .join(F.broadcast(langs), "lang")
        .count()
    )
    spark.catalog.clearCache()
    fn = all_queries()[query]
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    cold = time.perf_counter() - t0
    spark.catalog.clearCache()
    warms = []
    for _ in range(4):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warms.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.stop()
    return {
        "rows": n,
        "cold": round(cold, 3),
        "warm": round(min(warms[:2]), 3),  # the driver-bench protocol number
        "warm_steady": round(min(warms), 3),
        "warm_attempts": [round(w, 3) for w in warms],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--legs", type=int, default=5)
    ap.add_argument("--leg", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(run_leg(args.query, args.sf_dir)))
        return

    legs = []
    for i in range(args.legs):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
            out = fh.name
        try:
            with open(out, "w") as ofh:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--query",
                        args.query,
                        "--leg",
                        "--sf-dir",
                        args.sf_dir,
                    ],
                    cwd=REPO,
                    stdout=ofh,
                    timeout=1200,
                )
            assert proc.returncode == 0, proc.returncode
            with open(out) as ifh:
                legs.append(json.loads(ifh.read().strip().splitlines()[-1]))
        finally:
            os.unlink(out)
        print(f"# leg {i + 1}: {legs[-1]}", file=sys.stderr)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)

    result = {
        "metric": f"releg_{args.query}",
        "unit": "sec",
        "query": args.query,
        "legs_n": len(legs),
        "warm_median": med([leg["warm"] for leg in legs]),
        "warm_min": min(leg["warm"] for leg in legs),
        "warm_steady_median": med([leg["warm_steady"] for leg in legs]),
        "cold_median": med([leg["cold"] for leg in legs]),
        "legs": legs,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": args.sf_dir,
        "methodology": (
            "N fresh-subprocess/JVM legs, each: deep warmup, cold run, "
            "4 warm runs (warm = min of first 2 = the driver-bench "
            "protocol; warm_steady = min of all 4), clearCache between "
            "runs, idle machine"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
