"""Dedicated streaming-rate re-measure (VERDICT r15 ask #1).

The r15 driver bench's 32-core streaming artifact read 2,458 ev/s ingest
against the >=2,800 BASELINE target, while every other measurement of the
same tree (8-core driver leg, three builder legs) read 3,700-5,200 —
i.e. the rate was captured under contention inside a 39-query suite leg.
This tool isolates the two streaming jobs: N fresh-subprocess/JVM legs,
each running ONLY tools/bench_streaming.run_streaming_bench (the exact
code path bench.py times, streaming-first in a fresh session), on an
otherwise idle machine.

Usage::

    python tools/releg_streaming.py --legs 5 --out BENCH_streaming_releg_r16.json
    python tools/releg_streaming.py --leg      # one leg (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_leg(sf_dir: str) -> dict:
    from streaming_data_pipeline_capstone_spark.session import get_spark
    from tools.bench_streaming import run_streaming_bench

    spark = get_spark(app_name="releg-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    out = run_streaming_bench(spark, sf_dir)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", type=int, default=5)
    ap.add_argument("--leg", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(run_leg(args.sf_dir)))
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
        print(
            f"# leg {i + 1}: ingest={legs[-1].get('value')} "
            f"stateful={legs[-1].get('stateful_last3_rate')}",
            file=sys.stderr,
        )

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 1)

    rates = [leg["value"] for leg in legs]
    stateful = [leg["stateful_last3_rate"] for leg in legs]
    result = {
        "metric": "streaming_releg",
        "unit": "events_per_sec",
        "legs_n": len(legs),
        "ingest_median": med(rates),
        "ingest_min": min(rates),
        "ingest_max": max(rates),
        "stateful_median": med(stateful),
        "stateful_min": min(stateful),
        "stateful_max": max(stateful),
        "baseline_target": 2800,
        "all_legs_above_target": all(r >= 2800 for r in rates),
        "per_leg_ingest": rates,
        "per_leg_stateful": stateful,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": args.sf_dir,
        "methodology": (
            "N fresh-subprocess/JVM legs, each running ONLY "
            "tools/bench_streaming.run_streaming_bench (the exact path "
            "bench.py times, streaming-first in a fresh session), idle "
            "machine, no concurrent batch suite"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
