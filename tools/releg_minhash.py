"""Dedicated re-measure of dedup_minhash_lsh (VERDICT r13 ask #6).

The r13 driver bench read its median at 2.207 s vs r12's 1.573 s (1.40x)
with NO plan change (PLANS.md unchanged, shuffle budget green) — past the
usual load-noise band. This tool pins the regression as noise or real:
5 fresh-subprocess/JVM legs, each running the query once cold and once
warm at the driver-bench config (sf0.1, local[$SPARK_GRAFT_CPUS]), on an
otherwise idle machine. Medians land in BENCH_minhash_releg_r14.json
next to the r12/r13 reference numbers.

Usage::

    python tools/releg_minhash.py            # orchestrates 5 legs
    python tools/releg_minhash.py --leg      # one leg (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY = "dedup_minhash_lsh"
N_LEGS = 5
R12_MEDIAN, R13_MEDIAN = 1.573, 2.207


def run_leg(sf_dir: str) -> dict:
    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="releg-minhash", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    fn = all_queries()[QUERY]
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    warm = time.perf_counter() - t0
    spark.stop()
    return {"cold": round(cold, 3), "warm": round(warm, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--leg" in sys.argv:
        print(json.dumps(run_leg(sf_dir)))
        return
    legs = []
    for i in range(N_LEGS):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
            out = fh.name
        try:
            with open(out, "w") as ofh:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--leg"],
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
        return round(
            s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3
        )

    warm_med = med([leg["warm"] for leg in legs])
    verdict = (
        "noise: r14 idle-machine median is back in the r12 band"
        if warm_med <= R12_MEDIAN * 1.15
        else "REAL: the slowdown reproduces on an idle machine — investigate"
    )
    print(
        json.dumps(
            {
                "metric": "dedup_minhash_lsh_releg",
                "unit": "sec",
                "value": warm_med,
                "legs": legs,
                "warm_median": warm_med,
                "cold_median": med([leg["cold"] for leg in legs]),
                "reference": {
                    "r12_driver_median": R12_MEDIAN,
                    "r13_driver_median": R13_MEDIAN,
                    "r13_vs_r12": round(R13_MEDIAN / R12_MEDIAN, 2),
                },
                "verdict": verdict,
                "sf_dir": sf_dir,
                "n_legs": N_LEGS,
            }
        )
    )


if __name__ == "__main__":
    main()
