"""Scale-proof bench: run the headline suite at two SFs in ONE session
and record the per-query scaling exponent.

The verdict question is not "is sf0.1 fast" but "what happens at 10x /
100x". This harness runs every ``bench.BENCH_QUERIES`` query at a
reference dir (default sf0.1) and a target dir (default the
``tools/make_sf1.py`` output, 10x the rows), in the same JVM so
codegen/file-listing caches are equally warm for both, and reports

    exponent(q) = log(t_target / t_ref) / log(data_ratio)

on the warm (min-of-2) timings. exponent <= 1 is linear-or-better;
anything materially above 1 at one decade is a plan that will not
survive 100 TB and must be diagnosed.

Usage::

    python tools/make_sf1.py            # once, ~200 MB under .sf1/
    python tools/bench_scale.py         # writes BENCH_sf1.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from streaming_data_pipeline_capstone_spark.registry import all_queries
from streaming_data_pipeline_capstone_spark.session import get_spark


def run_suite(spark, sf_dir: str) -> tuple[dict, dict, dict]:
    qs = all_queries()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in bench.BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        attempts = []
        for _ in range(2):
            t1 = time.perf_counter()
            fn(spark, sf_dir).count()
            attempts.append(time.perf_counter() - t1)
        warm[name] = round(min(attempts), 3)
        rows[name] = n
        spark.catalog.clearCache()
        print(
            f"# {os.path.basename(sf_dir)} {name}: cold={cold[name]:.3f}s "
            f"warm={warm[name]:.3f}s rows={n}",
            file=sys.stderr,
        )
    return cold, warm, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--target-dir", default=os.path.join(REPO, ".sf1"))
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_sf1.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="bench-scale")
    spark.range(1).count()

    ref_cold, ref_warm, ref_rows = run_suite(spark, args.ref_dir)
    tgt_cold, tgt_warm, tgt_rows = run_suite(spark, args.target_dir)

    exponent = {}
    for name in bench.BENCH_QUERIES:
        r, t = ref_warm[name], tgt_warm[name]
        if r > 0 and t > 0:
            exponent[name] = round(math.log(t / r) / math.log(args.data_ratio), 2)

    out = {
        "metric": "bench_suite_warm_total_sf1",
        "value": round(sum(tgt_warm.values()), 3),
        "unit": "sec",
        "sf": 1.0,
        "data_ratio": args.data_ratio,
        "queries": tgt_warm,
        "queries_cold": tgt_cold,
        "cold_total": round(sum(tgt_cold.values()), 3),
        "rows": tgt_rows,
        "ref": {
            "sf_dir": args.ref_dir,
            "queries": ref_warm,
            "queries_cold": ref_cold,
            "warm_total": round(sum(ref_warm.values()), 3),
            "cold_total": round(sum(ref_cold.values()), 3),
            "rows": ref_rows,
        },
        "scaling_exponent": exponent,
        "note": (
            "exponent = log(t_sf1/t_sf0.1)/log(10) on warm timings; "
            "<=1 linear-or-better. sf1 data from tools/make_sf1.py "
            "(10x key-space replication, fixed dims constant)."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("value", "cold_total", "scaling_exponent")}))
    spark.stop()


if __name__ == "__main__":
    main()
