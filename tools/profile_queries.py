"""Per-query phase profiler for the optimization rounds (guide §1).

For each named registry query, splits wall time into:

- build_s:   qs[name](spark, sf_dir) — DataFrame construction, which for
  some queries includes real driver work (collect()s for tiny model rows,
  layout ensure-checks, IRLS training jobs);
- plan_s:    analysis + optimization + physical planning (forced via
  queryExecution().executedPlan());
- exec_s:    the action. Default ``--action count`` matches bench.py's
  timed action; ``--action noop`` uses the noop sink (guide §1.4) which
  computes every column.

and counts the Spark jobs each phase submitted (statusTracker under a
per-phase job group). Queries run warm: one untimed full run first.

Usage:
  python tools/profile_queries.py [--sf-dir DIR] [--action count|noop] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--action", choices=("count", "noop"), default="count")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    qs = all_queries()
    spark.range(1).count()

    def njobs_since(mark: int) -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return len([j for j in ids if j > mark])

    def last_job() -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else -1

    results = {}
    for name in args.names:
        fn = qs[name]
        # warmup (cold run): codegen + any disk-layout builds
        fn(spark, args.sf_dir).count()
        spark.catalog.clearCache()

        m0 = last_job()
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t1 = time.perf_counter()
        jobs_build = njobs_since(m0)

        m1 = last_job()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        jobs_plan = njobs_since(m1)

        m2 = last_job()
        if args.action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        t3 = time.perf_counter()
        jobs_exec = njobs_since(m2)
        spark.catalog.clearCache()

        results[name] = {
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec_s": round(t3 - t2, 3),
            "total_s": round(t3 - t0, 3),
            "jobs": [jobs_build, jobs_plan, jobs_exec],
        }
        print(f"# {name}: build={t1-t0:.3f} plan={t2-t1:.3f} exec={t3-t2:.3f} "
              f"jobs={jobs_build}/{jobs_plan}/{jobs_exec}", file=sys.stderr)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
