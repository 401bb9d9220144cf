"""Batch-efficiency artifact for the multi-query ANN serving pass.

The claim sim_topk_ivfpq_multi makes is architectural: answering a
Q-query batch through ONE pruned pass costs far less than Q single-query
probes, because the codes scan, the shortlist exchange, and the JVM/plan
overheads are shared. This tool measures that claim instead of asserting
it: fresh-JVM legs (the bench_scale discipline), each timing the
single-query probe and the 3-query batch warm (min of 2 after a cold
run), reporting

    batch_efficiency = Q * t_single / t_batch

(>1 means the batch beats Q sequential probes; Q is read from the
registry's _MULTI_QIDS so the artifact tracks the shipped batch size).

Usage::

    python tools/bench_ann_batch.py [--sf-dir /root/testdata/sf0.1]
                                    [--legs 2] [--out BENCH_ann_batch_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SINGLE = "sim_topk_ivfpq_rerank_pruned"
BATCH = "sim_topk_ivfpq_multi"


BIG_Q = 32  # serving-scale batch (VERDICT r12 ask #1)


def run_leg(sf_dir: str) -> dict:
    from streaming_data_pipeline_capstone_spark.queries.extras import (
        _MULTI_QIDS,
        multi_topk_ivfpq,
    )
    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="ann-batch-bench")
    qs = all_queries()
    spark.range(1).count()  # JVM/codegen warmup
    out: dict = {"qids": list(_MULTI_QIDS), "big_q": BIG_Q}
    runners = {
        SINGLE: lambda: qs[SINGLE](spark, sf_dir),
        BATCH: lambda: qs[BATCH](spark, sf_dir),
        # serving-scale batch through the SAME broadcast-distance-table
        # plan — expression size is O(subs) regardless of Q, so this must
        # compile and its efficiency should GROW with Q
        f"batch_q{BIG_Q}": lambda: multi_topk_ivfpq(
            spark, sf_dir, list(range(BIG_Q))
        ),
    }
    for name, run in runners.items():
        t0 = time.time()
        run().count()
        cold = time.time() - t0
        warms = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            run().count()
            warms.append(time.time() - t0)
        out[name] = {"cold": round(cold, 3), "warm": round(min(warms), 3)}
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--legs", type=int, default=2)
    ap.add_argument("--out", default="BENCH_ann_batch_r12.json")
    ap.add_argument("--leg", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.leg:
        print("LEGJSON " + json.dumps(run_leg(args.sf_dir)))
        return

    legs = []
    for _ in range(args.legs):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg",
             "--sf-dir", args.sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("LEGJSON "):
                legs.append(json.loads(line[len("LEGJSON "):]))
                break
        else:
            raise SystemExit(
                f"leg subprocess produced no result:\n{proc.stdout}\n{proc.stderr}"
            )

    q = len(legs[0]["qids"])
    big_q = legs[0]["big_q"]
    t_single = min(leg[SINGLE]["warm"] for leg in legs)
    t_batch = min(leg[BATCH]["warm"] for leg in legs)
    t_big = min(leg[f"batch_q{big_q}"]["warm"] for leg in legs)
    artifact = {
        "sf_dir": args.sf_dir,
        "batch_size": q,
        "single_query_warm_s": t_single,
        "batch_warm_s": t_batch,
        "batch_efficiency": round(q * t_single / t_batch, 2),
        "big_batch_size": big_q,
        "big_batch_warm_s": t_big,
        "big_batch_efficiency": round(big_q * t_single / t_big, 2),
        "note": "efficiency = Q*t_single/t_batch on min-across-legs warm; "
                ">1 means one batched pass beats Q sequential probes; "
                "big_batch runs the same broadcast-distance-table plan at "
                f"Q={big_q} (expression size O(subs), independent of Q)",
        "legs": legs,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("batch_size", "single_query_warm_s", "batch_warm_s",
                       "batch_efficiency", "big_batch_size",
                       "big_batch_warm_s", "big_batch_efficiency")}))


if __name__ == "__main__":
    main()
