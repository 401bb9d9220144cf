"""Scale-proof bench: per-query scaling exponents across a 10x decade,
with a methodology that can defend its own numbers.

The verdict question is not "is sf0.1 fast" but "what happens at 10x /
100x". Round-4 ran both SFs in ONE JVM and produced an internally
inconsistent artifact (ref-leg warm > cold, sf0.1 numbers up to 5x off
the driver bench — GC/memory interference between legs). Round-5
methodology fixes that (VERDICT r4 ask #1):

- every leg runs in a FRESH subprocess (own JVM, own codegen caches);
- legs are A/B/A interleaved: ref(sf0.1) -> target(sf1) -> ref(sf0.1),
  and the reference timing is the per-query MIN of the two ref legs, so
  a load spike during one ref leg cannot fake a negative exponent;
- per-leg sanity gate: suite warm total must be <= cold total, and any
  query with warm > 1.25x cold is flagged (warm>cold is the signature of
  interference, not of real query cost);
- cross-check gate: the ref leg is compared per-query against the most
  recent driver bench artifact (--driver-bench); ratios outside
  [1/1.5, 1.5] are listed as outliers rather than silently averaged in.

Exponent(q) = log(t_target / t_ref) / log(data_ratio) on warm
(min-of-2) timings; <= 1 is linear-or-better. Anything materially above
1 at one decade is a plan that will not survive 100 TB and must be
diagnosed.

Coverage (VERDICT r4 ask #5): on top of ``bench.BENCH_QUERIES`` the
suite times the LLM-ops scale family — banded LSH, PQ encode + ADC
top-k (training re-runs every invocation, so the exponent covers the
full train->encode->score pipeline), duplicate clusters, and the
keep-list — the operators the 100 TB mandate leans on hardest.

Usage::

    python tools/make_sf1.py            # once, ~200 MB under .sf1/
    python tools/bench_scale.py         # writes BENCH_sf1.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench

# The similarity/dedup operators whose 100 TB behavior the mandate cares
# most about; never timed above sf0.01 before round 5.
LLMOPS_QUERIES = [
    "sim_lsh_pairs_banded",  # 16-band OR-amplified hyperplane LSH
    "emb_pq_encode",         # PQ: deterministic-Lloyd train + zero-shuffle encode
    "sim_pq_topk",           # PQ: train + encode + broadcast-ADC top-k
    "dedup_clusters",        # pointer-jumping connected components
    "dedup_keep_list",       # cluster -> representative keep/drop decision
    # VERDICT r5 ask #1b: the IVF family, previously the only heavyweight
    # ANN ops with zero scale decades
    "sim_topk_ivf",          # hyperplane-cell IVF probe (no training)
    "sim_topk_kmeans_ivf",   # trained IVF: Lloyd train + cell-pruned probe
    # VERDICT r5 ask #2: deployment-shape variants against the SHIPPED
    # codebook (train-once / probe-many — what actually runs at 100 TB)
    "emb_pq_encode_fixed",
    "sim_pq_topk_fixed",
    "sim_topk_kmeans_ivf_fixed",
    # round 6: IVF-PQ composition (coarse probe + ADC refine) and the
    # corpus-scaled banded-LSH config (occupancy-held planes, recall-held
    # bands — the knob VERDICT r5 ask #3 wanted shipped and timed)
    "sim_topk_ivfpq_fixed",
    "sim_lsh_pairs_banded_scaled",
    # round 11: spilled serving probe, LM scoring, and hybrid retrieval
    "sim_topk_ivfpq_rerank_spill",
    "quality_lm_perplexity",
    "retrieval_hybrid_rrf",
]

WARM_COLD_TOL = 1.25  # per-query warm may exceed cold by noise, not by 25%
DRIVER_RATIO_TOL = 1.5


def suite_names() -> list[str]:
    return list(bench.BENCH_QUERIES) + LLMOPS_QUERIES


def run_leg_inprocess(sf_dir: str, names: list[str]) -> dict:
    """Body of one subprocess leg: fresh session, cold + min-of-2 warm."""
    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-leg")
    spark.range(1).count()
    qs = all_queries()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
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
    spark.stop()
    return {
        "sf_dir": sf_dir,
        "queries": warm,
        "queries_cold": cold,
        "rows": rows,
        "warm_total": round(sum(warm.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
    }


def leg_gate(leg: dict) -> dict:
    """Interference signature check: warm must not exceed cold."""
    flagged = [
        n
        for n, w in leg["queries"].items()
        if w > leg["queries_cold"][n] * WARM_COLD_TOL
    ]
    return {
        "warm_total_le_cold_total": leg["warm_total"] <= leg["cold_total"],
        "warm_gt_cold_queries": flagged,
        "clean": leg["warm_total"] <= leg["cold_total"] and not flagged,
    }


def spawn_leg(sf_dir: str, names: list[str], label: str) -> dict:
    """Run one leg in a fresh python/JVM; retry once if the gate flags it."""
    for attempt in (1, 2):
        with tempfile.NamedTemporaryFile(
            suffix=".json", dir=REPO, delete=False
        ) as tf:
            out_path = tf.name
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--leg",
                    sf_dir,
                    "--leg-out",
                    out_path,
                    "--names",
                    ",".join(names),
                ],
                cwd=REPO,
                timeout=3600,
            )
            if proc.returncode != 0:
                raise RuntimeError(f"leg {label} exited {proc.returncode}")
            with open(out_path) as fh:
                leg = json.load(fh)
        finally:
            if os.path.exists(out_path):
                os.unlink(out_path)
        gate = leg_gate(leg)
        leg["gate"] = gate
        leg["attempt"] = attempt
        if gate["clean"] or attempt == 2:
            if not gate["clean"]:
                print(
                    f"# WARNING leg {label} still gate-flagged after retry: {gate}",
                    file=sys.stderr,
                )
            return leg
        print(f"# leg {label} gate-flagged ({gate}); retrying once", file=sys.stderr)
    raise AssertionError("unreachable")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--target-dir", default=os.path.join(REPO, ".sf1"))
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_sf1.json"))
    ap.add_argument(
        "--driver-bench",
        default=os.path.join(REPO, "BENCH_r05.json"),
        help="most recent driver bench artifact; ref leg is cross-checked against it",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of registry queries to bench "
        "(default: headline suite + LLM-ops family). Use for runs where "
        "part of the default suite is out of scope — e.g. the sf1->sf10 "
        "decade excludes the fixed-band similarity configs, whose bucket "
        "occupancy is a corpus-size knob (more planes per band at larger "
        "corpora), so timing the sf0.1-tuned config at 100x answers a "
        "question nobody ships",
    )
    ap.add_argument("--leg", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--leg-out", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--names", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.leg:
        leg = run_leg_inprocess(args.leg, args.names.split(","))
        with open(args.leg_out, "w") as fh:
            json.dump(leg, fh)
        return

    names = args.queries.split(",") if args.queries else suite_names()
    # A/B/A: ref, target, ref — fresh JVM each.
    ref1 = spawn_leg(args.ref_dir, names, "ref#1")
    target = spawn_leg(args.target_dir, names, "target")
    ref2 = spawn_leg(args.ref_dir, names, "ref#2")

    ref_warm = {n: min(ref1["queries"][n], ref2["queries"][n]) for n in names}
    ref_spread = {
        n: round(
            max(ref1["queries"][n], ref2["queries"][n])
            / max(min(ref1["queries"][n], ref2["queries"][n]), 1e-9),
            2,
        )
        for n in names
    }

    exponent = {}
    for n in names:
        r, t = ref_warm[n], target["queries"][n]
        if r > 0 and t > 0:
            exponent[n] = round(math.log(t / r) / math.log(args.data_ratio), 2)

    # Output-size exponent alongside the time exponent: an enumeration
    # query (pair finding) whose RESULT grows quadratically by data
    # construction cannot have a sub-linear time exponent — the honest
    # read is time-vs-output. rows_exponent > 1 flags exactly those
    # queries; compare exponent to rows_exponent, not to 1.0, for them.
    rows_exponent = {}
    for n in names:
        rr, tr = ref1["rows"].get(n, 0), target["rows"].get(n, 0)
        if rr > 0 and tr > 0:
            rows_exponent[n] = round(math.log(tr / rr) / math.log(args.data_ratio), 2)

    driver_check: dict = {"artifact": None}
    if args.driver_bench and os.path.exists(args.driver_bench):
        with open(args.driver_bench) as fh:
            driver = json.load(fh)
        # Driver artifacts wrap bench.py's JSON line under "parsed";
        # standalone runs of bench.py emit "queries" at top level.
        dq = driver.get("queries") or (driver.get("parsed") or {}).get("queries", {})
        outliers = {}
        for n in names:
            if n in dq and dq[n] > 0 and ref_warm[n] > 0:
                ratio = ref_warm[n] / dq[n]
                if ratio > DRIVER_RATIO_TOL or ratio < 1.0 / DRIVER_RATIO_TOL:
                    outliers[n] = {
                        "ref_warm": ref_warm[n],
                        "driver_warm": dq[n],
                        "ratio": round(ratio, 2),
                    }
        driver_check = {
            "artifact": os.path.basename(args.driver_bench),
            "tolerance": DRIVER_RATIO_TOL,
            "n_compared": len(set(names) & set(dq)),
            "outliers": outliers,
        }

    target_label = os.path.basename(args.target_dir.rstrip("/")).lstrip(".")
    out = {
        "metric": f"bench_suite_warm_total_{target_label}",
        "value": target["warm_total"],
        "unit": "sec",
        "sf": {"sf1": 1.0, "sf10": 10.0, "sf100": 100.0}.get(target_label, target_label),
        "data_ratio": args.data_ratio,
        "queries": target["queries"],
        "queries_cold": target["queries_cold"],
        "cold_total": target["cold_total"],
        "rows": target["rows"],
        "target_gate": target["gate"],
        "ref": {
            "sf_dir": args.ref_dir,
            "queries": ref_warm,
            "leg1": {k: ref1[k] for k in ("queries", "queries_cold", "warm_total", "cold_total", "gate", "attempt")},
            "leg2": {k: ref2[k] for k in ("queries", "queries_cold", "warm_total", "cold_total", "gate", "attempt")},
            "leg_spread_max": max(ref_spread.values()),
            "leg_spread": ref_spread,
            "rows": ref1["rows"],
        },
        "driver_bench_check": driver_check,
        "scaling_exponent": exponent,
        "rows_exponent": rows_exponent,
        "methodology": (
            "A/B/A legs (ref, target, ref), each a fresh subprocess/JVM; "
            "ref timing = per-query min of the two ref legs; per-leg gate "
            "warm_total<=cold_total (retry once on violation); ref leg "
            "cross-checked against the driver bench within 1.5x. "
            "exponent = log(t_sf1/t_sf0.1)/log(10) on warm min-of-2 "
            "timings; <=1 linear-or-better. sf1 data from tools/make_sf1.py "
            "(10x key-space replication, fixed dims constant)."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(
        json.dumps(
            {
                "value": out["value"],
                "cold_total": out["cold_total"],
                "scaling_exponent": exponent,
                "ref_leg_spread_max": out["ref"]["leg_spread_max"],
                "driver_outliers": list(driver_check.get("outliers", {})),
            }
        )
    )


if __name__ == "__main__":
    main()
