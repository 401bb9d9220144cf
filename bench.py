"""Benchmark harness — the driver's per-round BENCH entry point.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + result drain via a
count over the full result — no driver-side collect of wide data).

Each query runs THREE times: the first (cold) pass pays Catalyst analysis,
codegen compilation, and file-listing caches; the two warm passes re-plan +
re-execute with those JVM caches hot, and the reported warm number is the
MIN of the two. The headline ``value`` is the WARM suite total (promoted
round 3): driver cold totals swung ±25% on sandbox load with zero plan
change in rounds 1→2, so warm — which isolates actual query work from
one-time JVM startup and load spikes — is the number whose round-over-round
delta reflects plans. Cold numbers remain under ``queries_cold`` /
``cold_total`` for continuity with BENCH_r01/r02 (whose ``value`` was the
cold total). ``spark.catalog.clearCache()`` runs between queries so a query
that persists intermediates internally can't leak cache into the next
query's timing.

The line also carries ``streaming`` — tools/bench_streaming.py's ingest
metrics (the one quantitative BASELINE.md target, ≥2,800 events/s) — so the
per-round artifact machine-checks it.

The suite covers every distinct physical shape in the engine: windowed
dedup/rank state (flagship), hash aggregation, broadcast + shuffle joins,
analytic windows, sliding event-time windows, MinHash dedup, and brute-force
similarity — the shapes whose 100 TB behavior matters most.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_data_pipeline_capstone_spark.registry import all_queries
from streaming_data_pipeline_capstone_spark.session import get_spark

# Headline suite: one representative per physical shape, heaviest inputs.
BENCH_QUERIES = [
    "flagship_last3_rolling",   # window rank + rolling avg over events
    "pipeline_preprocess_full", # reference entry point B end-to-end (JSON→geo→clean)
    "pipeline_predict_full",    # reference entry point C end-to-end (rank→features→score)
    "agg_pricing_summary",      # TPC-H Q1-shaped hash agg over lineitem
    "join_regional_revenue",    # TPC-H Q5-shaped multi-join
    "join_topk_orders",         # join + per-group top-k window
    "window_running_sum",       # analytic window over orders
    "stream_sliding_per_key",   # sliding event-time window agg over events
    "dedup_minhash_lsh",        # shingle → minhash → band join over documents
    "sim_topk_bruteforce",      # cosine top-k over embeddings
    "scalar_clean_filter",      # scalar/filter pipeline over events
    # round-3 additions: two more distinct physical shapes
    "text_quality_gopher",      # explode fan-out absorbed by partial agg
    "decontam_ngram_overlap",   # broadcast eval-gram join over corpus grams
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="parquet table directory to bench against (first-class scale mode)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    spark = get_spark(app_name="bench")
    qs = all_queries()

    # Warm the JVM/codegen path once with a trivial action so q1's time
    # isn't dominated by session startup.
    spark.range(1).count()

    # Streaming bench runs FIRST: micro-batch rates measured in an aged JVM
    # (after 33 batch query executions) read ~40% low vs a fresh session —
    # front-running it keeps the metric comparable to a standalone
    # tools/bench_streaming.py run.
    try:
        from tools.bench_streaming import run_streaming_bench

        streaming = run_streaming_bench(spark, sf_dir)
    except Exception as exc:  # pragma: no cover - best-effort metric
        streaming = {"error": f"{type(exc).__name__}: {exc}"}
    spark.catalog.clearCache()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    cold_total = 0.0
    warm_total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        cold[name] = round(dt, 3)
        cold_total += dt
        warm_attempts = []
        for _ in range(2):
            t1 = time.perf_counter()
            fn(spark, sf_dir).count()
            warm_attempts.append(time.perf_counter() - t1)
        dw = min(warm_attempts)
        warm[name] = round(dw, 3)
        warm_total += dw
        # Queries that persist() intermediates internally (e.g. minhash's
        # shingle index) must not leak cache into the next query's timing.
        spark.catalog.clearCache()
        print(f"# {name}: cold={dt:.3f}s warm={dw:.3f}s rows={n}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).lstrip(".").removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "bench_suite_warm_total",
                "value": round(warm_total, 3),
                "unit": "sec",
                # r1/r2 artifacts put the COLD suite total in "value";
                # since r3 it is the warm total. Cross-round comparisons
                # must use cold_total vs old value, or warm vs warm.
                "metric_note": "value=warm since r3; compare cold_total to r1/r2 value",
                "queries": warm,
                "queries_cold": cold,
                "cold_total": round(cold_total, 3),
                "streaming": streaming,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
