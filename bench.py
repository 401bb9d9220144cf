"""Benchmark harness — the driver's per-round BENCH entry point.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Round-7 methodology (VERDICT r6 ask #1): the committed BENCH_r06.json was a
single run generated under sandbox load and misreported the engine by up to
11x on one query (window_running_sum 1.547 s committed vs 0.165 s on an
idle re-run) — the exact noise band tools/bench_scale.py already defends
against with fresh-JVM interleaved legs. The driver bench now runs the SAME
discipline:

- the suite runs in N independent LEGS (default 2, ``--legs`` /
  ``$SPARK_GRAFT_BENCH_LEGS``), each a fresh subprocess with its own JVM,
  codegen caches, and streaming workdir;
- within a leg each query runs cold once + twice warm (reported warm =
  min of the two), with ``spark.catalog.clearCache()`` between queries;
- per-leg cleanliness gate: suite warm total must be <= cold total and no
  query may run warm > 1.25x its own cold — warm>cold is the signature of
  external load, not of query cost. A flagged leg is retried ONCE in a
  fresh subprocess; if still flagged it is kept but marked dirty;
- the reported per-query number is the MIN across legs (load spikes only
  ever ADD time), the headline ``value`` is the sum of those minima, and
  the artifact carries every per-leg sample plus the max/min spread so a
  contaminated leg is visible instead of silently averaged in;
- the streaming metric is the MAX events/s across legs for the same
  reason, with per-leg values recorded.

The headline ``value`` is the WARM suite total (promoted round 3): warm
isolates actual query work from one-time JVM startup. Cold numbers remain
under ``queries_cold`` / ``cold_total`` for continuity with BENCH_r01/r02
(whose ``value`` was the cold total).

The line also carries ``streaming`` — tools/bench_streaming.py's ingest
metrics (the one quantitative BASELINE.md target, >=2,800 events/s) — so
the per-round artifact machine-checks it. Streaming runs FIRST within each
leg: micro-batch rates measured in an aged JVM read ~40% low vs a fresh
session.

The suite covers every distinct physical shape in the engine: windowed
dedup/rank state (flagship), hash aggregation, broadcast + shuffle joins,
analytic windows, sliding event-time windows, MinHash dedup, and brute-force
similarity — the shapes whose 100 TB behavior matters most.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

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
    # round-8 addition: the end-to-end curation funnel (dedup keep-list ->
    # quality -> decontam -> pack) — the composed flagship of the LLM-ops
    # family. NOTE: warm_total/cold_total grew by this query's time vs
    # BENCH_r07 and earlier; cross-round suite comparisons must compare
    # per-query or exclude it.
    "pipeline_curation_full",
    # round-9 addition: the complete ANN serving probe (partition-pruned
    # codes scan -> ADC shortlist -> exact re-rank) at the shipped
    # 32x2/k=64 codebook — the query whose recall ANN_RECALL_r12.json
    # certifies. NOTE: totals grew again; compare per-query across rounds.
    "sim_topk_ivfpq_rerank_pruned",
    # round-9 additions: the two new trained/data-selection flagships.
    # NOTE: totals grew again; compare per-query across rounds.
    "mixture_dsir_weights",          # DSIR: broadcast hashed-ngram ratio table + doc rollup
    "quality_classifier_trained",    # damped-IRLS train + held-out score, end to end
    # round-11 backfills (VERDICT r10 ask #2): the two operators r10
    # shipped with oracles but no bench rows. NOTE: totals grew; compare
    # per-query across rounds.
    "pipeline_curation_dsir",        # funnel -> DSIR weights -> Gumbel-top-k -> pack
    "text_dup_spans_strip_hashed",   # hashed-window span strip (production twin)
    # operators NEW in round 11, benched from birth. NOTE: totals grew
    # again; compare per-query across rounds.
    "quality_lm_perplexity",         # stupid-backoff trigram LM doc scoring
    "text_bm25_topk",                # pre-filtered BM25 top-k
    "retrieval_hybrid_rrf",          # dense + sparse reciprocal rank fusion
    # operators NEW in round 12, benched from birth. NOTE: totals grew
    # again; compare per-query across rounds.
    "text_bm25_multi_topk",          # 3-query batch BM25, per-query rank window
    "corpus_health_lm_by_source",    # per-source CCNet bucket distribution
    "tokenizer_bpe_encode",          # 8-round BPE train + corpus encode
    "curation_domain_cap",           # two-phase salted per-source top-K
    "retrieval_hybrid_rrf_ann",      # hybrid RRF with the pruned ANN dense arm
    "sim_topk_ivfpq_multi",          # 3-query batched ANN serving pass
    # operators NEW in round 13, benched from birth. NOTE: totals grew
    # again; compare per-query across rounds.
    "sim_topk_ivfpq_filtered",       # predicate-filtered pruned ANN probe
    "sim_topk_ivfpq_multi_filtered", # r14: per-query predicates on the batched pass
    "text_bm25_filtered_topk",       # r14: metadata-filtered BM25 (predicate in the pruned postings scan)
    "text_qld_topk",                 # r14: Dirichlet query-likelihood over the postings layout
    "stream_text_index_ingest",      # r14: BM25 from the STREAMED postings index
    "retrieval_hybrid_rrf_multi_filtered",  # r14: per-query predicates through BOTH hybrid arms
    "retrieval_hybrid_rrf_multi",    # batched hybrid fusion (1 dense + 1 sparse pass)
    "sim_topk_ivfpq_rerank_incr",    # probe over the epoch-appended incremental index
    # operators NEW in round 15, benched from birth. NOTE: totals grew
    # again; compare per-query across rounds.
    "text_qld_multi_topk",           # r15: batched Dirichlet QLD (one union-term probe)
    "text_qld_filtered_topk",        # r15: metadata-filtered QLD (corpus-global statistics)
    "retrieval_hybrid_rrf_multi_streamed",  # r15: batched hybrid from STREAMED dense+sparse indexes
]

WARM_COLD_TOL = 1.25  # warm may exceed cold by noise, not by 25%


def run_leg(sf_dir: str) -> dict:
    """One leg: fresh session, streaming first, then cold + min-of-2 warm."""
    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="bench-leg")
    qs = all_queries()

    # Warm the JVM/codegen path once with a trivial action so q1's time
    # isn't dominated by session startup.
    spark.range(1).count()

    try:
        from tools.bench_streaming import run_streaming_bench

        streaming = run_streaming_bench(spark, sf_dir)
    except Exception as exc:  # pragma: no cover - best-effort metric
        streaming = {"error": f"{type(exc).__name__}: {exc}"}
    spark.catalog.clearCache()

    # Deep warmup (VERDICT r12 ask #7): exercise the engine paths the
    # suite leans on — parquet scan, codegen'd regex/explode, hash-agg
    # and window exchanges, a broadcast join — so the first measured
    # queries aren't paying first-use JIT/allocator cost. r12 leg 1 read
    # a 12.7 s quality_lm_perplexity warm (vs 1.2-1.6 s in other legs)
    # with only the range(1) warmup; streaming stays FIRST (its rates
    # must be read in a fresh session), the deep warmup runs after it.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    langs = d.groupBy("lang").agg(F.count("*").alias("n"))
    (
        d.select(
            "lang", F.explode(F.split(F.lower("text"), "\\s+")).alias("w")
        )
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

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        cold[name] = round(dt, 3)
        warm_attempts = []
        for _ in range(2):
            t1 = time.perf_counter()
            fn(spark, sf_dir).count()
            warm_attempts.append(time.perf_counter() - t1)
        warm[name] = round(min(warm_attempts), 3)
        rows[name] = n
        # Queries that persist() intermediates internally (e.g. minhash's
        # shingle index) must not leak cache into the next query's timing.
        spark.catalog.clearCache()
        print(
            f"# {name}: cold={dt:.3f}s warm={warm[name]:.3f}s rows={n}",
            file=sys.stderr,
        )
    spark.stop()
    return {
        "queries": warm,
        "queries_cold": cold,
        "rows": rows,
        "warm_total": round(sum(warm.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
        "streaming": streaming,
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


def spawn_leg(sf_dir: str, label: str) -> dict:
    """Run one leg in a fresh python/JVM; retry once if the gate flags it."""
    for attempt in (1, 2):
        with tempfile.NamedTemporaryFile(suffix=".json", dir=REPO, delete=False) as tf:
            out_path = tf.name
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--leg",
                    "--leg-out",
                    out_path,
                    "--sf-dir",
                    sf_dir,
                ],
                cwd=REPO,
                timeout=3600,
            )
            if proc.returncode != 0:
                raise RuntimeError(f"bench leg {label} exited {proc.returncode}")
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
                    f"# WARNING bench leg {label} still gate-flagged after retry: {gate}",
                    file=sys.stderr,
                )
            return leg
        print(f"# bench leg {label} gate-flagged ({gate}); retrying once", file=sys.stderr)
    raise AssertionError("unreachable")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="parquet table directory to bench against (first-class scale mode)",
    )
    ap.add_argument(
        "--legs",
        type=int,
        # 3 since r12 (VERDICT r11 ask #6): with 2 legs one loaded leg
        # leaves a single sample; 3 gives a meaningful median for the
        # streaming rates and per-query medians alongside the minima
        default=int(os.environ.get("SPARK_GRAFT_BENCH_LEGS", "3")),
        help="independent fresh-JVM legs; reported numbers are per-query minima",
    )
    ap.add_argument("--leg", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--leg-out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    sf_dir = args.sf_dir

    if args.leg:
        leg = run_leg(sf_dir)
        with open(args.leg_out, "w") as fh:
            json.dump(leg, fh)
        return

    legs = [spawn_leg(sf_dir, f"#{i + 1}") for i in range(max(1, args.legs))]

    names = BENCH_QUERIES
    warm = {n: min(leg["queries"][n] for leg in legs) for n in names}
    cold = {n: min(leg["queries_cold"][n] for leg in legs) for n in names}
    spread = {
        n: round(
            max(leg["queries"][n] for leg in legs)
            / max(min(leg["queries"][n] for leg in legs), 1e-9),
            2,
        )
        for n in names
    }

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    warm_median = {
        n: round(_median([leg["queries"][n] for leg in legs]), 3) for n in names
    }

    # Streaming: report the MEDIAN rate across legs (r12, VERDICT r11 ask
    # #6 — the max let one lucky leg define two rounds of drift; the
    # median is what a third leg actually stabilizes). Every leg's rate
    # is still recorded, and the max kept alongside for r11 continuity.
    stream_legs = [leg["streaming"] for leg in legs]
    rated = [s for s in stream_legs if isinstance(s.get("value"), (int, float))]
    streaming = dict(max(rated, key=lambda s: s["value"])) if rated else dict(stream_legs[0])
    if rated:
        streaming["value_max_leg"] = streaming["value"]
        streaming["value"] = round(_median([s["value"] for s in rated]), 1)
    stateful_rates = [
        s.get("stateful_last3_rate")
        for s in stream_legs
        if isinstance(s.get("stateful_last3_rate"), (int, float))
    ]
    if stateful_rates:
        streaming["stateful_last3_rate_max_leg"] = max(stateful_rates)
        streaming["stateful_last3_rate"] = round(_median(stateful_rates), 1)
    streaming["per_leg_rates"] = [s.get("value") for s in stream_legs]
    streaming["per_leg_stateful_rates"] = [
        s.get("stateful_last3_rate") for s in stream_legs
    ]

    sf = os.path.basename(sf_dir.rstrip("/")).lstrip(".").removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Full per-leg evidence goes to a SIDECAR file: the driver captures only
    # a bounded tail of stdout, and the round-7 line (with every leg sample
    # inlined) overflowed it — BENCH_r07.json recorded "parsed": null. The
    # printed line stays compact (headline + per-query warm minima); the
    # sidecar carries legs, cold samples, spreads, and the streaming detail.
    detail = {
        "queries_cold": cold,
        "queries_median": warm_median,
        "streaming": streaming,
        "legs": [
            {
                "queries": leg["queries"],
                "queries_cold": leg["queries_cold"],
                "warm_total": leg["warm_total"],
                "cold_total": leg["cold_total"],
                "gate": leg["gate"],
                "attempt": leg["attempt"],
                "streaming_rate": leg["streaming"].get("value"),
            }
            for leg in legs
        ],
        "leg_spread": spread,
        "rows": legs[0]["rows"],
        "methodology": (
            "N fresh-subprocess/JVM legs (streaming first, then cold + "
            "min-of-2 warm per query, clearCache between queries); "
            "per-leg gate warm_total<=cold_total and per-query warm<="
            "1.25x cold, one retry on violation; reported query time = "
            "min across legs (medians in queries_median), streaming rate "
            "= median across legs since r12 (max kept as value_max_leg); "
            "per-leg samples + spread recorded here"
        ),
    }
    # The committed BENCH_DETAIL.json is a round-evidence artifact and must
    # stay immutable under casual local runs (ADVICE r8): by default the
    # sidecar goes to an untracked _local file; the official round refresh
    # sets SPARK_GRAFT_BENCH_DETAIL=BENCH_DETAIL.json explicitly.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        REPO, "BENCH_DETAIL_local.json"
    )
    if not os.path.isabs(detail_path):
        detail_path = os.path.join(REPO, detail_path)
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        detail_path = None

    print(
        json.dumps(
            {
                "metric": "bench_suite_warm_total",
                "value": round(sum(warm.values()), 3),
                "unit": "sec",
                # r1/r2 artifacts put the COLD suite total in "value";
                # since r3 it is the warm total. Cross-round comparisons
                # must use cold_total vs old value, or warm vs warm.
                "metric_note": (
                    "value=warm since r3; min over fresh-JVM legs since r7; "
                    "suite +pipeline_curation_full since r8, "
                    "+sim_topk_ivfpq_rerank_pruned +mixture_dsir_weights "
                    "+quality_classifier_trained since r9 (compare "
                    "per-query across rounds, not totals); legs_n=3 and "
                    "streaming/stateful rates = 3-leg MEDIAN since r12 "
                    "(r11 and earlier reported the max leg — compare "
                    "against streaming.value_max_leg in the detail)"
                ),
                "queries": warm,
                "queries_median": warm_median,
                "cold_total": round(sum(cold.values()), 3),
                "streaming_rate": streaming.get("value"),
                "stateful_rate": streaming.get("stateful_last3_rate"),
                "sf": sf_val,
                "legs_n": len(legs),
                "leg_spread_max": max(spread.values()),
                "all_legs_clean": all(leg["gate"]["clean"] for leg in legs),
                "detail": os.path.basename(detail_path) if detail_path else None,
            }
        )
    )


if __name__ == "__main__":
    main()
