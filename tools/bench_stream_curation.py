"""Throughput of the streaming curation-verdict job (r11).

Measures the end-to-end foreachBatch verdict pipeline
(streaming/curation_stream.py) — fingerprint dedup against the persistent
index + composite quality rules + trained-model score + PII scrub, with
idempotent epoch-partitioned verdict/state writes — over the documents
table replayed as a multi-micro-batch file stream. The quality model is
fit offline first (excluded from the measured window, as in production);
throughput = docs / wall-clock from query start to availableNow drain.

Prints ONE JSON line: {"metric": "stream_curation_rate", "value": N,
"unit": "docs_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_pipeline_capstone_spark.queries.quality import fit_quality_model
from streaming_data_pipeline_capstone_spark.session import get_spark
from streaming_data_pipeline_capstone_spark.sources.readers import read_table
from streaming_data_pipeline_capstone_spark.sources.replay import (
    replay_to_files,
    stream_from_replay,
)
from streaming_data_pipeline_capstone_spark.streaming.curation_stream import (
    read_index,
    start_verdict_stream,
)

NUM_CHUNKS = int(os.environ.get("SPARK_GRAFT_STREAM_CHUNKS", "10"))


def run_stream_curation_bench(spark, sf_dir: str) -> dict:
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # per-micro-batch frames are corpus/NUM_CHUNKS docs; small shuffle
    # fan-out wins (same sizing note as bench_streaming)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_docs = docs.count()
    beta = fit_quality_model(spark, sf_dir)  # offline — outside the window

    workdir = tempfile.mkdtemp(prefix="bench_stream_curation_")
    try:
        replay_dir = os.path.join(workdir, "replay")
        schema = replay_to_files(docs, replay_dir, NUM_CHUNKS, order_col="doc_id")
        stream = stream_from_replay(spark, replay_dir, schema)
        out_dir = os.path.join(workdir, "verdicts")

        t0 = time.perf_counter()
        q = start_verdict_stream(
            stream,
            beta,
            out_dir,
            os.path.join(workdir, "state"),
            os.path.join(workdir, "ckpt"),
        )
        q.awaitTermination()
        elapsed = time.perf_counter() - t0
        batches = len([p for p in q.recentProgress if p.get("numInputRows", 0) > 0])
        n_out = read_index(spark, out_dir).count()
        assert n_out == n_docs, f"verdicts {n_out} != docs {n_docs}"

        return {
            "metric": "stream_curation_rate",
            "value": round(n_docs / elapsed, 1),
            "unit": "docs_per_sec",
            "docs": n_docs,
            "elapsed_sec": round(elapsed, 3),
            "micro_batches": batches,
            "docs_per_batch": n_docs // NUM_CHUNKS,
            "sf_dir": sf_dir,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _phase_batch_times(progresses) -> list[float]:
    """Per-micro-batch trigger-execution seconds (data batches only)."""
    return [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in progresses
        if p.get("numInputRows", 0) > 0
    ]


def run_stream_curation_scale_probe(spark, sf_dir: str) -> dict:
    """The Θ(batch)-vs-Θ(history) probe (VERDICT r11 ask #1): drain a
    DOUBLED corpus in two phases against one persistent fingerprint index
    — phase 1 grows the index 0→N docs, phase 2 N→2N with identical
    per-batch doc counts — and compare per-batch wall time. With the
    bucket-pruned state reads, phase-2 batches join against only the
    bucket slivers they touch, so per-batch cost stays flat as history
    doubles; an unpruned implementation would re-read the whole index
    every batch and phase 2 would climb.

    r13 (VERDICT r12 ask #2): the stream is started with
    ``expected_batch_docs`` so the bucket fan-out comes from the RULE
    (state_bucket_prefix_len) — fan-out ≫ per-batch distinct prefixes —
    and the artifact records the measured touched-bucket and files-read
    fractions of the final batch against the full index."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_docs = docs.count()
    shift = docs.agg({"doc_id": "max"}).collect()[0][0] + 1
    from pyspark.sql import functions as F

    doubled = docs.unionByName(
        docs.select(
            (F.col("doc_id") + F.lit(shift)).alias("doc_id"), "lang", "text"
        )
    )
    beta = fit_quality_model(spark, sf_dir)

    workdir = tempfile.mkdtemp(prefix="bench_stream_scale_")
    try:
        replay_dir = os.path.join(workdir, "replay")
        schema = replay_to_files(
            doubled, replay_dir, 2 * NUM_CHUNKS, order_col="doc_id"
        )
        # hide the back half (the shifted copy) for phase 1
        hidden = os.path.join(workdir, "hidden")
        os.makedirs(hidden)
        back = [f"chunk={i:05d}" for i in range(NUM_CHUNKS, 2 * NUM_CHUNKS)]
        for c in back:
            shutil.move(os.path.join(replay_dir, c), os.path.join(hidden, c))

        out_dir = os.path.join(workdir, "verdicts")
        state_dir = os.path.join(workdir, "state")
        ckpt = os.path.join(workdir, "ckpt")
        batch_docs = n_docs // NUM_CHUNKS

        def drain():
            t0 = time.perf_counter()
            q = start_verdict_stream(
                stream_from_replay(spark, replay_dir, schema),
                beta,
                out_dir,
                state_dir,
                ckpt,
                expected_batch_docs=batch_docs,
            )
            q.awaitTermination()
            return time.perf_counter() - t0, _phase_batch_times(q.recentProgress)

        e1, t1 = drain()
        for c in back:
            shutil.move(os.path.join(hidden, c), os.path.join(replay_dir, c))
        e2, t2 = drain()
        assert read_index(spark, out_dir).count() == 2 * n_docs

        # pruning-fraction audit: what the FINAL batch would touch vs the
        # full index (listing and file counts) under the rule's fan-out
        from pyspark.sql import functions as F  # noqa: F811

        from streaming_data_pipeline_capstone_spark.operators.textstats import (
            fingerprint,
        )
        from streaming_data_pipeline_capstone_spark.streaming.curation_stream import (
            _fp_bucket,
        )
        from streaming_data_pipeline_capstone_spark.streaming.dedup_stream import (
            state_bucket_prefix_len,
        )

        fp_path = os.path.join(state_dir, "fp_min")
        full = spark.read.parquet(fp_path)
        all_files = full.inputFiles()
        n_buckets = full.select("bkt").distinct().count()
        prefix_len = state_bucket_prefix_len(batch_docs)
        last = doubled.orderBy(F.desc("doc_id")).limit(batch_docs)
        touched = [
            r[0]
            for r in last.select(
                _fp_bucket(fingerprint("text"), prefix_len).alias("b")
            )
            .distinct()
            .collect()
        ]
        touched_files = [
            f for f in all_files if any(f"/bkt={b}/" in f for b in touched)
        ]
        mean1 = sum(t1) / max(len(t1), 1)
        mean2 = sum(t2) / max(len(t2), 1)
        return {
            "fanout_rule": {
                "expected_batch_docs": batch_docs,
                "fp_prefix_len": prefix_len,
                "fanout": 16 ** prefix_len,
                "index_buckets_present": n_buckets,
                "last_batch_touched_buckets": len(touched),
                "touched_bucket_frac": round(len(touched) / max(n_buckets, 1), 3),
                "index_files": len(all_files),
                "last_batch_files_read": len(touched_files),
                "files_read_frac": round(
                    len(touched_files) / max(len(all_files), 1), 3
                ),
            },
            "metric": "stream_curation_scale_probe",
            "unit": "sec_per_batch",
            "value": round(mean2 / mean1, 3),
            "note": (
                "value = phase2/phase1 mean per-batch seconds; phase 2 "
                "ingests the same per-batch doc count against an index "
                "holding the full phase-1 corpus — ~1.0 means per-batch "
                "cost is flat in history (bucket-pruned state reads)"
            ),
            "docs_per_phase": n_docs,
            "batches_per_phase": NUM_CHUNKS,
            "phase1": {
                "elapsed_sec": round(e1, 3),
                "mean_batch_sec": round(mean1, 3),
                "batch_sec": [round(x, 3) for x in t1],
            },
            "phase2": {
                "elapsed_sec": round(e2, 3),
                "mean_batch_sec": round(mean2, 3),
                "batch_sec": [round(x, 3) for x in t2],
            },
            "sf_dir": sf_dir,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-stream-curation")
    spark.range(1).count()
    if "--scale-probe" in sys.argv:
        print(json.dumps(run_stream_curation_scale_probe(spark, sf_dir)))
    else:
        print(json.dumps(run_stream_curation_bench(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
