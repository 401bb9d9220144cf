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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-stream-curation")
    spark.range(1).count()
    print(json.dumps(run_stream_curation_bench(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
