"""Probe ANN epoch-file accumulation against the compaction rule
(VERDICT r14 ask #6).

The 16-files-per-cell threshold (operators/ann_layout.MAX_EPOCH_FILES)
is shared with the dedup state indexes, but only the dedup side had a
measured probe. This tool runs the ANN side of the same experiment:

- split the corpus into ``--appends`` slices (pmod on vec_id — no count
  job) and land each as one epoch via append_cell_epoch, exactly the
  streaming ingest's write path;
- at checkpoints along the way, record max files-per-cell and the warm
  wall of the standard pruned rerank probe over the accumulated layout
  (min of 2 after a throwaway warm-up) — the read-amplification curve;
- when the rule fires (ann_compaction_due), run compact_cell_epochs and
  re-measure: files-per-cell back to 1, probe wall back in band, and
  the probe answer IDENTICAL before/after (the compaction-invisibility
  pin, asserted here too, not just in pytest).

Usage::

    python tools/bench_ann_compaction.py [--sf-dir /root/testdata/sf0.1]
        [--appends 50] [--checkpoint-every 10]
        [--out BENCH_ann_compaction_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _probe_warm(probe) -> float:
    probe()  # throwaway: plan compile + code gen
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        probe()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--appends", type=int, default=50)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_ann_compaction.json")
    )
    args = ap.parse_args()

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.ann_layout import (
        MAX_EPOCH_FILES,
        ann_compaction_due,
        append_cell_epoch,
        compact_cell_epochs,
        epoch_files_per_cell,
    )
    from streaming_data_pipeline_capstone_spark.queries.extras import (
        _pruned_rerank_topk_at,
        _serving_model,
    )
    from streaming_data_pipeline_capstone_spark.session import get_spark
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    spark = get_spark(app_name="ann-compaction-bench")
    spark.sparkContext.setLogLevel("ERROR")
    m = _serving_model(args.sf_dir)
    emb = read_table(spark, args.sf_dir, "embeddings")

    work = tempfile.mkdtemp(prefix="ann-compaction-", dir="/tmp")
    layout = os.path.join(work, "layout")
    artifact = {
        "metric": "bench_ann_compaction",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "appends": args.appends,
        "model_k": m.k,
        "nprobe": m.nprobe,
        "max_epoch_files_rule": MAX_EPOCH_FILES,
        "curve": [],
    }

    def probe():
        return _pruned_rerank_topk_at(spark, args.sf_dir, layout, 10).collect()

    due_at = None
    for e in range(args.appends):
        batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(args.appends)) == e)
        append_cell_epoch(
            spark, batch, layout, m.centroids, m.pq_books, m.pq_sub_dim, e
        )
        if due_at is None and ann_compaction_due(layout):
            due_at = e + 1
        if (e + 1) % args.checkpoint_every == 0 or e + 1 == args.appends:
            point = {
                "epochs": e + 1,
                "files_per_cell": epoch_files_per_cell(layout),
                "probe_warm_sec": _probe_warm(probe),
            }
            artifact["curve"].append(point)
            print(json.dumps(point), file=sys.stderr)

    artifact["compaction_due_fired_at_epoch"] = due_at
    assert due_at is not None, "rule never fired — raise --appends"

    before = [tuple(r) for r in probe()]
    t0 = time.monotonic()
    compact_cell_epochs(spark, layout, partitions=32)
    compact_sec = round(time.monotonic() - t0, 3)
    after = [tuple(r) for r in probe()]
    artifact["compacted"] = {
        "compact_sec": compact_sec,
        "files_per_cell": epoch_files_per_cell(layout),
        "probe_warm_sec": _probe_warm(probe),
        "identical_answer": after == before,
    }
    assert after == before, "compaction changed the probe answer"

    shutil.rmtree(work, ignore_errors=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: artifact[k] for k in ("curve", "compacted", "compaction_due_fired_at_epoch")}))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
