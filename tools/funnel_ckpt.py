"""Single-plan vs checkpointed curation funnel: the wall/IO comparison
artifact (VERDICT r8 ask #3).

Runs `pipeline_curation_full` (one declarative plan) and
`plans/curation_ckpt.run_checkpointed_funnel` (stage verdicts persisted
to parquet between jobs — the 100 TB execution shape) at the same SF,
verifies the packed bins are row-identical, and records per-stage wall
clock plus checkpoint bytes.

Usage: python tools/funnel_ckpt.py [--sf-dir /root/testdata/sf0.1]
                                   [--out FUNNEL_CKPT_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_data_pipeline_capstone_spark.plans.curation_ckpt import (
    STAGES,
    checkpoint_stage_verdicts,
    packed_bins_from_checkpoint,
)
from streaming_data_pipeline_capstone_spark.registry import all_queries
from streaming_data_pipeline_capstone_spark.session import get_spark


def _tree_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=os.path.join(REPO, "FUNNEL_CKPT_r09.json"))
    ap.add_argument(
        "--scratch", default=os.path.join(REPO, ".funnel_ckpt"), help="checkpoint dir"
    )
    args = ap.parse_args()

    spark = get_spark(app_name="funnel-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # single-plan shape
    t0 = time.time()
    single_rows = sorted(
        tuple(r) for r in qs["pipeline_curation_full"](spark, args.sf_dir).collect()
    )
    single_wall = time.time() - t0
    spark.catalog.clearCache()

    # checkpointed shape, stage by stage
    shutil.rmtree(args.scratch, ignore_errors=True)
    t0 = time.time()
    # plant=True: this tool compares against the registered planted gate
    paths = checkpoint_stage_verdicts(spark, args.sf_dir, args.scratch, plant=True)
    ckpt_stage_wall = time.time() - t0
    t0 = time.time()
    ckpt_rows = sorted(
        tuple(r)
        for r in packed_bins_from_checkpoint(spark, args.sf_dir, paths).collect()
    )
    ckpt_pack_wall = time.time() - t0

    stage_bytes = {s: _tree_bytes(paths[s]) for s in STAGES}
    corpus_bytes = _tree_bytes(os.path.join(args.sf_dir, "documents.parquet"))

    result = {
        "sf_dir": args.sf_dir,
        "rows_match": single_rows == ckpt_rows,
        "n_bins": len(single_rows),
        "single_plan_wall_sec": round(single_wall, 3),
        "checkpointed_wall_sec": round(ckpt_stage_wall + ckpt_pack_wall, 3),
        "checkpointed_stage_wall_sec": round(ckpt_stage_wall, 3),
        "checkpointed_pack_wall_sec": round(ckpt_pack_wall, 3),
        "checkpoint_bytes": stage_bytes,
        "checkpoint_bytes_total": sum(stage_bytes.values()),
        "documents_parquet_bytes": corpus_bytes,
        "checkpoint_to_corpus_ratio": round(
            sum(stage_bytes.values()) / max(corpus_bytes, 1), 4
        ),
        "note": (
            "checkpointed = each stage verdict persisted to parquet and "
            "every consumer reads the materialized frame (the 100 TB "
            "shape); single_plan recomputes shared stages inside one "
            "declarative plan. Row-identity is asserted, not assumed."
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    if not result["rows_match"]:
        raise SystemExit("row mismatch between funnel shapes")


if __name__ == "__main__":
    main()
