"""Probe-latency evidence for the shipped PQ config (VERDICT r12 ask #4).

ANN_PQ_SWEEP_r12.json picked 32 subs x 2 dims x 64 codewords (192
bits/vec, composed recall 0.915) over 16 x 4 x 256 (128 bits/vec, 0.895)
on RECALL alone, and sim_topk_ivfpq_rerank_pruned paid 1.36x latency for
it. This tool adds the missing axis: the same serving-probe plan
(partition-pruned codes scan -> ADC shortlist -> exact re-rank) timed at
sf0.1 under BOTH configs, each on its own cell-partitioned layout built
by the identical code path, so the comparison isolates the codebook
shape. The decision (kept config + reasoning) is recorded in the
artifact and mirrored in queries/ann_config.py's provenance note.

Usage::

    python tools/ann_config_latency.py [--sf-dir /root/testdata/sf0.1]
                                       [--out ANN_CONFIG_LATENCY_r13.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
NPROBE = 5
RERANK = 100
TOP_K = 10
WARMS = 3


def _double_vecs(spark, sf_dir):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _build_layout(spark, sf_dir, centroids, books, sub_dim, out_dir):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.similarity import (
        assign_cells,
        pq_encode_cols,
    )

    vecs = _double_vecs(spark, sf_dir)
    (
        vecs.select(
            "vec_id",
            "embedding",
            assign_cells(F.col("v"), centroids).alias("cell"),
            *pq_encode_cols(F.col("v"), books, sub_dim),
        )
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_dir)
    )


def _probe(spark, layout, centroids, books, sub_dim, query):
    """The sim_topk_ivfpq_rerank_pruned plan, parametric in the codebook."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.ann_layout import (
        probe_cells_py,
    )
    from streaming_data_pipeline_capstone_spark.operators.similarity import (
        cosine,
        pq_adc_score,
    )

    probes = probe_cells_py(query, centroids, NPROBE)
    codes = [F.col(f"c{s}") for s in range(len(books))]
    surv = spark.read.parquet(layout).filter(F.col("cell").isin(probes))
    short = (
        surv.select(
            "vec_id",
            F.round(pq_adc_score(codes, query, books, sub_dim), 6).alias("d"),
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(RERANK)
    )
    qcol = F.array(*[F.lit(x) for x in query])
    raw = (
        spark.read.parquet(layout)
        .filter(F.col("cell").isin(probes))
        .select("vec_id", "embedding")
        .join(F.broadcast(short.select("vec_id")), "vec_id")
    )
    return (
        raw.select(
            "vec_id",
            F.round(
                cosine(F.transform("embedding", lambda x: x.cast("double")), qcol),
                6,
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="ANN_CONFIG_LATENCY_r13.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.similarity import (
        pq_train,
    )
    from streaming_data_pipeline_capstone_spark.queries.ann_config import (
        PQ_ITERS,
    )
    from streaming_data_pipeline_capstone_spark.queries.codebooks import (
        KMEANS_CENTROIDS,
        PQ_BOOKS,
    )
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="ann-config-latency")
    spark.range(1).count()

    # alt codebook trained the shipped way (same sample, same Lloyd)
    train = _double_vecs(spark, TRAIN_SF_DIR)
    alt_books = pq_train(train, 16, 4, 256, PQ_ITERS)

    row = (
        _double_vecs(spark, args.sf_dir)
        .filter(F.col("vec_id") == 0)
        .select("v")
        .head()
    )
    query = [float(x) for x in row[0]]

    configs = {
        "shipped_32x2_k64": (PQ_BOOKS, 2),
        "alt_16x4_k256": (alt_books, 4),
    }
    workdir = tempfile.mkdtemp(prefix="ann_config_latency_")
    results: dict[str, dict] = {}
    try:
        layouts = {}
        for name, (books, sub_dim) in configs.items():
            out = os.path.join(workdir, name)
            _build_layout(spark, args.sf_dir, KMEANS_CENTROIDS, books, sub_dim, out)
            layouts[name] = out
        for name, (books, sub_dim) in configs.items():
            plan = lambda: _probe(  # noqa: E731
                spark, layouts[name], KMEANS_CENTROIDS, books, sub_dim, query
            )
            t0 = time.time()
            top = [r.vec_id for r in plan().collect()]
            cold = time.time() - t0
            warms = []
            for _ in range(WARMS):
                spark.catalog.clearCache()
                t1 = time.time()
                plan().collect()
                warms.append(time.time() - t1)
            results[name] = {
                "cold_s": round(cold, 3),
                "warm_s": round(min(warms), 3),
                "warms": [round(w, 3) for w in warms],
                "bits_per_vector": len(books) * 6 if len(books[0]) == 64 else len(books) * 8,
                "top10": top,
            }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()

    a = results["shipped_32x2_k64"]["warm_s"]
    b = results["alt_16x4_k256"]["warm_s"]
    artifact = {
        "sf_dir": args.sf_dir,
        "plan": "partition-pruned codes scan -> ADC shortlist -> exact rerank "
                f"(nprobe={NPROBE}, rerank={RERANK}, identical code path both sides)",
        "configs": results,
        "latency_ratio_shipped_over_alt": round(a / b, 2) if b else None,
        "recall_context": "ANN_PQ_SWEEP_r12.json: composed recall 0.915 "
                          "(32x2x64) vs 0.895 (16x4x256) at the realistic "
                          "k=64 coarse index",
        "decision": None,  # filled below
    }
    if a <= b * 1.15:
        # word the decision by what the measurement actually says (VERDICT
        # r13 #5: the r13 run measured 0.70x — FASTER, not merely "within
        # 15%" — and the decision text should not undersell its evidence)
        rel = (
            f"{round(a / b, 2)}x the 16x4x256 probe latency (faster)"
            if a < b
            else f"within {round((a / b - 1) * 100)}% of 16x4x256"
        )
        artifact["decision"] = (
            f"KEEP 32x2x64: {rel} at sf0.1, and it carries +0.02 composed "
            "recall."
        )
    else:
        artifact["decision"] = (
            f"32x2x64 costs {round(a / b, 2)}x the 16x4x256 probe at sf0.1 "
            "for +0.02 composed recall — recorded for the config owner; "
            "shipped config retained pending a recall-SLA decision."
        )
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("latency_ratio_shipped_over_alt", "decision")}))
    print(json.dumps({n: {k: v for k, v in r.items() if k != "top10"}
                      for n, r in results.items()}))


if __name__ == "__main__":
    main()
