"""ADC-recall sweep at the realistic coarse index (VERDICT r11 ask #4).

ANN_RECALL_r11.json showed pure IVF-PQ ADC plateauing at 0.415 recall@10
regardless of nprobe — the shipped 16x4/k=64 codebook, not the probe, is
the binding constraint, and the exact re-rank stage carries the composed
0.85. This tool sweeps the two public levers the verdict names:

- pq_k -> 256 (8 bits/sub instead of 6; still 8x compression headroom at
  128 bits/vector), and more sub-quantizers (32x2);
- a FIXED PCA rotation with eigenvalue-balanced subspace allocation (the
  parametric variant of Ge et al.'s Optimized Product Quantization:
  rotate once with a deterministic data-trained orthonormal matrix,
  greedily permute components so every subspace carries ~equal log-
  variance). The rotation is orthonormal, so exact distances are
  unchanged; only the ENCODING space rotates. Shipped, it would be a
  64x64 literal model constant, oracle-expressible like the centroids.

Every variant is evaluated exactly as ANN_RECALL_r11.json: the sf1
rotate-dup corpus (20k vectors), coarse index k=64 cells trained with
the engine's deterministic Lloyd on the 1-in-10 sample, spill=2
multi-assignment, nprobe=16 (probed fraction 0.25), 20 spread queries,
recall@10 vs exact cosine. PQ training itself runs through the ENGINE's
pq_train (Spark), on the (rotated) sample, so a winning config ships
without retraining-semantics drift.

Usage::

    python tools/ann_pq_sweep.py            # writes ANN_PQ_SWEEP_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ann_recall import (  # noqa: E402
    _adc_scores,
    _bits,
    _encode,
    _load,
    _topk_ids,
)

DIM = 64
TOP_K = 10
PQ_ITERS = 3
KMEANS_K, KMEANS_ITERS = 64, 5
SPILL, NPROBE = 2, 16
RERANKS = (100, 200)


def pca_balanced_rotation(train: np.ndarray, subs: int, sub_dim: int) -> np.ndarray:
    """Deterministic orthonormal rotation: PCA eigenvectors (descending
    eigenvalue, sign fixed by making each vector's max-|component|
    positive) permuted by greedy eigenvalue balancing so each subspace
    receives ~equal log-variance (Ge et al. 2013, parametric OPQ)."""
    X = train - train.mean(axis=0)
    C = X.T @ X / len(X)
    w, V = np.linalg.eigh(C)
    order = np.argsort(-w)
    w, V = w[order], V[:, order]
    for j in range(V.shape[1]):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    buckets: list[list[int]] = [[] for _ in range(subs)]
    sums = [0.0] * subs
    for j in range(len(w)):
        for s in sorted(range(subs), key=lambda s: (sums[s], s)):
            if len(buckets[s]) < sub_dim:
                buckets[s].append(j)
                sums[s] += float(np.log(max(w[j], 1e-12)))
                break
    perm = [j for b in buckets for j in b]
    return V[:, perm]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-dir", default=os.path.join(REPO, ".sf1"))
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--train-mod", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "ANN_PQ_SWEEP_r12.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.similarity import (
        lloyd_kmeans_centroids,
        pq_train,
    )
    from streaming_data_pipeline_capstone_spark.session import get_spark
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    ids, mat = _load(args.eval_dir)
    n = len(ids)
    train_mask = ids % args.train_mod == 0
    train_np = mat[train_mask]

    variants = [
        # (subs, pq_k, rotate)
        (16, 64, False),   # shipped baseline (r11 artifact cross-check)
        (16, 256, False),  # the verdict's primary ask
        (32, 64, False),   # more sub-quantizers at 6 bits
        (32, 256, False),  # both levers, no rotation
        (16, 64, True),    # rotation at the shipped budget
        (16, 256, True),   # rotation + 8-bit codes
    ]

    spark = get_spark(app_name="ann-pq-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, args.eval_dir, "embeddings")
    train_vecs = emb.filter(F.col("vec_id") % args.train_mod == 0).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = np.asarray(lloyd_kmeans_centroids(train_vecs, KMEANS_K, KMEANS_ITERS))

    trained = {}
    rotations = {}
    for subs, pq_k, rot in variants:
        sub_dim = DIM // subs
        if rot:
            R = pca_balanced_rotation(train_np, subs, sub_dim)
            rotations[(subs, pq_k, rot)] = R
            rows = [
                (int(i), [round(float(x), 9) for x in v])
                for i, v in zip(ids[train_mask], train_np @ R)
            ]
            tv = spark.createDataFrame(rows, "vec_id long, v array<double>")
        else:
            tv = train_vecs
        trained[(subs, pq_k, rot)] = pq_train(tv, subs, sub_dim, pq_k, PQ_ITERS)
        print(f"trained subs={subs} pq_k={pq_k} rot={rot}", file=sys.stderr)
    spark.stop()

    norms = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent_norms = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cell_rank = np.empty((n, KMEANS_K), dtype=np.int64)
    for lo in range(0, n, 50_000):
        hi = min(lo + 50_000, n)
        d = ((mat[lo:hi, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell_rank[lo:hi] = np.argsort(d, axis=1, kind="stable")
    assign = cell_rank[:, :SPILL]

    stride = max(1, n // args.n_queries)
    query_idx = list(range(0, n, stride))[: args.n_queries]

    results = {}
    for key, books in trained.items():
        subs, pq_k, rot = key
        sub_dim = DIM // subs
        R = rotations.get(key)
        enc_mat = mat @ R if rot else mat
        codes = _encode(enc_mat, books, sub_dim)
        adc_full_rec, ivfpq_rec = [], []
        rr_full = {r: [] for r in RERANKS}
        rr_probe = {r: [] for r in RERANKS}
        for qi in query_idx:
            q = mat[qi]
            qn = q / np.linalg.norm(q)
            cos = np.round(norms @ qn, 6)
            exact_top = _topk_ids(cos, ids, TOP_K, asc=False)
            qe = q @ R if rot else q

            adc = _adc_scores(codes, qe, books, sub_dim)
            got = _topk_ids(adc, ids, TOP_K, asc=True)
            adc_full_rec.append(len(set(got) & set(exact_top)) / TOP_K)
            for r in RERANKS:
                short = _topk_ids(adc, ids, r, asc=True)
                smask = np.isin(ids, short)
                rr = _topk_ids(cos[smask], ids[smask], TOP_K, asc=False)
                rr_full[r].append(len(set(rr) & set(exact_top)) / TOP_K)

            probed = np.argsort(-np.round(cent_norms @ qn, 12), kind="stable")[
                :NPROBE
            ]
            mask = np.isin(assign, probed).any(axis=1)
            adc_p = _adc_scores(codes[mask], qe, books, sub_dim)
            got_p = _topk_ids(adc_p, ids[mask], TOP_K, asc=True)
            ivfpq_rec.append(len(set(got_p) & set(exact_top)) / TOP_K)
            for r in RERANKS:
                short = _topk_ids(adc_p, ids[mask], r, asc=True)
                smask = np.isin(ids, short)
                rr = _topk_ids(cos[smask], ids[smask], TOP_K, asc=False)
                rr_probe[r].append(len(set(rr) & set(exact_top)) / TOP_K)

        def avg(xs):
            return round(float(sum(xs)) / len(xs), 3)

        results[f"subs={subs},pq_k={pq_k},rot={'pca' if rot else 'none'}"] = {
            "bits_per_vector": _bits(subs, pq_k),
            "vs_float32": round(DIM * 32 / _bits(subs, pq_k), 1),
            "adc_full_scan": avg(adc_full_rec),
            f"ivf_pq(spill={SPILL},nprobe={NPROBE})": avg(ivfpq_rec),
            **{
                f"adc_rerank_full(rerank={r})": avg(v)
                for r, v in rr_full.items()
            },
            **{
                f"ivf_pq_rerank(spill={SPILL},nprobe={NPROBE},rerank={r})": avg(v)
                for r, v in rr_probe.items()
            },
        }
        print(key, results[list(results)[-1]], file=sys.stderr)

    artifact = {
        "eval_dir": args.eval_dir,
        "corpus": "rotate-dup sf1 (make_sf1.py --emb-mode rotate-dup)",
        "n_vectors": int(n),
        "n_queries": len(query_idx),
        "top_k": TOP_K,
        "kmeans_k": KMEANS_K,
        "coarse_config": f"spill={SPILL}, nprobe={NPROBE} (probed fraction 0.25)",
        "train_sample": f"vec_id % {args.train_mod} == 0 ({int(train_mask.sum())} vectors)",
        "note": (
            "VERDICT r11 ask #4 sweep: pq_k / sub-quantizer-count / fixed "
            "PCA-balanced rotation, all trained with the engine's "
            "deterministic Lloyd on the standard 1-in-10 sample"
        ),
        "recall_at_10": results,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact["recall_at_10"], indent=1))


if __name__ == "__main__":
    main()
