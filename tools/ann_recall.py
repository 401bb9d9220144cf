"""Recall-vs-compression curve for the ANN family (VERDICT r6 ask #5).

The deployment-shape probes trade recall for compute/storage three ways:
PQ quantization loss (ADC on integer codes vs exact cosine), IVF cell
pruning loss (unprobed cells can hold true neighbors), and their product
(IVF-PQ). Until round 8 the trade lived in test comments ("~4/10 at this
codebook"); at deployment shape the trade IS the product, so it gets a
committed artifact: recall@10 against exact cosine, measured over a grid
of codebook sizes and probe widths, so the next config change diffs
against a recorded curve instead of a comment.

Methodology:

- training runs the SAME deterministic-Lloyd pipeline the engine ships
  (operators/similarity.py: lowest-id init, first-min tie-break, 6 dp
  mean rounding) on the same training slice tools/train_codebooks.py
  uses (sf0.01 — codebooks are always trained on a sample);
- evaluation scores the sf0.1 corpus (2k vectors, the driver bench SF)
  for the first N_QUERIES vec_ids, numpy ADC/cosine arithmetic — the
  engine's scoring parity with this math is already oracle-pinned, so
  the curve characterizes the MODEL, not the plan;
- recall@10(q) = |approx_top10 ∩ exact_top10| / 10, averaged over
  queries; ties broken vec_id-asc exactly like the registry queries.

Usage::

    python tools/ann_recall.py   # writes ANN_RECALL_r08.json
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
EVAL_SF_DIR = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "ANN_RECALL_r08.json")

N_QUERIES = 20
TOP_K = 10
PQ_SIZES = (8, 16, 64)  # codewords per sub-book; 8 is the shipped artifact
NPROBES = (1, 2, 3)  # of _KMEANS_K=8 coarse cells; 3 is the shipped probe
PQ_SUBS, PQ_SUB_DIM = 4, 16
PQ_ITERS, KMEANS_K, KMEANS_ITERS = 3, 8, 5


def _load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding::DOUBLE[] FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.array(r[1], dtype=np.float64) for r in rows])
    return ids, mat


def _topk_ids(scores: np.ndarray, ids: np.ndarray, k: int, asc: bool) -> list[int]:
    """Top-k by score with vec_id-asc tie-break (registry ordering)."""
    order = np.lexsort((ids, scores if asc else -scores))
    return [int(ids[i]) for i in order[:k]]


def _adc_scores(codes: np.ndarray, query: np.ndarray, books: list) -> np.ndarray:
    """Sum over sub-spaces of squared L2 between the query sub-vector and
    the code's sub-centroid — the engine's pq_adc_score math."""
    n = codes.shape[0]
    out = np.zeros(n)
    for s in range(PQ_SUBS):
        qs = query[s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
        table = ((np.asarray(books[s]) - qs) ** 2).sum(axis=1)  # (pq_k,)
        out += table[codes[:, s]]
    return np.round(out, 6)


def _encode(mat: np.ndarray, books: list) -> np.ndarray:
    codes = np.zeros((mat.shape[0], PQ_SUBS), dtype=np.int64)
    for s in range(PQ_SUBS):
        sub = mat[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
        d = ((sub[:, None, :] - np.asarray(books[s])[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)  # first-min, matching the engine
    return codes


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def main() -> None:
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.operators.similarity import (
        lloyd_kmeans_centroids,
        pq_train,
    )
    from streaming_data_pipeline_capstone_spark.session import get_spark
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, TRAIN_SF_DIR, "embeddings")
    train_vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    books_by_size = {
        pq_k: pq_train(train_vecs, PQ_SUBS, PQ_SUB_DIM, pq_k, PQ_ITERS)
        for pq_k in PQ_SIZES
    }
    cents = np.asarray(lloyd_kmeans_centroids(train_vecs, KMEANS_K, KMEANS_ITERS))
    spark.stop()

    ids, mat = _load(EVAL_SF_DIR)
    norms = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cells = _assign(mat, cents)
    cent_norms = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    codes_by_size = {pq_k: _encode(mat, books) for pq_k, books in books_by_size.items()}

    exact: dict[int, list[int]] = {}
    rec_pq = {pq_k: [] for pq_k in PQ_SIZES}
    rec_pq_l2 = {pq_k: [] for pq_k in PQ_SIZES}
    rec_metric = []
    rec_ivf = {np_: [] for np_ in NPROBES}
    rec_ivfpq = {(np_, pq_k): [] for np_ in NPROBES for pq_k in PQ_SIZES}

    for qi in range(N_QUERIES):
        q = mat[qi]
        qn = q / np.linalg.norm(q)
        cos = np.round(norms @ qn, 6)
        exact_top = _topk_ids(cos, ids, TOP_K, asc=False)
        exact[qi] = exact_top

        # ADC approximates squared L2 on the RAW vectors; the exact-L2
        # top-10 separates metric mismatch (L2 vs cosine on unnormalized
        # data) from quantization loss proper.
        l2 = np.round(((mat - q) ** 2).sum(axis=1), 6)
        exact_l2_top = _topk_ids(l2, ids, TOP_K, asc=True)
        rec_metric.append(len(set(exact_l2_top) & set(exact_top)) / TOP_K)

        for pq_k, codes in codes_by_size.items():
            adc = _adc_scores(codes, q, books_by_size[pq_k])
            got = _topk_ids(adc, ids, TOP_K, asc=True)
            rec_pq[pq_k].append(len(set(got) & set(exact_top)) / TOP_K)
            rec_pq_l2[pq_k].append(len(set(got) & set(exact_l2_top)) / TOP_K)

        probe_rank = np.argsort(-np.round(cent_norms @ qn, 12), kind="stable")
        for np_ in NPROBES:
            probed = set(int(c) for c in probe_rank[:np_])
            mask = np.isin(cells, list(probed))
            got = _topk_ids(cos[mask], ids[mask], TOP_K, asc=False)
            rec_ivf[np_].append(len(set(got) & set(exact_top)) / TOP_K)
            for pq_k, codes in codes_by_size.items():
                adc = _adc_scores(codes[mask], q, books_by_size[pq_k])
                got2 = _topk_ids(adc, ids[mask], TOP_K, asc=True)
                rec_ivfpq[(np_, pq_k)].append(
                    len(set(got2) & set(exact_top)) / TOP_K
                )

    def avg(xs: list[float]) -> float:
        return round(sum(xs) / len(xs), 3)

    artifact = {
        "train_sf_dir": TRAIN_SF_DIR,
        "eval_sf_dir": EVAL_SF_DIR,
        "n_queries": N_QUERIES,
        "top_k": TOP_K,
        "kmeans_k": KMEANS_K,
        "pq_subs": PQ_SUBS,
        "pq_sub_dim": PQ_SUB_DIM,
        "shipped_config": {"pq_k": 8, "nprobe": 3},
        "recall_at_10": {
            "exact_l2_vs_cosine": avg(rec_metric),
            "pq_adc": {f"pq_k={k}": avg(v) for k, v in rec_pq.items()},
            "pq_adc_vs_exact_l2": {
                f"pq_k={k}": avg(v) for k, v in rec_pq_l2.items()
            },
            "ivf": {f"nprobe={n}": avg(v) for n, v in rec_ivf.items()},
            "ivf_pq": {
                f"nprobe={n},pq_k={k}": avg(v)
                for (n, k), v in rec_ivfpq.items()
            },
        },
        "compression": {
            f"pq_k={k}": {
                "bits_per_vector": PQ_SUBS * max(1, int(np.ceil(np.log2(k)))),
                "vs_float32": round(
                    64 * 32 / (PQ_SUBS * max(1, int(np.ceil(np.log2(k))))), 1
                ),
            }
            for k in PQ_SIZES
        },
        "notes": (
            "recall@10 vs exact cosine, vec_id-asc tie-break; training = "
            "deterministic Lloyd on the sf0.01 sample (the shipped-codebook "
            "pipeline); scoring = numpy twin of the engine's oracle-pinned "
            "ADC/cosine math. IVF loss = true neighbors in unprobed cells; "
            "PQ loss = quantization; IVF-PQ = both. ADC approximates L2 on "
            "raw vectors while the baseline is cosine — exact_l2_vs_cosine "
            "is the metric-mismatch ceiling, pq_adc_vs_exact_l2 the "
            "quantization loss proper; their product tracks pq_adc."
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact["recall_at_10"], indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
