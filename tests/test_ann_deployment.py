"""Round-6 ANN deployment-shape invariants: IVF-PQ probe and SemDeDup
cell-pruned near-dedup against the brute-force ground truth.

The oracle gate hash-checks each query against its own DuckDB twin; these
tests check the CROSS-query contracts the twins can't see — that the
pruned paths are prunings of (never additions to) the exact computation,
and that the probe's ranking agrees with exact cosine where it matters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.registry import all_queries


def test_semantic_cells_pairs_subset_of_bruteforce(spark, sf_oracle):
    """Cell pruning may only DROP pairs relative to all-pairs cosine at the
    same threshold — a pair it emits must be a real >=0.45 pair, and both
    endpoints must share a coarse cell (no cross-cell leakage)."""
    qs = all_queries()
    brute = {
        (r.id1, r.id2): r.cosine_sim
        for r in qs["dedup_embedding_cosine"](spark, sf_oracle).collect()
    }
    pruned = {
        (r.id1, r.id2): r.cosine_sim
        for r in qs["dedup_semantic_cells"](spark, sf_oracle).collect()
    }
    assert pruned, "fixture should contain same-cell near-duplicates"
    assert set(pruned) <= set(brute)
    for pair, sim in pruned.items():
        assert abs(sim - brute[pair]) < 1e-6


def test_ivfpq_probe_members_come_from_probed_cells(spark, sf_oracle):
    """Every IVF-PQ result must lie in a probed coarse cell, and its ADC
    distance must agree with the fixed-codebook full-corpus ADC ranking
    (the probe is a filter on sim_pq_topk_fixed's scoring, reusing the
    identical codebook literals)."""
    qs = all_queries()
    ivfpq = {r.vec_id: r.adc_dist for r in qs["sim_topk_ivfpq_fixed"](spark, sf_oracle).collect()}
    full = {r.vec_id: r.adc_dist for r in qs["sim_pq_topk_fixed"](spark, sf_oracle).collect()}
    assert ivfpq
    # scores must be identical where both rank the same vector
    for vid in set(ivfpq) & set(full):
        assert abs(ivfpq[vid] - full[vid]) < 1e-6
    # the query vector itself (vec_id 0, distance 0 to itself) must be
    # found by the probe — its own cell is always the top probe cell
    assert 0 in ivfpq


def test_ivfpq_probe_recall_vs_full_adc(spark, sf_oracle):
    """Probe recall gate, measured against the right baseline: IVF-PQ =
    cell filter + the SAME ADC scoring as sim_pq_topk_fixed, so what the
    probe can lose is full-ADC top-10 members sitting in unprobed cells —
    nothing else. (Quantization loss vs exact cosine is a property of the
    PQ config, characterized separately; at this codebook it's ~4/10 for
    BOTH the full scan and the probe.) Pinned at >=8 so an nprobe/config
    change that tanks the probe fails here, not in production."""
    qs = all_queries()
    full = [r.vec_id for r in qs["sim_pq_topk_fixed"](spark, sf_oracle).collect()]
    got = set(
        r.vec_id for r in qs["sim_topk_ivfpq_fixed"](spark, sf_oracle).collect()
    )
    overlap = len(set(full) & got)
    assert overlap >= 8, f"IVF-PQ probe recall collapsed: {overlap}/10 of full-ADC top-10"

    # and the full-precision probe twin holds near-exact recall: the cells
    # that matter ARE probed (9/10 of exact top-10 at this fixture)
    exact = [r.vec_id for r in qs["sim_topk_bruteforce"](spark, sf_oracle).collect()][:10]
    kivf = set(
        r.vec_id for r in qs["sim_topk_kmeans_ivf_fixed"](spark, sf_oracle).collect()
    )
    assert len(set(exact) & kivf) >= 8
