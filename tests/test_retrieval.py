"""BM25 retrieval (queries/retrieval.py): exact hand-computed scores on a
micro corpus, and non-vacuity of the standing query on the fixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.queries.retrieval import (
    _B,
    _K1,
    _MICRO,
    _QUERY_TERMS,
    _bm25_scores,
)
from streaming_data_pipeline_capstone_spark.registry import all_queries


@pytest.fixture(scope="module")
def bm25_micro_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("bm25corpus")
    rows = [
        (1, "hash HASH join"),
        (2, "join scan"),
        (3, "the quick fox"),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _bm25(tf: int, dl: int, df: int, n: float, avgdl: float) -> int:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    c = idf * (tf * (_K1 + 1.0)) / (tf + _K1 * (1.0 - _B + _B * dl / avgdl))
    return round(c * _MICRO)


def test_bm25_hand_computed(spark, bm25_micro_dir):
    """N=3, avgdl=8/3; df: hash=1, join=2, scan=1, window=0.
    doc 1 (dl=3): tf(hash)=2 (case-normalized), tf(join)=1.
    doc 2 (dl=2): tf(join)=1, tf(scan)=1. doc 3 matches nothing."""
    out = {
        r.doc_id: r.score_micro
        for r in _bm25_scores(spark, bm25_micro_dir, _QUERY_TERMS).collect()
    }
    n, avgdl = 3.0, 8.0 / 3.0
    assert set(out) == {1, 2}
    assert out[1] == _bm25(2, 3, 1, n, avgdl) + _bm25(1, 3, 2, n, avgdl)
    assert out[2] == _bm25(1, 2, 2, n, avgdl) + _bm25(1, 2, 1, n, avgdl)


def test_bm25_fixture_non_vacuous(spark, sf_oracle):
    """Every standing query term must occur in the fixture corpus (else
    the gate certifies a trivial plan), scores must be positive, and the
    top-20 must be strictly rank-ordered with the doc_id tiebreak."""
    from streaming_data_pipeline_capstone_spark.operators.textstats import tokens
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    docs = read_table(spark, sf_oracle, "documents")
    present = {
        r.term
        for r in docs.select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term").isin(_QUERY_TERMS))
        .distinct()
        .collect()
    }
    assert present == set(_QUERY_TERMS)

    rows = all_queries()["text_bm25_topk"](spark, sf_oracle).collect()
    assert len(rows) == 20
    assert all(r.score_micro > 0 for r in rows)
    keys = [(-r.score_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_rrf_fusion_matches_python_recompute(spark, sf_oracle):
    """The fused top-20 must equal a Python recompute of RRF from the two
    candidate lists collected independently (dense via the registered
    brute-force query's ordering, sparse via _bm25_scores)."""
    from streaming_data_pipeline_capstone_spark.queries.retrieval import (
        _CAND,
        _RRF_K,
        _TOPK,
    )

    qs = all_queries()
    # the registered brute-force query returns top-20; rebuild the same
    # ordering 50-deep for the candidate list
    from streaming_data_pipeline_capstone_spark.operators.similarity import cosine
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    emb = read_table(spark, sf_oracle, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    qv = emb.filter(F.col("vec_id") == 0).select(as_double.alias("qv"))
    dense_ids = [
        r.vec_id
        for r in emb.select("vec_id", as_double.alias("v"))
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(_CAND)
        .collect()
    ]
    sparse_ids = [
        r.doc_id
        for r in _bm25_scores(spark, sf_oracle, _QUERY_TERMS)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(_CAND)
        .collect()
    ]
    exp: dict[int, int] = {}
    for rank, i in enumerate(dense_ids, 1):
        exp[i] = exp.get(i, 0) + round(_MICRO / (_RRF_K + rank))
    for rank, i in enumerate(sparse_ids, 1):
        exp[i] = exp.get(i, 0) + round(_MICRO / (_RRF_K + rank))
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
    got = [
        (r.id, r.rrf_micro)
        for r in qs["retrieval_hybrid_rrf"](spark, sf_oracle).collect()
    ]
    assert got == want


def test_bm25_multi_single_query_slice_pins_to_standing_query(spark, sf_oracle):
    """The multi-query plan must be a GENERALIZATION, not a fork: its
    query_id=0 slice (the standing 4-term query) must match
    text_bm25_topk doc-for-doc and micro-score-for-micro-score — the
    union-term prefilter and the query fan-out join may not perturb tf,
    df, idf, or rounding."""
    qs = all_queries()
    single = [
        (r["doc_id"], r["score_micro"])
        for r in qs["text_bm25_topk"](spark, sf_oracle)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .collect()
    ]
    multi = [
        (r["doc_id"], r["score_micro"])
        for r in qs["text_bm25_multi_topk"](spark, sf_oracle)
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    ]
    assert multi == single


def test_bm25_multi_queries_non_vacuous(spark, sf_oracle):
    """Every query in the standing batch must retrieve a full top-k with
    DISTINCT result sets (else the batch exercises one query three
    times), and ranks must be 1..k per query."""
    from streaming_data_pipeline_capstone_spark.queries.retrieval import (
        _MULTI_QUERIES,
        _TOPK,
    )

    qs = all_queries()
    rows = qs["text_bm25_multi_topk"](spark, sf_oracle).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(_MULTI_QUERIES)
    tops = set()
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, _TOPK + 1))
        tops.add(tuple(sorted(r["doc_id"] for r in rs)))
    assert len(tops) > 1, "query batch must produce distinct result sets"


def test_rrf_ann_dense_arm_matches_serving_probe(spark, sf_oracle):
    """retrieval_hybrid_rrf_ann's dense arm runs the SAME partition-pruned
    IVF-PQ+rerank plan as sim_topk_ivfpq_rerank_pruned — its top-10 by
    dense rank must therefore be that query's exact output ids, in order."""
    from streaming_data_pipeline_capstone_spark.queries.extras import (
        retrieval_hybrid_rrf_ann,
        sim_topk_ivfpq_rerank_pruned,
    )

    probe = [
        r.vec_id
        for r in sim_topk_ivfpq_rerank_pruned(spark, sf_oracle).collect()
    ]
    fused = retrieval_hybrid_rrf_ann(spark, sf_oracle)
    dense_top = [
        r.id
        for r in fused.filter(F.col("r_dense").isNotNull())
        .orderBy("r_dense")
        .collect()
        if r.r_dense <= 10
    ]
    # the fused top-20 need not contain all 10 dense leaders, but every
    # dense-ranked row it does contain must agree with the probe order
    assert dense_top == probe[: len(dense_top)]
    assert len(dense_top) >= 3, "vacuous: fused list carries no dense leaders"


def test_multi_hybrid_slice_matches_single(spark, sf_oracle):
    """retrieval_hybrid_rrf_multi batches both arms; its qid=0 slice must
    be exactly retrieval_hybrid_rrf_ann's output (same dense probe, same
    standing sparse query, same fusion), and every query must return a
    full per-query top-20."""
    from streaming_data_pipeline_capstone_spark.queries.extras import (
        retrieval_hybrid_rrf_ann,
        retrieval_hybrid_rrf_multi,
    )
    from streaming_data_pipeline_capstone_spark.queries.retrieval import (
        _MULTI_QUERIES,
        _TOPK,
    )

    batch = retrieval_hybrid_rrf_multi(spark, sf_oracle).collect()
    single = [
        (r.id, r.r_dense, r.r_sparse, r.rrf_micro)
        for r in retrieval_hybrid_rrf_ann(spark, sf_oracle).collect()
    ]
    slice0 = sorted(
        (
            (r.id, r.r_dense, r.r_sparse, r.rrf_micro, r.rank)
            for r in batch
            if r.query_id == 0
        ),
        key=lambda t: t[4],
    )
    assert [(i, d, s, m) for i, d, s, m, _ in slice0] == single
    for qid in _MULTI_QUERIES:
        rows = [r for r in batch if r.query_id == qid]
        assert len(rows) == _TOPK, qid
