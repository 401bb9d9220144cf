"""LM-perplexity filter (queries/lm.py): exact hand-computed semantics on
a micro corpus exercising every stupid-backoff branch, plus fixture-level
structural properties of the bucket split."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.registry import all_queries

_MICRO = 1_000_000


@pytest.fixture(scope="module")
def lm_micro_dir(spark, tmp_path_factory) -> str:
    """A corpus where every count is hand-checkable. doc 0 (0 % 97 == 0)
    is the reference slice; docs 1 and 2 are scored."""
    d = tmp_path_factory.mktemp("lmcorpus")
    rows = [
        (0, "A b c a B d"),   # ref; tokens a b c a b d (case-normalized)
        (1, "a b c d e"),
        (2, "x b c"),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _lp(s: float) -> int:
    return round(math.log(s) * _MICRO)


def test_lm_perplexity_hand_computed(spark, lm_micro_dir):
    """Reference counts: trigrams {abc,bca,cab,abd}×1; bigrams ab:2,
    bc:1, ca:1, bd:1; unigrams a:2,b:2,c:1,d:1 → N=6, V=4.

    doc 1 (a b c d e):
      'a b c' → branch 1: 1/2
      'b c d' → branch 3 (b23 'c d' unseen): 0.16·(1+1)/10
      'c d e' → branch 3 (w3 'e' OOV):       0.16·(0+1)/10
    doc 2 (x b c):
      'x b c' → branch 2 (tri unseen, b23 'b c' seen): 0.4·1/2
    """
    out = {
        r.doc_id: r
        for r in all_queries()["quality_lm_perplexity"](spark, lm_micro_dir).collect()
    }
    assert set(out) == {1, 2}

    lp1 = [_lp(1 / 2), _lp(0.16 * 2 / 10), _lp(0.16 * 1 / 10)]
    assert out[1].n_tri == 3
    assert out[1].nll_micro == -sum(lp1)
    assert out[1].ppl == round(math.exp(-sum(lp1) / (3 * _MICRO)), 6)

    lp2 = [_lp(0.4 * 1 / 2)]
    assert out[2].n_tri == 1
    assert out[2].nll_micro == -sum(lp2)
    assert out[2].ppl == round(math.exp(-sum(lp2) / _MICRO), 6)


def test_lm_buckets_structure(spark, sf_oracle):
    """Tertile split at bin granularity: buckets ordered by mean NLL
    (every head bin < every middle bin < every tail bin), all scored docs
    bucketed exactly once, and no bucket grossly over its third (the
    threshold BIN may straddle, so exact n/3 is not required)."""
    qs = all_queries()
    rows = qs["quality_lm_ppl_buckets"](spark, sf_oracle).collect()
    n_scored = qs["quality_lm_perplexity"](spark, sf_oracle).count()
    assert len(rows) == n_scored
    by_bucket: dict[str, list[int]] = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by_bucket[r.bucket].append(r.mean_nll_milli_bin)
    assert all(by_bucket.values()), {k: len(v) for k, v in by_bucket.items()}
    assert max(by_bucket["head"]) < min(by_bucket["middle"])
    assert max(by_bucket["middle"]) < min(by_bucket["tail"])
    # cumulative-histogram cutoffs: head holds AT LEAST a third (cutoff
    # bin is the first reaching n/3 and is wholly included), and the two
    # lower buckets together at least two thirds
    n = len(rows)
    assert 3 * len(by_bucket["head"]) >= n
    assert 3 * (len(by_bucket["head"]) + len(by_bucket["middle"])) >= 2 * n


def test_lm_scores_cover_all_branches(spark, sf_oracle):
    """The fixture corpus must exercise seen-trigram, backoff-bigram, and
    unigram-floor branches — otherwise the oracle agreement proves less
    than it claims. Branch membership is recomputed from the count tables
    (not from lm.py's CASE) so this is an independent check."""
    from streaming_data_pipeline_capstone_spark.queries.lm import (
        _grams_df,
        _ngram_col,
    )

    base = _grams_df(spark, sf_oracle)
    tt = F.col("t")
    ref3 = (
        base.filter("is_ref")
        .select(F.explode(_ngram_col(tt, 3)).alias("g"))
        .distinct()
    )
    ref2 = (
        base.filter("is_ref")
        .select(F.explode(_ngram_col(tt, 2)).alias("g"))
        .distinct()
    )
    ty = (
        base.filter(~F.col("is_ref"))
        .select(F.explode(_ngram_col(tt, 3)).alias("g3"))
        .distinct()
    )
    p = F.split(F.col("g3"), " ")
    branch = (
        ty.join(ref3.withColumnRenamed("g", "g3"), "g3", "left_semi")
        .count(),
        ty.join(ref3.withColumnRenamed("g", "g3"), "g3", "left_anti")
        .join(
            ref2.withColumnRenamed("g", "b23"),
            F.array_join(F.slice(p, 2, 2), " ") == F.col("b23"),
            "left_semi",
        )
        .count(),
        ty.join(ref3.withColumnRenamed("g", "g3"), "g3", "left_anti")
        .join(
            ref2.withColumnRenamed("g", "b23"),
            F.array_join(F.slice(p, 2, 2), " ") == F.col("b23"),
            "left_anti",
        )
        .count(),
    )
    assert all(c > 0 for c in branch), branch


def test_lm_health_by_source_consistent_with_standalone_buckets(spark, sf_oracle):
    """corpus_health_lm_by_source must be EXACTLY the per-source rollup of
    quality_lm_ppl_buckets' doc-level assignments (joined to documents for
    source) — the source column riding the NLL rollup may not perturb a
    single bucket, count, or rounded fraction."""
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    qs = all_queries()
    lab = (
        qs["quality_lm_ppl_buckets"](spark, sf_oracle)
        .join(
            read_table(spark, sf_oracle, "documents").select("doc_id", "source"),
            "doc_id",
        )
        .collect()
    )
    want: dict[str, dict[str, int]] = {}
    for r in lab:
        d = want.setdefault(r["source"], {"head": 0, "middle": 0, "tail": 0})
        d[r["bucket"]] += 1
    got = {
        r["source"]: r for r in qs["corpus_health_lm_by_source"](spark, sf_oracle).collect()
    }
    assert set(got) == set(want)
    for src, d in want.items():
        n = sum(d.values())
        g = got[src]
        assert (g["n_scored"], g["n_head"], g["n_middle"], g["n_tail"]) == (
            n, d["head"], d["middle"], d["tail"],
        )
        assert g["frac_head"] == round(d["head"] / n, 6)
        assert g["frac_middle"] == round(d["middle"] / n, 6)
        assert g["frac_tail"] == round(d["tail"] / n, 6)
    # non-vacuity: more than one source, and at least one source has a
    # nonzero share in every bucket class somewhere in the rollup
    assert len(want) > 1
    assert any(d["head"] for d in want.values())
    assert any(d["tail"] for d in want.values())
