"""Cross-query contracts for the end-to-end curation funnel — the
properties the per-query DuckDB twins can't see (each stage's oracle
verifies its own output; these verify the COMPOSITION)."""

from __future__ import annotations

from streaming_data_pipeline_capstone_spark.registry import all_queries


def test_funnel_counts_monotone_and_consistent(spark, sf_oracle):
    qs = all_queries()
    report = {
        r["stage"]: r["n_docs"]
        for r in qs["curation_report"](spark, sf_oracle).collect()
    }
    assert set(report) == {
        "total",
        "eval_slice",
        "after_dedup",
        "after_quality",
        "after_decontam",
    }
    # each stage can only shrink the corpus
    assert report["total"] >= report["after_dedup"] >= report["after_quality"]
    assert report["after_quality"] >= report["after_decontam"]
    assert 0 < report["eval_slice"] < report["total"]
    # the fixture corpus must actually exercise every stage
    assert report["after_decontam"] > 0

    # the packed bins partition the survivor set exactly
    bins = qs["pipeline_curation_full"](spark, sf_oracle).collect()
    assert sum(r["n_docs"] for r in bins) == report["after_decontam"]


def test_dup_spans_hashed_row_identical(spark, sf_oracle):
    """The xxhash64-keyed exchange is a physical change only: at the gate
    corpus (no 64-bit collisions among ~20k windows) the hashed variant
    must return exactly the text-keyed profile."""
    qs = all_queries()
    text_rows = sorted(
        tuple(r) for r in qs["text_dup_spans"](spark, sf_oracle).collect()
    )
    hashed_rows = sorted(
        tuple(r) for r in qs["text_dup_spans_hashed"](spark, sf_oracle).collect()
    )
    assert text_rows == hashed_rows
    assert any(r[2] > 0 for r in text_rows), "fixture should contain dup spans"


def test_funnel_stage_membership_matches_stage_queries(spark, sf_oracle):
    """A document survives the funnel iff it passes every individual
    stage query — the composition adds no semantics of its own."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.queries.curation import (
        _EVAL_MOD,
        _survivors,
    )

    qs = all_queries()
    surv = {r["doc_id"] for r in _survivors(spark, sf_oracle).select("doc_id").collect()}
    dd = {
        r["doc_id"]
        for r in qs["dedup_keep_list"](spark, sf_oracle).filter("keep").collect()
    }
    qok = {
        r["doc_id"]
        for r in qs["quality_filter_composite"](spark, sf_oracle)
        .filter("keep")
        .collect()
    }
    cont = {
        r["doc_id"] for r in qs["decontam_ngram_overlap_w8"](spark, sf_oracle).collect()
    }
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    all_ids = {
        r["doc_id"]
        for r in read_table(spark, sf_oracle, "documents")
        .select("doc_id")
        .collect()
    }
    expect = {
        d
        for d in all_ids
        if d % _EVAL_MOD != 0 and d in dd and d in qok and d not in cont
    }
    assert surv == expect
