"""Semantic invariants of the corpus-curation queries (X6) — properties
the DuckDB oracle parity check can't see failing on its own, because both
engines would fail them together if the logic itself were wrong."""

from __future__ import annotations

from streaming_data_pipeline_capstone_spark.queries.curation import (
    _EVAL_MOD,
    _LANG_ALLOW,
    decontam_ngram_overlap,
    mixture_sample_by_lang,
    quality_filter_composite,
    text_idf_profile,
)


def test_decontam_never_flags_eval_docs_and_counts_positive(spark, sf_smoke):
    rows = decontam_ngram_overlap(spark, sf_smoke).collect()
    assert rows, "calibrated n-gram width should flag some docs"
    for r in rows:
        assert r["doc_id"] % _EVAL_MOD != 0, "eval docs must not self-flag"
        assert r["n_shared_ngrams"] >= 1


def test_mixture_keeps_all_english(spark, sf_smoke):
    rows = {r["lang"]: r for r in mixture_sample_by_lang(spark, sf_smoke).collect()}
    assert rows["en"]["n_kept"] == rows["en"]["n_docs"]
    assert rows["en"]["kept_frac"] == 1.0
    for lang, r in rows.items():
        if lang != "en":
            # downsampled languages keep a strict subset (0.3 target rate;
            # tiny strata can fluctuate but must never keep everything)
            assert r["n_kept"] < r["n_docs"]


def test_composite_filter_reason_semantics(spark, sf_smoke):
    rows = quality_filter_composite(spark, sf_smoke).collect()
    assert rows
    allowed = {"ok", "lang_filtered", "too_short", "too_long", "token_length", "too_numeric"}
    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(sf_smoke + "/documents.parquet").collect()
    }
    for r in rows:
        assert r["reason"] in allowed
        assert r["keep"] == (r["reason"] == "ok")
        if docs[r["doc_id"]] not in _LANG_ALLOW:
            assert r["reason"] == "lang_filtered"


def test_idf_profile_bounds(spark, sf_smoke):
    rows = text_idf_profile(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_rare_tokens"] <= r["n_distinct_tokens"]
        assert 0.0 <= r["frac_common"] <= 1.0
