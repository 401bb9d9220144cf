"""Semantic invariants of the corpus-curation queries (X6) — properties
the DuckDB oracle parity check can't see failing on its own, because both
engines would fail them together if the logic itself were wrong."""

from __future__ import annotations

from streaming_data_pipeline_capstone_spark.queries.curation import (
    _EVAL_MOD,
    _LANG_ALLOW,
    decontam_ngram_overlap,
    decontam_ngram_overlap_w8,
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


def test_decontam_w8_finds_planted_contamination(spark, tmp_path):
    # The published 8-gram operating point flags ~nothing at tiny SF (the
    # oracle row at sf0.01 is a 0-row match), so prove the width is live
    # with planted data: one corpus doc shares a verbatim 8-word span with
    # an eval doc, a second shares only a 7-word span (must NOT flag).
    span8 = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"benchmark prompt says {span8} and then stops", "en", "eval", 1),
        (1, f"training page quoting {span8} verbatim inside prose", "en", "web", 1),
        (2, "training page with alpha beta gamma delta epsilon zeta eta only", "en", "web", 1),
        (3, "entirely unrelated text about shipping lanes and weather", "en", "web", 1),
    ]
    # doc_id 0 ≡ 0 mod _EVAL_MOD → the eval slice; 1-3 are corpus docs.
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r["n_shared_ngrams"] for r in decontam_ngram_overlap_w8(spark, d).collect()}
    assert got == {1: 1}, f"only the verbatim-8-gram doc should flag, got {got}"


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
