"""Semantic invariants of the corpus-curation queries (X6) — properties
the DuckDB oracle parity check can't see failing on its own, because both
engines would fail them together if the logic itself were wrong."""

from __future__ import annotations

from streaming_data_pipeline_capstone_spark.queries.curation import (
    _DSIR_TAKE,
    _EVAL_MOD,
    _LANG_ALLOW,
    _MIX_MULT,
    _MIX_SPACE,
    _N_SHARDS,
    _PACK_BUDGET,
    corpus_shard_shuffle,
    curation_pii_scrub,
    decontam_ngram_overlap,
    decontam_ngram_overlap_w8,
    mixture_dsir_resample,
    mixture_dsir_weights,
    mixture_sample_by_lang,
    mixture_temperature_sample,
    pack_token_budget,
    quality_filter_composite,
    text_idf_profile,
    text_repetition_profile,
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


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    # DSIR's defining property: a corpus doc written in the target (eval
    # slice) distribution outscores one written in a disjoint vocabulary.
    # doc 0 ≡ 0 mod _EVAL_MOD is the target sample; doc 1 repeats its
    # wording, doc 2 shares nothing with it.
    eval_text = "navigate the harbor channel past the breakwater at dusk"
    rows = [
        (0, eval_text, "en", "eval", 1),
        (1, eval_text, "en", "web", 1),
        (2, "quarterly revenue grew despite persistent supply shortages", "en", "web", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "dsir")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in mixture_dsir_weights(spark, d).collect()}
    assert set(got) == {1, 2}, "eval docs must not be scored"
    assert got[1]["log_w_micro"] > got[2]["log_w_micro"]
    # unigram+bigram occurrence count: 2·len − 1 tokens per doc
    for doc_id, r in got.items():
        n_tok = len(rows[doc_id][1].split())
        assert r["n_grams"] == 2 * n_tok - 1


def test_dsir_weights_exclude_eval_and_are_integer_exact(spark, sf_smoke):
    out = mixture_dsir_weights(spark, sf_smoke)
    rows = out.collect()
    assert rows
    assert dict(out.dtypes)["log_w_micro"] == "bigint"
    for r in rows:
        assert r["doc_id"] % _EVAL_MOD != 0
        assert r["n_grams"] >= 1


def test_dsir_resample_is_gumbel_topk_of_weights(spark, sf_smoke):
    # the selection must be exactly the k largest (log_w + gumbel(hash))
    # scores — recompute the ranking key independently and compare sets
    import math

    took = mixture_dsir_resample(spark, sf_smoke).collect()
    assert len(took) == _DSIR_TAKE
    ids = [r["doc_id"] for r in took]
    assert len(set(ids)) == len(ids)  # no dup docs
    weights = {
        r["doc_id"]: r["log_w_micro"]
        for r in mixture_dsir_weights(spark, sf_smoke).collect()
    }

    def score(doc_id):
        u = (((doc_id % _MIX_SPACE) * _MIX_MULT) % _MIX_SPACE + 0.5) / _MIX_SPACE
        return weights[doc_id] + round(-math.log(-math.log(u)) * 1_000_000)

    expect = sorted(weights, key=lambda d: (-score(d), d))[:_DSIR_TAKE]
    assert sorted(r["doc_id"] for r in took) == sorted(expect)
    for r in took:
        assert r["score_micro"] == score(r["doc_id"])


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


def test_pii_scrub_plants_and_redacts(spark, sf_smoke):
    """Every doc_id % 7 carries exactly one planted email (% 11 one phone);
    scrubbing must shrink the planted docs and leave the rest unchanged in
    length (the corpus itself contains no PII)."""
    import pyspark.sql.functions as F

    rows = {r["doc_id"]: r for r in curation_pii_scrub(spark, sf_smoke).collect()}
    raw_len = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(sf_smoke + "/documents.parquet")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    assert rows
    for doc_id, r in rows.items():
        assert r["n_emails"] == (1 if doc_id % 7 == 0 else 0)
        assert r["n_phones"] == (1 if doc_id % 11 == 0 else 0)
        if doc_id % 7 != 0 and doc_id % 11 != 0:
            # nothing planted, nothing matched → scrubbed text is the raw text
            assert r["n_chars_scrubbed"] == raw_len[doc_id]


def test_repetition_profile_bounds(spark, sf_smoke):
    rows = text_repetition_profile(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        # the top token accounts for at least 1/n_distinct of the mass
        assert r["top_token_frac"] >= round(1.0 / r["n_distinct"], 6) - 1e-9
        assert 0.0 <= r["dup_token_frac"] < 1.0
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0


def test_pack_token_budget_partition(spark, sf_smoke):
    """Packing must be a partition of the corpus: every doc in exactly one
    (lang, bin), bins contiguous per lang starting at 0, and the greedy
    invariant — bin k+1 only opens once the running total has crossed
    (k+1)·budget. (An INDIVIDUAL bin may end under budget when a straddling
    doc from the previous bin overshot into its range; the cumulative form
    is the exact consequence of bin = floor(cum_excl / budget).)"""
    bins = pack_token_budget(spark, sf_smoke).collect()
    docs = spark.read.parquet(sf_smoke + "/documents.parquet")
    assert sum(r["n_docs"] for r in bins) == docs.count()
    by_lang: dict[str, list] = {}
    for r in bins:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bin_id"])
        assert [r["bin_id"] for r in rs] == list(range(len(rs))), lang
        # doc_id ranges of consecutive bins must not interleave
        for a, b in zip(rs, rs[1:]):
            assert a["last_doc"] < b["first_doc"], lang
        running = 0
        for r in rs[:-1]:  # cumulative total crossed each bin boundary
            running += r["tok_total"]
            assert running >= (r["bin_id"] + 1) * _PACK_BUDGET, (lang, r, running)


def test_shard_shuffle_is_permutation(spark, sf_smoke):
    """Shard assignment must be a permutation: every doc exactly once,
    positions contiguous 1..n per shard, order within a shard strictly
    increasing in (hkey, doc_id), and identical across two runs (the
    whole point — a REPRODUCIBLE shuffle)."""
    rows = corpus_shard_shuffle(spark, sf_smoke).collect()
    n_docs = spark.read.parquet(sf_smoke + "/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["shard"] < _N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1)), shard
        keys = [(r["hkey"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys), shard
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in corpus_shard_shuffle(spark, sf_smoke).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_temperature_sampling_monotone(spark, sf_smoke):
    """Rarest language keeps everything (rate 1.0); rates are monotone
    non-increasing in language frequency; kept counts respect the rates
    within hash-sampling tolerance."""
    rows = sorted(
        mixture_temperature_sample(spark, sf_smoke).collect(),
        key=lambda r: r["n_docs"],
    )
    assert rows
    assert rows[0]["rate"] == 1.0 and rows[0]["n_kept"] == rows[0]["n_docs"]
    for a, b in zip(rows, rows[1:]):
        assert a["rate"] >= b["rate"] - 1e-9
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_docs"]


def test_corpus_health_consistent_with_composite_filter(spark, sf_oracle):
    """The per-source rollup must agree exactly with the per-doc composite
    filter it summarizes: per-source kept counts equal the filter's keeps
    joined to the documents' source column, reason columns partition
    n_docs, and totals cover the whole corpus."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.registry import all_queries
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    qs = all_queries()
    health = {r.source: r for r in qs["corpus_health_by_source"](spark, sf_oracle).collect()}
    docs = read_table(spark, sf_oracle, "documents").select("doc_id", "source")
    kept_by_src = {
        r.source: r.n
        for r in qs["quality_filter_composite"](spark, sf_oracle)
        .filter("keep")
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_corpus = docs.count()
    assert sum(r.n_docs for r in health.values()) == n_corpus
    for src, r in health.items():
        assert r.n_kept == kept_by_src.get(src, 0), src
        parts = (
            r.n_kept + r.n_lang_filtered + r.n_too_short + r.n_too_long
            + r.n_token_length + r.n_too_numeric
        )
        assert parts == r.n_docs, src
        assert r.pass_rate == round(r.n_kept / r.n_docs, 6), src


def test_domain_cap_two_phase_equals_plain_window(spark, sf_oracle):
    """The salted two-phase top-K must be row-identical to the plain
    per-source window, and the cap must actually bind on the fixture."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.queries.curation import (
        _CAP_K,
        curation_domain_cap,
    )
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    got = {
        (r.doc_id, r.source, r.cap_rank, r.n_chars)
        for r in curation_domain_cap(spark, sf_oracle).collect()
    }
    d = read_table(spark, sf_oracle, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    plain = {
        (r.doc_id, r.source, r.cap_rank, r.n_chars)
        for r in d.withColumn(
            "cap_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("cap_rank") <= _CAP_K)
        .select("doc_id", "source", "cap_rank", "n_chars")
        .collect()
    }
    assert got == plain
    assert d.count() > len(got), "cap never binds — vacuous fixture"
