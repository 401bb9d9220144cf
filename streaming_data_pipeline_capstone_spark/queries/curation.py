"""Corpus-curation queries: the remaining ops a pretraining-data pipeline
runs that round 2's quality module didn't cover.

- **Benchmark decontamination** (`decontam_ngram_overlap`): flag corpus
  documents sharing word n-grams with a held-out evaluation set — the
  standard published recipe (n-gram overlap against benchmark text) for
  keeping eval data out of training data. The eval set here is the
  deterministic slice ``doc_id % 97 == 0`` standing in for a benchmark
  suite; at 100 TB the eval n-gram set is tiny relative to the corpus and
  broadcasts, so the corpus side stays one scan + one per-doc aggregation.
- **Document-frequency profile** (`text_idf_profile`): per-document
  rare-token and common-token (boilerplate-ish) fractions from the corpus
  document-frequency table — the IDF building block for quality scoring.
  Shuffles on the token (vocabulary-sized, skew-bounded because per-doc
  token sets are distinct) then on doc_id; both keys spread at any scale.
- **Mixture sampling** (`mixture_sample_by_lang`): deterministic
  per-language downsampling toward a target mixture (keep all English,
  ~30% of everything else) via a multiplicative integer hash of doc_id —
  reproducible across engines and runs, no RNG state, embarrassingly
  parallel.
- **Composite quality decision** (`quality_filter_composite`): the
  decision form of filtering — per doc, keep/drop plus the FIRST failing
  rule as a reason code (language allowlist, token-count bounds, mean
  token length, digit fraction). Pure per-row expressions: zero shuffles,
  fully codegen'd, the shape that runs as a cheap early pass before any
  expensive dedup.

Oracle conventions as elsewhere: identical aliases both engines, integer
SUM outputs CAST to BIGINT in DuckDB (HUGEINT→float64 otherwise — the
round-2 lesson), fractions as int/int double divisions rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.textstats import tokens
from streaming_data_pipeline_capstone_spark.registry import register
from streaming_data_pipeline_capstone_spark.sources.readers import read_table

# -- decontamination ---------------------------------------------------------
# n-gram width trade-off: published decontamination recipes use 8-13-gram
# windows — long enough that a match is near-certain verbatim benchmark
# text. Short n (3) over-flags at corpus scale: common trigrams collide by
# chance, so the flagged set grows with corpus size and recall of *true*
# contamination is bought with a large false-positive tax. Both widths are
# registered: n=3 (`decontam_ngram_overlap`, the sensitive/over-flagging
# end) and n=8 (`decontam_ngram_overlap_w8`, the published operating
# point). At sf0.01 the n=3 variant flags ~1/3 of the corpus while n=8
# flags only docs sharing verbatim 8-word spans with the eval slice —
# the near-duplicate strata — which is the intended behavior.
_DECON_N = 3          # sensitive end of the published 8-13-gram range
_DECON_N_W8 = 8       # published operating point (GPT-3/PaLM-style 8-13)
_EVAL_MOD = 97        # doc_id % 97 == 0 → the stand-in "benchmark" slice


def _strict_ngrams(t: F.Column, n: int) -> F.Column:
    """Distinct word n-grams; docs with fewer than n tokens contribute none
    (strict semantics — unlike shingles_from_tokens' whole-doc fallback —
    so the SQL twin is a plain slide over the token list)."""
    grams_full = F.transform(t, lambda x, i: F.array_join(F.slice(t, i + 1, n), " "))
    grams = F.slice(grams_full, F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
    return F.array_distinct(grams)


def _decontam_oracle(n: int) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {n} + 2),
                      i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))) AS gram
        FROM t WHERE len(t) >= {n}
      )
    ),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0)
    SELECT g.doc_id, count(*) AS n_shared_ngrams
    FROM g JOIN eg USING (gram)
    WHERE g.doc_id % {_EVAL_MOD} <> 0
    GROUP BY g.doc_id
    """


def _decontam(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_t = docs.select("doc_id", tokens("text").alias("t"))
    grams = with_t.select(
        "doc_id", F.explode(_strict_ngrams(F.col("t"), n)).alias("gram")
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    # eval/benchmark n-gram set is tiny at any corpus scale — broadcast it;
    # grams are distinct per doc by construction, so count(*) == distinct.
    return (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


@register("decontam_ngram_overlap", _decontam_oracle(_DECON_N))
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _decontam(spark, sf_dir, _DECON_N)


@register("decontam_ngram_overlap_w8", _decontam_oracle(_DECON_N_W8))
def decontam_ngram_overlap_w8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _decontam(spark, sf_dir, _DECON_N_W8)


# -- document-frequency profile ----------------------------------------------
_RARE_DF = 2          # tokens in ≤2 docs are "rare"
_COMMON_FRAC = 0.5    # tokens in ≥50% of docs are "common" (boilerplate-ish)


@register(
    "text_idf_profile",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    tok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(t) AS tok FROM t
      )
    ),
    dft AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
    nd AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id,
           count(*) AS n_distinct_tokens,
           CAST(coalesce(SUM(CASE WHEN df <= {_RARE_DF} THEN 1 END), 0) AS BIGINT)
             AS n_rare_tokens,
           round(CAST(SUM(CASE WHEN df >= {_COMMON_FRAC} * n_docs THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS frac_common
    FROM tok JOIN dft USING (tok), nd
    GROUP BY doc_id
    """,
)
def text_idf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_t = docs.select("doc_id", tokens("text").alias("t"))
    tok = with_t.select("doc_id", F.explode(F.array_distinct("t")).alias("tok"))
    dft = tok.groupBy("tok").agg(F.count("*").alias("df"))
    # corpus size is one scalar — computed plan-side and broadcast, not
    # collected on the driver.
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    joined = tok.join(dft, "tok").crossJoin(F.broadcast(n_docs))
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_distinct_tokens"),
        F.coalesce(F.sum(F.when(F.col("df") <= _RARE_DF, 1)), F.lit(0)).alias(
            "n_rare_tokens"
        ),
        F.round(
            F.sum(F.when(F.col("df") >= _COMMON_FRAC * F.col("n_docs"), 1).otherwise(0))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("frac_common"),
    )


# -- mixture sampling ---------------------------------------------------------
# keep-thresholds out of a 2^20 hash space: en keeps everything, the rest
# keep floor(0.3 · 2^20). Integer literals in BOTH engines so the decision
# is exact integer comparison, never float.
_MIX_SPACE = 1 << 20
_MIX_MULT = 2654435761  # Knuth multiplicative hash constant
_KEEP_ALL = _MIX_SPACE
_KEEP_PART = int(0.3 * _MIX_SPACE)


@register(
    "mixture_sample_by_lang",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(coalesce(SUM(CASE WHEN (doc_id * {_MIX_MULT}) % {_MIX_SPACE} <
                  CASE WHEN lang = 'en' THEN {_KEEP_ALL} ELSE {_KEEP_PART} END
                  THEN 1 END), 0) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN (doc_id * {_MIX_MULT}) % {_MIX_SPACE} <
                  CASE WHEN lang = 'en' THEN {_KEEP_ALL} ELSE {_KEEP_PART} END
                  THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_frac
    FROM documents
    GROUP BY lang
    """,
)
def mixture_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(_KEEP_ALL)).otherwise(F.lit(_KEEP_PART))
    kept = (F.col("doc_id") * _MIX_MULT) % _MIX_SPACE < thr
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.when(kept, 1)), F.lit(0)).alias("n_kept"),
        F.round(
            F.sum(F.when(kept, 1).otherwise(0)).cast("double") / F.count("*"), 6
        ).alias("kept_frac"),
    )


# -- composite quality decision ----------------------------------------------
_LANG_ALLOW = ["en", "de", "fr", "es"]
_CMP_MIN_TOKENS, _CMP_MAX_TOKENS = 10, 100_000
_MIN_MEAN_TOK, _MAX_MEAN_TOK = 2.5, 12.0
_MAX_DIGIT_FRAC = 0.2


@register(
    "quality_filter_composite",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS t,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             greatest(length(text), 1) AS n_chars
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang,
             len(t) AS n_tokens,
             CAST(list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT)))
                  AS DOUBLE) / greatest(len(t), 1) AS mean_tok,
             CAST(n_digits AS DOUBLE) / n_chars AS digit_frac
      FROM s
    )
    SELECT doc_id,
           CASE
             WHEN lang NOT IN ({', '.join("'" + l + "'" for l in _LANG_ALLOW)})
               THEN 'lang_filtered'
             WHEN n_tokens < {_CMP_MIN_TOKENS} THEN 'too_short'
             WHEN n_tokens > {_CMP_MAX_TOKENS} THEN 'too_long'
             WHEN mean_tok < {_MIN_MEAN_TOK} OR mean_tok > {_MAX_MEAN_TOK}
               THEN 'token_length'
             WHEN digit_frac > {_MAX_DIGIT_FRAC} THEN 'too_numeric'
             ELSE 'ok'
           END AS reason,
           CASE
             WHEN lang NOT IN ({', '.join("'" + l + "'" for l in _LANG_ALLOW)})
               THEN FALSE
             WHEN n_tokens < {_CMP_MIN_TOKENS} THEN FALSE
             WHEN n_tokens > {_CMP_MAX_TOKENS} THEN FALSE
             WHEN mean_tok < {_MIN_MEAN_TOK} OR mean_tok > {_MAX_MEAN_TOK}
               THEN FALSE
             WHEN digit_frac > {_MAX_DIGIT_FRAC} THEN FALSE
             ELSE TRUE
           END AS keep
    FROM m
    """,
)
def quality_filter_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # token array projected so the three consumers below don't each
    # re-tokenize (Catalyst does not CSE across references).
    s = docs.select(
        "doc_id",
        "lang",
        tokens("text").alias("t"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digits"),
        F.greatest(F.length("text"), F.lit(1)).alias("n_chars"),
    )
    t = F.col("t")
    n_tokens = F.size(t)
    mean_tok = (
        F.aggregate(t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
        .cast("double")
        / F.greatest(n_tokens, F.lit(1))
    )
    digit_frac = F.col("n_digits").cast("double") / F.col("n_chars")
    reason = (
        F.when(~F.col("lang").isin(_LANG_ALLOW), "lang_filtered")
        .when(n_tokens < _CMP_MIN_TOKENS, "too_short")
        .when(n_tokens > _CMP_MAX_TOKENS, "too_long")
        .when((mean_tok < _MIN_MEAN_TOK) | (mean_tok > _MAX_MEAN_TOK), "token_length")
        .when(digit_frac > _MAX_DIGIT_FRAC, "too_numeric")
        .otherwise("ok")
    )
    return s.select(
        "doc_id", reason.alias("reason"), (reason == "ok").alias("keep")
    )
