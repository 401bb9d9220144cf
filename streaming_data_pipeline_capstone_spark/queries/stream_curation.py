"""Registered gate query for the streaming curation-verdict job
(streaming/curation_stream.py) — a REAL Structured Streaming run, not a
batch twin: the query stages the corpus as an in-doc_id-order replay,
drains the foreachBatch verdict job (availableNow, one file per
micro-batch, storage-backed fingerprint state), and returns the verdict
frame the job wrote. The DuckDB oracle mirrors the batch formulation
(global min-doc_id dedup over the fingerprint + the stateless columns +
the unrolled-IRLS trained model), so a hash match certifies the
INCREMENTAL execution — cross-batch index joins, idempotent epoch writes,
checkpoint bookkeeping — against the set-based semantics.

Gate instrumentation (in-flight plants, mirrored in both engines, the
curation_pii_scrub / decontam-w8 precedent — the production job in
streaming/curation_stream.py takes documents as given and plants nothing):

- exact-duplicate plant: the natural gate corpus has NO two documents with
  equal normalized text (verified r11), so ``keep_dedup`` would gate an
  all-true column. Every doc_id % 83 == 0 has its text REPLACED by one of
  three fixed sentinel pages (group = (doc_id // 83) % 3) — modelling a
  crawl re-delivering the same page — giving multi-member fingerprint
  groups that span micro-batches, so the cross-batch index path is
  exercised on known positives.
- PII plant: the curation_pii_scrub recipe verbatim (doc_id % 7 appends an
  email, % 11 a phone number), so the scrub counts have known positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.queries.curation import (
    _CMP_MAX_TOKENS,
    _CMP_MIN_TOKENS,
    _EMAIL_RE,
    _LANG_ALLOW,
    _MAX_DIGIT_FRAC,
    _MAX_MEAN_TOK,
    _MIN_MEAN_TOK,
    _PHONE_RE,
)
from streaming_data_pipeline_capstone_spark.queries.quality import (
    _QC_COEF_CTE,
    _QC_SCORE_ROUND,
    _QC_STOP_IN,
    _QC_TRAIN_CTES,
    _QC_XB_SQL,
    fit_quality_model,
)
from streaming_data_pipeline_capstone_spark.registry import register

_DUP_MOD = 83
_DUP_GROUPS = 3
_DUP_SENTINEL = (
    "replayed crawl duplicate sentinel page with enough ordinary prose "
    "words that the composite quality rules still pass group"
)

_LANG_IN = ", ".join("'" + l + "'" for l in _LANG_ALLOW)
_PII_SQL = (
    "|| CASE WHEN doc_id % 7 = 0"
    " THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0"
    " THEN ' call +1 555 0' || CAST(doc_id % 100 AS VARCHAR) || ' 4242'"
    " ELSE '' END"
)
_KEEP_Q_SQL = f"""(lang IN ({_LANG_IN})
        AND n_tokens BETWEEN {_CMP_MIN_TOKENS} AND {_CMP_MAX_TOKENS}
        AND mean_tok BETWEEN {_MIN_MEAN_TOK} AND {_MAX_MEAN_TOK}
        AND digit_frac <= {_MAX_DIGIT_FRAC})"""


def _gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted gate corpus: (doc_id, lang, text) with the duplicate
    sentinel replacement and the PII appends, exactly as the oracle's
    ``vaug`` CTE builds it."""
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    grp = (F.expr(f"doc_id div {_DUP_MOD}") % _DUP_GROUPS).cast("string")
    base = F.when(
        F.col("doc_id") % _DUP_MOD == 0,
        F.concat(F.lit(_DUP_SENTINEL + " "), grp),
    ).otherwise(F.col("text"))
    planted = F.concat(
        base,
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call +1 555 0"),
                (F.col("doc_id") % 100).cast("string"),
                F.lit(" 4242"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", "lang", planted.alias("text"))


@register(
    "stream_curation_verdicts",
    rf"""
    WITH vaug AS (
      SELECT doc_id, lang,
             (CASE WHEN doc_id % {_DUP_MOD} = 0
                   THEN '{_DUP_SENTINEL} ' || CAST((doc_id // {_DUP_MOD}) % {_DUP_GROUPS} AS VARCHAR)
                   ELSE text END)
             {_PII_SQL} AS text
      FROM documents
    ),
    vfp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM vaug
    ),
    vded AS (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS keep_dedup
      FROM vfp
    ),
    {_QC_TRAIN_CTES},
    vt AS (
      SELECT doc_id, lang, text,
             string_split_regex(lower(trim(text)), '\s+') AS t,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             greatest(length(text), 1) AS n_chars
      FROM vaug
    ),
    vfeat AS (
      SELECT doc_id, lang, text,
             len(t) AS n_tokens,
             1.0 AS one,
             CAST(len(t) AS DOUBLE) / 1000.0 AS ntok_k,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
             CAST(len(list_filter(t, x -> x IN ({_QC_STOP_IN}))) AS DOUBLE) / len(t) AS stop_frac,
             CAST(list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT)))
                  AS DOUBLE) / greatest(len(t), 1) AS mean_tok,
             CAST(n_digits AS DOUBLE) / n_chars AS digit_frac
      FROM vt
    ),
    vver AS (
      SELECT v.doc_id AS doc_id,
             vded.keep_dedup AS keep_dedup,
             {_KEEP_Q_SQL} AS keep_q,
             round(1.0 / (1.0 + exp(-({_QC_XB_SQL}))), {_QC_SCORE_ROUND}) AS quality_score,
             round(1.0 / (1.0 + exp(-({_QC_XB_SQL}))), {_QC_SCORE_ROUND}) >= 0.5 AS pred_keep,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
             length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                   '{_PHONE_RE}', '<PHONE>', 'g')) AS n_chars_scrubbed
      FROM vfeat v JOIN vded USING (doc_id), {_QC_COEF_CTE}
    )
    SELECT doc_id, keep_dedup, keep_q, quality_score, pred_keep,
           n_emails, n_phones, n_chars_scrubbed,
           (keep_dedup AND keep_q) AS keep
    FROM vver
    """,
)
def stream_curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from streaming_data_pipeline_capstone_spark.streaming.curation_stream import (
        run_stream_curation_verdicts,
    )

    beta = fit_quality_model(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="stream_curation_verdicts_")
    # the returned frame reads the job's verdict parquet lazily — clean up
    # at interpreter exit, after the caller has consumed it
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return run_stream_curation_verdicts(
        spark, _gate_docs(spark, sf_dir), beta, work, chunks=3
    )
