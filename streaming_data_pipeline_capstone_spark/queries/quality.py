"""Training-data curation queries beyond the basic text stats: repetition-
based quality filtering (Gopher-style), the end-to-end dedup keep-list,
int8 embedding quantization, and a hierarchical time rollup.

These are the operations a 100 TB pretraining pipeline actually runs
between "raw crawl" and "training shards":

- repetition signals (top token / top bigram / repeated-token fractions)
  are the strongest cheap predictors of boilerplate and spam (cf. the
  published Gopher/MassiveText filtering rules);
- the keep-list is the *decision* form of dedup — pairs and clusters are
  intermediates, what ships is "keep this doc or not";
- int8 quantization is the standard 4× memory cut for embedding indexes;
- multi-resolution rollups make dashboard-grain queries read pre-aggregated
  rows instead of rescanning raw events;
- the trained quality classifier (`quality_classifier_trained`) is the
  production form of quality filtering — a logistic model distilling the
  rule cascade into four per-row arithmetic expressions, trained on-the-
  data by damped IRLS (plans/train.py) with the training loop itself
  oracle-checked via unrolled SQL.

Every entry is oracle-checked against DuckDB, fractions computed as
int/int double divisions (bit-identical across engines) so even the
pass/fail booleans hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.skew import spread_small_input
from streaming_data_pipeline_capstone_spark.operators.textstats import tokens
from streaming_data_pipeline_capstone_spark.plans.train import (
    dot_expr,
    fit_logistic_irls,
    irls_iterations_sql,
)
from streaming_data_pipeline_capstone_spark.registry import register
from streaming_data_pipeline_capstone_spark.sources.readers import read_table

# fixed EN stopword probe set for the coverage signal (a doc with no
# function words at all is usually not prose). Must match the oracle SQL.
_STOPWORDS = ["the", "and", "of", "to", "a", "is", "in", "that", "it", "for"]

# Gopher-style acceptance thresholds (fixed, mirrored in both engines;
# integer-ratio doubles, so the boolean is hash-stable).
_MIN_TOKENS, _MAX_TOKENS = 10, 100_000
_MAX_TOP_TOKEN_FRAC = 0.20
_MAX_REPEATED_FRAC = 0.50
_MAX_TOP_BIGRAM_FRAC = 0.18
_MIN_STOPWORD_FRAC = 0.02


# -- X4+: repetition/quality filter ------------------------------------------
# ONE explode + TWO exchanges for all signals: tokens and bigrams are
# tagged ('u'/'b') into a single item array, counted per (doc, kind, item),
# then rolled up per doc with conditional aggregates. Partial (map-side)
# aggregation absorbs the explode fan-out before either shuffle, and the
# shuffle key is (doc_id, ...) — perfectly spreadable at any corpus size.
@register(
    "text_quality_gopher",
    f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    u AS (
      SELECT doc_id, 'u' AS kind, unnest(t) AS item FROM d
      UNION ALL
      SELECT doc_id, 'b' AS kind,
             unnest(list_transform(range(1, len(t)), i -> concat(t[i], ' ', t[i+1])))
      FROM d WHERE len(t) >= 2
    ),
    c AS (
      SELECT doc_id, kind, item, COUNT(*) AS c FROM u GROUP BY doc_id, kind, item
    ),
    s AS (
      SELECT doc_id,
             -- CAST: DuckDB promotes SUM(BIGINT) to HUGEINT, which pandas
             -- renders as float64 while Spark emits int64 — the driver's
             -- dtype-sensitive hash would see 123.0 vs 123.
             CAST(SUM(c) FILTER (WHERE kind = 'u') AS BIGINT) AS n_tokens,
             COUNT(*) FILTER (WHERE kind = 'u') AS n_distinct_tokens,
             MAX(c) FILTER (WHERE kind = 'u') AS top_c,
             COALESCE(SUM(c) FILTER (WHERE kind = 'u' AND c >= 2), 0) AS rep_c,
             COALESCE(MAX(c) FILTER (WHERE kind = 'b'), 0) AS top_bg_c,
             COALESCE(SUM(c) FILTER (WHERE kind = 'u'
               AND item IN ({', '.join("'" + w + "'" for w in _STOPWORDS)})), 0) AS stop_c
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct_tokens,
           round(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_token_frac,
           round(CAST(rep_c AS DOUBLE) / n_tokens, 6) AS repeated_token_frac,
           round(CAST(top_bg_c AS DOUBLE) / greatest(n_tokens - 1, 1), 6) AS top_bigram_frac,
           round(CAST(stop_c AS DOUBLE) / n_tokens, 6) AS stopword_frac,
           (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
            AND CAST(top_c AS DOUBLE) / n_tokens <= {_MAX_TOP_TOKEN_FRAC}
            AND CAST(rep_c AS DOUBLE) / n_tokens <= {_MAX_REPEATED_FRAC}
            AND CAST(top_bg_c AS DOUBLE) / greatest(n_tokens - 1, 1) <= {_MAX_TOP_BIGRAM_FRAC}
            AND CAST(stop_c AS DOUBLE) / n_tokens >= {_MIN_STOPWORD_FRAC}) AS passes_quality
    FROM s
    """,
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_small_input: the tokenize/explode below runs in the scan
    # stage; a single-row-group gate file would serialize it (guide §2.5
    # input skew — no-op at real file counts).
    docs = spread_small_input(read_table(spark, sf_dir, "documents"))
    # token array projected into its own column: it is referenced three
    # times below and Catalyst's CollapseProject would otherwise inline
    # (and re-evaluate) the split per reference.
    with_t = docs.select("doc_id", tokens("text").alias("t"))
    t = F.col("t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    items = F.concat(
        F.transform(t, lambda x: F.struct(F.lit("u").alias("kind"), x.alias("item"))),
        F.transform(bigrams, lambda x: F.struct(F.lit("b").alias("kind"), x.alias("item"))),
    )
    exploded = with_t.select("doc_id", F.explode(items).alias("kv")).select(
        "doc_id", F.col("kv.kind").alias("kind"), F.col("kv.item").alias("item")
    )
    counts = exploded.groupBy("doc_id", "kind", "item").agg(F.count("*").alias("c"))
    is_u = F.col("kind") == "u"
    c = F.col("c")
    s = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_u, c)).alias("n_tokens"),
        F.count(F.when(is_u, 1)).alias("n_distinct_tokens"),
        F.max(F.when(is_u, c)).alias("top_c"),
        F.coalesce(F.sum(F.when(is_u & (c >= 2), c)), F.lit(0)).alias("rep_c"),
        F.coalesce(F.max(F.when(~is_u, c)), F.lit(0)).alias("top_bg_c"),
        F.coalesce(F.sum(F.when(is_u & F.col("item").isin(_STOPWORDS), c)), F.lit(0)).alias("stop_c"),
    )
    n = F.col("n_tokens")
    top_frac = F.col("top_c").cast("double") / n
    rep_frac = F.col("rep_c").cast("double") / n
    bg_frac = F.col("top_bg_c").cast("double") / F.greatest(n - 1, F.lit(1))
    stop_frac = F.col("stop_c").cast("double") / n
    return s.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.round(top_frac, 6).alias("top_token_frac"),
        F.round(rep_frac, 6).alias("repeated_token_frac"),
        F.round(bg_frac, 6).alias("top_bigram_frac"),
        F.round(stop_frac, 6).alias("stopword_frac"),
        (
            n.between(_MIN_TOKENS, _MAX_TOKENS)
            & (top_frac <= _MAX_TOP_TOKEN_FRAC)
            & (rep_frac <= _MAX_REPEATED_FRAC)
            & (bg_frac <= _MAX_TOP_BIGRAM_FRAC)
            & (stop_frac >= _MIN_STOPWORD_FRAC)
        ).alias("passes_quality"),
    )


# -- X2 decision form: the dedup keep-list -----------------------------------
# pairs → connected components → keep = "not a duplicate, or the cluster
# representative (min id)". This is the row-level verdict a pipeline
# actually joins against its corpus; clusters/pairs are intermediates.
# Edge set = exact n-gram Jaccard ≥ 0.6 so both engines agree on it
# (same construction as dedup_clusters); components via iterative Hash-Min
# on the Spark side vs a recursive-CTE transitive closure in the oracle.
@register(
    "dedup_keep_list",
    """
    WITH RECURSIVE sets AS (
      SELECT doc_id AS doc,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(t)-1),
                         i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) END AS shingles
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents)
    ),
    sh AS (SELECT doc, unnest(shingles) AS s FROM sets),
    cand AS (
      SELECT DISTINCT a.doc AS d1, b.doc AS d2
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
    ),
    verified AS (
      SELECT d1, d2 FROM cand
      JOIN sets s1 ON s1.doc = d1 JOIN sets s2 ON s2.doc = d2
      WHERE round(CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
              / (len(s1.shingles) + len(s2.shingles)
                 - len(list_intersect(s1.shingles, s2.shingles))), 6) >= 0.6
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM verified
      UNION SELECT d2, d1 FROM verified
    ),
    reach AS (
      SELECT a AS d, a AS m FROM edges
      UNION
      SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.d
    ),
    comp AS (SELECT d AS node, MIN(m) AS component FROM reach GROUP BY d)
    SELECT doc_id,
           (comp.component IS NULL OR comp.component = doc_id) AS keep
    FROM documents LEFT JOIN comp ON comp.node = doc_id
    """,
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_pipeline_capstone_spark.operators.dedup import (
        connected_components,
        minhash_lsh_dedup,
    )

    docs = read_table(spark, sf_dir, "documents")
    # LSH candidates, not the exact inverted index — see dedup_clusters
    # (queries/extras.py): identical pair set at this threshold/config
    # (pinned by test), scale path that survives sf100 where the exact
    # path's bucket pair enumeration out-spilled the sandbox disk.
    pairs = minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.6)
    comp = connected_components(pairs)
    return docs.select("doc_id").join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id",
        (F.col("component").isNull() | (F.col("component") == F.col("doc_id"))).alias("keep"),
    )


# -- X3+: symmetric int8 embedding quantization ------------------------------
# scale = max(|v|)/127 per vector; q_i = round(v_i / scale) ∈ [-127, 127].
# The standard 4× memory cut for ANN indexes (float32 → int8) — at 100 TB
# the index either fits executor memory quantized or doesn't fit at all.
# Pure codegen'd array exprs, zero shuffles; the quantized array is
# emitted CSV-stringified so the driver's canonicalizer can hash it
# (same lesson as multimodal_extract_features round 1).
@register(
    "emb_quantize_int8",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-12) AS sc
      FROM e
    )
    SELECT vec_id,
           round(sc, 9) AS scale,
           array_to_string(
             list_transform(v, x -> CAST(CAST(round(x / sc) AS INTEGER) AS VARCHAR)),
             ',') AS q_csv
    FROM s
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    with_v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # scale projected into a column: referenced once per vector element by
    # the quantize lambda; inlining would re-reduce the array per element.
    with_scale = with_v.select(
        "vec_id",
        "v",
        F.greatest(
            F.array_max(F.transform("v", F.abs)) / F.lit(127.0), F.lit(1e-12)
        ).alias("sc"),
    )
    q = F.transform("v", lambda x: F.round(x / F.col("sc")).cast("int"))
    return with_scale.select(
        "vec_id",
        F.round("sc", 9).alias("scale"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias("q_csv"),
    )


# -- hierarchical rollup: 5-min grain computed FROM the 1-min grain ----------
# The hypertable/continuous-aggregate pattern: coarse grains read the next
# finer grain's pre-aggregated rows, never the raw events. Only algebraic
# aggregates compose (count/sum/min/max; avg derived from sums at the
# end), which is exactly what this materializes. The oracle aggregates
# raw → 5-min directly, so a hash match PROVES the two-level cascade is
# lossless. One exchange per grain, keyed (event_type, bucket) — at 100 TB
# each grain is ~60× smaller than its input.
@register(
    "rollup_events_multires",
    """
    SELECT event_type,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket_start,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value,
           round(MIN(value), 6) AS min_value,
           round(MAX(value), 6) AS max_value,
           round(SUM(value) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY event_type, bucket_start
    """,
)
def rollup_events_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    m1 = events.groupBy(
        "event_type", F.window("ts", "1 minute").alias("w1")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    m5 = m1.groupBy(
        "event_type", F.window(F.col("w1.start"), "5 minutes").alias("w5")
    ).agg(
        F.sum("cnt").alias("n_events"),
        F.sum("sv").alias("sum_raw"),
        F.min("mn").alias("min_value_raw"),
        F.max("mx").alias("max_value_raw"),
    )
    return m5.select(
        "event_type",
        F.col("w5.start").alias("bucket_start"),
        "n_events",
        F.round("sum_raw", 4).alias("sum_value"),
        F.round("min_value_raw", 6).alias("min_value"),
        F.round("max_value_raw", 6).alias("max_value"),
        F.round(F.col("sum_raw") / F.col("n_events"), 6).alias("avg_value"),
    )


# -- trained quality classifier (logistic regression by damped IRLS) ----------
# The production quality-model shape (fastText/DCLM-style): the expensive
# rule cascade (text_quality_gopher needs the full unigram+bigram explode)
# becomes the WEAK LABEL for a cheap linear model over per-row features
# that need no shuffle at all — at 100 TB you run the rules once on a
# slice, fit the model, and score the whole corpus with four arithmetic
# expressions per row. Training is genuinely on-the-data: _QC_ITERS
# damped-IRLS iterations, each one map-side-combinable aggregation of
# weighted sufficient statistics (plans/train.py fit_logistic_irls — the
# X'WX/X'Wz analogue of the OLS trainer) over the PERSISTED training
# split, solved on the driver by the Cramer mirror of the oracle's
# generated SQL. The only driver traffic is iters tiny stats rows.
#
# The oracle replicates the ENTIRE pipeline — features, weak label,
# split, all three IRLS iterations (unrolled CTEs from
# irls_iterations_sql), solve, and scoring — so CORRECTNESS covers the
# training loop itself, like the trained OLS and trained-k-means
# precedents. Output is the HELD-OUT docs (doc_id % 5 == 4) with the
# model's score/decision next to the rule label; the accuracy gate lives
# in tests/test_quality.py (model must beat the majority-class baseline).
_QC_FEATURES = ["one", "ntok_k", "ttr", "stop_frac"]
_QC_HOLDOUT_MOD = 5
_QC_ITERS = 3
_QC_SCORE_ROUND = 6

_QC_STOP_IN = ", ".join("'" + w + "'" for w in _STOPWORDS)
_QC_LABEL_RULE = f"""(n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
            AND CAST(top_c AS DOUBLE) / n_tokens <= {_MAX_TOP_TOKEN_FRAC}
            AND CAST(rep_c AS DOUBLE) / n_tokens <= {_MAX_REPEATED_FRAC}
            AND CAST(top_bg_c AS DOUBLE) / greatest(n_tokens - 1, 1) <= {_MAX_TOP_BIGRAM_FRAC}
            AND CAST(stop_c AS DOUBLE) / n_tokens >= {_MIN_STOPWORD_FRAC})"""

_QC_IRLS_SQL, _QC_COEF_CTE = irls_iterations_sql("tr", _QC_FEATURES, "y", _QC_ITERS)
_QC_XB_SQL = " + ".join(f"c{k} * ({f})" for k, f in enumerate(_QC_FEATURES))

# The full training pipeline as a reusable CTE prefix (features, weak
# label, split, unrolled IRLS iterations, final coefficients in
# _QC_COEF_CTE) — shared verbatim by quality_classifier_trained below and
# the streaming-verdicts oracle (queries/stream_curation.py, r11), so the
# two gates certify the SAME trained model.
_QC_TRAIN_CTES = f"""d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tok,
             1.0 AS one,
             CAST(len(t) AS DOUBLE) / 1000.0 AS ntok_k,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
             CAST(len(list_filter(t, x -> x IN ({_QC_STOP_IN}))) AS DOUBLE) / len(t) AS stop_frac
      FROM d
    ),
    u AS (
      SELECT doc_id, 'u' AS kind, unnest(t) AS item FROM d
      UNION ALL
      SELECT doc_id, 'b' AS kind,
             unnest(list_transform(range(1, len(t)), i -> concat(t[i], ' ', t[i+1])))
      FROM d WHERE len(t) >= 2
    ),
    c AS (
      SELECT doc_id, kind, item, COUNT(*) AS c FROM u GROUP BY doc_id, kind, item
    ),
    s AS (
      SELECT doc_id,
             CAST(SUM(c) FILTER (WHERE kind = 'u') AS BIGINT) AS n_tokens,
             MAX(c) FILTER (WHERE kind = 'u') AS top_c,
             COALESCE(SUM(c) FILTER (WHERE kind = 'u' AND c >= 2), 0) AS rep_c,
             COALESCE(MAX(c) FILTER (WHERE kind = 'b'), 0) AS top_bg_c,
             COALESCE(SUM(c) FILTER (WHERE kind = 'u'
               AND item IN ({_QC_STOP_IN})), 0) AS stop_c
      FROM c GROUP BY doc_id
    ),
    lab AS (SELECT doc_id, {_QC_LABEL_RULE} AS passes_quality FROM s),
    j AS (
      SELECT feat.*, lab.passes_quality,
             CASE WHEN lab.passes_quality THEN 1.0 ELSE 0.0 END AS y
      FROM feat JOIN lab USING (doc_id)
    ),
    tr AS (SELECT * FROM j WHERE doc_id % {_QC_HOLDOUT_MOD} <> {_QC_HOLDOUT_MOD - 1}),
    {_QC_IRLS_SQL}"""


@register(
    "quality_classifier_trained",
    f"""
    WITH {_QC_TRAIN_CTES}
    SELECT doc_id, n_tok, ttr, stop_frac,
           round(1.0 / (1.0 + exp(-({_QC_XB_SQL}))), {_QC_SCORE_ROUND}) AS quality_score,
           round(1.0 / (1.0 + exp(-({_QC_XB_SQL}))), {_QC_SCORE_ROUND}) >= 0.5 AS pred_keep,
           passes_quality
    FROM j, {_QC_COEF_CTE}
    WHERE doc_id % {_QC_HOLDOUT_MOD} = {_QC_HOLDOUT_MOD - 1}
    """,
)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streaming_data_pipeline_capstone_spark.cache import scoped_persist

    # One materialization of the labeled frame serves BOTH halves: the
    # IRLS trainer's aggregation jobs (its own persist of the train split
    # populates through this cache) and the held-out scoring pass — the
    # gopher-label join chain previously re-ran for the holdout at
    # action time (r15; scoped: released when the next query builds).
    j = scoped_persist(_qc_labeled_frame(spark, sf_dir))
    holdout = F.col("doc_id") % _QC_HOLDOUT_MOD == _QC_HOLDOUT_MOD - 1
    beta = fit_logistic_irls(j.filter(~holdout), _QC_FEATURES, "y", _QC_ITERS)
    return score_quality(j.filter(holdout), beta).select(
        "doc_id",
        "n_tok",
        "ttr",
        "stop_frac",
        "quality_score",
        "pred_keep",
        "passes_quality",
    )


def qc_feature_frame(docs: DataFrame) -> DataFrame:
    """The classifier's shuffle-free per-row features over any frame with
    (doc_id, text) — batch or STREAMING (every expression is stateless, so
    the same column set scores a document stream unchanged)."""
    with_t = docs.select("doc_id", tokens("text").alias("t"))
    t = F.col("t")
    n = F.size(t)
    return with_t.select(
        "doc_id",
        n.cast("bigint").alias("n_tok"),
        F.lit(1.0).alias("one"),
        (n.cast("double") / F.lit(1000.0)).alias("ntok_k"),
        (F.size(F.array_distinct(t)).cast("double") / n).alias("ttr"),
        (
            F.size(F.filter(t, lambda x: x.isin(*_STOPWORDS))).cast("double") / n
        ).alias("stop_frac"),
    )


def _qc_labeled_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = qc_feature_frame(read_table(spark, sf_dir, "documents"))
    lab = text_quality_gopher(spark, sf_dir).select("doc_id", "passes_quality")
    return feat.join(lab, "doc_id").withColumn(
        "y", F.col("passes_quality").cast("double")
    )


def fit_quality_model(spark: SparkSession, sf_dir: str) -> list[float]:
    """Train-offline half of the deployment split: fit the logistic model
    on the non-holdout docs and return the rounded coefficients (a handful
    of floats — the entire model artifact)."""
    j = _qc_labeled_frame(spark, sf_dir)
    train = F.col("doc_id") % _QC_HOLDOUT_MOD != _QC_HOLDOUT_MOD - 1
    return fit_logistic_irls(j.filter(train), _QC_FEATURES, "y", _QC_ITERS)


def score_quality(df: DataFrame, beta: list[float]) -> DataFrame:
    """Score-online half: literal-coefficient sigmoid over the feature
    columns. Stateless projection — applies unchanged to a streaming
    frame (see tests/test_streaming.py), which is the 100 TB serving
    shape: the rule cascade and IRLS run offline, ingest scores each doc
    with four arithmetic expressions."""
    xb = dot_expr(_QC_FEATURES, beta)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-xb)), _QC_SCORE_ROUND)
    return df.withColumn("quality_score", score).withColumn(
        "pred_keep", F.col("quality_score") >= 0.5
    )
