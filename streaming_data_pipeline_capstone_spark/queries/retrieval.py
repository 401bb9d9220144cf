"""Text retrieval — Okapi BM25 top-k over the documents table, the
sparse-retrieval complement to the dense ANN family in queries/extras.py
(a training-data pipeline uses both: BM25 for decontamination lookups,
targeted corpus search, and hybrid retrieval candidate generation).

Model (Robertson et al.'s BM25 with the Lucene IDF variant, all public):

    score(D, Q) = Σ_{t ∈ Q} IDF(t) · tf(t,D)·(k1+1)
                             / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    IDF(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

100 TB shape — the term filter IS the plan:

- the per-(doc, term) frequency table is built by exploding tokens and
  filtering to the query's terms BEFORE any exchange, so the groupBy
  shuffles only occurrences of the |Q| query terms (a vanishing fraction
  of the corpus; the filter is a literal IN-list evaluated inside the
  scan's codegen span);
- df/IDF is a |Q|-row aggregate of that same filtered frame — metadata;
  it broadcasts onto the tf table;
- N and avgdl are a 1-row broadcast frame from one corpus scan (token
  counting is per-row, shuffle-free);
- the final top-k compiles to TakeOrderedAndProject — per-partition
  heaps, no global sort.

Cross-engine determinism: per-(doc, term) BM25 contributions are rounded
ONCE to integer micro-units; the per-doc score is an INTEGER sum of ≤|Q|
of those — bit-identical under any aggregation order in both engines
(the mixture_dsir_weights convention; a float Σ over terms would be
association-order-dependent).

Reference parity: the reference has no text retrieval (its pipeline ends
at geo/kinematic analytics); this is part of the LLM-training-data
mandate alongside the dedup/ANN/curation families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.textstats import tokens
from streaming_data_pipeline_capstone_spark.registry import register
from streaming_data_pipeline_capstone_spark.sources.readers import read_table

_K1 = 1.2
_B = 0.75
_MICRO = 1_000_000
_TOPK = 20
# the standing demo query: four corpus terms of clearly different
# document frequency (checked non-vacuous by tests/test_retrieval.py)
_QUERY_TERMS = ["hash", "join", "window", "scan"]


def _bm25_scores(
    spark: SparkSession, sf_dir: str, terms: list[str]
) -> DataFrame:
    """(doc_id, score_micro): integer micro-unit BM25 score of every doc
    matching ≥1 query term."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    lens = docs.select("doc_id", F.size("t").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "avgdl",
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (_K1 + 1.0))
                / (
                    F.col("tf")
                    + _K1
                    * (1.0 - _B + _B * F.col("dl").cast("double") / F.col("avgdl"))
                )
                * _MICRO,
                0,
            )
            .cast("bigint")
            .alias("c_micro"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("c_micro").alias("score_micro")
    )


def _bm25_oracle(terms: list[str], topk: int) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    lens AS (SELECT doc_id, len(t) AS dl FROM d),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     AVG(dl) AS avgdl FROM lens),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM d)
      WHERE term IN ({tl})
      GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term, avgdl,
             ln(1.0 + (n_docs - CAST(count(*) AS DOUBLE) + 0.5)
                      / (CAST(count(*) AS DOUBLE) + 0.5)) AS idf
      FROM tf, stats GROUP BY term, n_docs, avgdl
    ),
    contrib AS (
      SELECT tf.doc_id,
             CAST(round(idf.idf * (tf.tf * {_K1 + 1.0})
                  / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * CAST(lens.dl AS DOUBLE) / idf.avgdl))
                  * {_MICRO}.0, 0) AS BIGINT) AS c_micro
      FROM tf JOIN idf USING (term) JOIN lens USING (doc_id)
    )
    SELECT doc_id, CAST(SUM(c_micro) AS BIGINT) AS score_micro
    FROM contrib GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id ASC
    LIMIT {topk}
    """


@register("text_bm25_topk", _bm25_oracle(_QUERY_TERMS, _TOPK))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for the standing 4-term query, scores as
    integer micro-units (deterministic tiebreak on doc_id)."""
    return (
        _bm25_scores(spark, sf_dir, _QUERY_TERMS)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(_TOPK)
    )
