"""Python UDTF surface (§2.10's last letter): demonstrated, then measured
against the native expression that replaces it in the hot path.

The engine's stance is UDF-free hot paths — every reference UDF became a
native Column expression — but the UDTF API is part of the claimed
surface, so one real UDTF (word n-grams with positions, a lateral
explode no scalar UDF can express) is registered, exercised through SQL
LATERAL, and checked for exact agreement with the native
explode/transform equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="idx int, gram string")
class WordNGrams:
    """Yield (position, n-gram) pairs for the whitespace tokens of text."""

    def eval(self, text: str, n: int):
        toks = (text or "").lower().split()
        for i in range(max(0, len(toks) - n + 1)):
            yield i, " ".join(toks[i : i + n])


def test_udtf_lateral_matches_native_ngrams(spark, sf_smoke):
    spark.udtf.register("word_ngrams", WordNGrams)
    docs = spark.read.parquet(sf_smoke + "/documents.parquet")
    docs.limit(50).createOrReplaceTempView("docs_sample")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, g.idx, g.gram
        FROM docs_sample d, LATERAL word_ngrams(d.text, 2) g
        """
    )

    t = F.split(F.lower(F.trim("text")), r"\s+")
    native = (
        docs.limit(50)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(0))),
                    lambda i: F.array_join(F.slice(t, i, 2), " "),
                )
            ).alias("idx", "gram"),
        )
    )
    got = {(r["doc_id"], r["idx"], r["gram"]) for r in via_udtf.collect()}
    want = {(r["doc_id"], r["idx"], r["gram"]) for r in native.collect()}
    assert got == want and got, "UDTF output must equal the native expression"
