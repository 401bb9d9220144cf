"""Similarity search over embedding columns (driver mandate X3).

Two paths:

- brute-force cosine top-k — the exactness baseline. Dot products are
  native array expressions (zip_with + aggregate), computed in float64
  left-to-right so results are bit-reproducible across engines. One scan,
  one TakeOrderedAndProject — no shuffle beyond the top-k reduction.
- random-hyperplane LSH — the 100 TB path. Vectors bucket by the sign
  pattern of d dot products with deterministic pseudo-random planes
  (plane[j][i] = sin(j·1009 + i), portable to any SQL engine); the
  pairwise work then happens only inside buckets. Candidates are verified
  with exact cosine.

At real scale the LSH variant's bucket join shuffles on the 2^d-ary
signature — skew-free for isotropic embeddings — and each bucket fits in
an executor; brute-force against a FIXED query set stays a broadcast of
the queries over one scan of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — left-to-right fold, deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The query is a literal array (broadcast by construction); ordering
    uses the rounded score with the id as tiebreak so ranking is
    deterministic at float noise level.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine(_as_double(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def hyperplane_signature(
    vec: Column | str, num_planes: int = 8, dim: int = 64
) -> Column:
    """LSH bucket id: sign bits of dot products with deterministic planes.

    plane[j][i] = sin(j·1009 + i) — fixed, seedless, identical in every
    engine and run. Returns a bit-string like '01101001'.
    """
    v = _as_double(vec)
    bits = []
    for j in range(num_planes):
        plane = F.array(*[F.sin(F.lit(float(j * 1009 + i))) for i in range(dim)])
        bits.append(F.when(dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_similar_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """All (id1 < id2) pairs with cosine ≥ threshold, found via hyperplane
    buckets and verified exactly."""
    tagged = corpus.select(
        F.col(id_col).alias("vid"),
        _as_double(vec_col).alias("v"),
        hyperplane_signature(vec_col, num_planes, dim).alias("sig"),
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    cands = a.join(
        b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("id1"),
        F.col("b.vid").alias("id2"),
        F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine_sim"),
    )
    return cands.filter(F.col("cosine_sim") >= threshold)


def brute_force_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (validation / small corpora).

    O(n²) — at scale use lsh_similar_pairs; kept as the oracle-checkable
    ground truth the LSH recall is measured against.
    """
    tagged = corpus.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"))
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id1"),
            F.col("b.vid").alias("id2"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
