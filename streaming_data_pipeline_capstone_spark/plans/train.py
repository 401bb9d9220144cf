"""Closed-form linear-model training on Spark — the genuinely-trained
replacement for the reference's declared-but-never-built trajectory
predictor (reference README.md:5-6,94,98; predict_path.py's scoring
stage, SURVEY §3.3 stratum D).

Training is ordinary least squares by the NORMAL EQUATIONS, computed the
only way that survives 100 TB: the sufficient statistics X'X (d x d) and
X'y (d) are plain SUM aggregates of column products — map-side partial
aggregation everywhere, one tiny final row to the driver, a d x d solve
in numpy. No gradient loop, no per-row driver traffic; the same
tiny-metadata-to-driver shape as the deterministic Lloyd's trainer in
queries/extras.py (sim_topk_kmeans_ivf).

Determinism across engines (the oracle problem): float SUM order differs
between Spark partitions and DuckDB, so raw sums agree only to ~1e-9
relative. Both engines therefore ROUND the sufficient statistics (3 dp —
orders of magnitude above the accumulation noise, orders below the
signal) before solving, and ROUND the solved coefficients (8 dp) before
predicting. Identical stats + identical rounding = identical
coefficients = bit-identical predictions from the same linear formula.

The DuckDB twin replicates TRAINING, not just scoring: the same rounded
sums feed a generated Cramer's-rule expansion (``cramer_sql``), so the
oracle check covers the whole pipeline — feature build, split, normal
equations, solve, predict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAT_ROUND = 3   # dp for sufficient statistics (see module docstring)
COEF_ROUND = 8   # dp for solved coefficients


def xtx_xty_sums(df: DataFrame, features: list[str], target: str) -> list[F.Column]:
    """The aggregate columns for X'X (upper triangle) and X'y.

    Aliases: ``s_{i}_{j}`` for sum(f_i * f_j), ``t_{i}`` for
    sum(f_i * y), ``n`` for count. Every one is a map-side-combinable
    SUM — the whole training pass is one scan + one tiny exchange.
    """
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("n")]
    for i, fi in enumerate(features):
        for j, fj in enumerate(features):
            if j < i:
                continue
            aggs.append(
                F.round(F.sum(F.col(fi) * F.col(fj)), STAT_ROUND).alias(f"s_{i}_{j}")
            )
        aggs.append(F.round(F.sum(F.col(fi) * F.col(target)), STAT_ROUND).alias(f"t_{i}"))
    return aggs


def solve_normal_equations(stats_row, d: int) -> list[float]:
    """Solve (X'X) beta = X'y from one collected stats row; returns
    coefficients rounded to COEF_ROUND dp. The only driver-side compute
    in the training path, on a d x d matrix."""
    import numpy as np

    xtx = np.empty((d, d))
    xty = np.empty(d)
    for i in range(d):
        for j in range(d):
            key = f"s_{min(i, j)}_{max(i, j)}"
            xtx[i, j] = stats_row[key]
        xty[i] = stats_row[f"t_{i}"]
    beta = np.linalg.solve(xtx, xty)
    return [round(float(b), COEF_ROUND) for b in beta]


def fit_ols(df: DataFrame, features: list[str], target: str) -> list[float]:
    """Train OLS on ``df`` (already filtered to the training split).

    One aggregation job; returns the rounded coefficient list, one per
    feature (include a literal-1 column for an intercept).
    """
    stats = df.agg(*xtx_xty_sums(df, features, target)).collect()[0]
    return solve_normal_equations(stats, len(features))


def predict_expr(features: list[str], coefs: list[float], out_round: int = 5) -> F.Column:
    """The fitted model as a native Column expression (no UDF): the dot
    product of literal coefficients with the feature columns."""
    expr = F.lit(0.0)
    for c, f in zip(coefs, features):
        expr = expr + F.lit(c) * F.col(f)
    return F.round(expr, out_round)


# -- SQL generation for the oracle twin --------------------------------------

def _det_sql(m: list[list[str]]) -> str:
    """Determinant of a matrix of SQL expressions by Laplace expansion —
    generated text, evaluated by DuckDB. Fine for the d<=4 models here."""
    n = len(m)
    if n == 1:
        return m[0][0]
    terms = []
    for j in range(n):
        minor = [row[:j] + row[j + 1 :] for row in m[1:]]
        sign = "+" if j % 2 == 0 else "-"
        terms.append(f"{sign} ({m[0][j]}) * ({_det_sql(minor)})")
    return " ".join(terms)


def stats_sql(feature_exprs: list[str], target_expr: str) -> str:
    """The DuckDB twin of xtx_xty_sums: identical aliases, identical
    rounding, over SQL feature expressions."""
    cols = ["count(*) AS n"]
    for i, fi in enumerate(feature_exprs):
        for j in range(i, len(feature_exprs)):
            cols.append(
                f"round(sum(({fi}) * ({feature_exprs[j]})), {STAT_ROUND}) AS s_{i}_{j}"
            )
        cols.append(f"round(sum(({fi}) * ({target_expr})), {STAT_ROUND}) AS t_{i}")
    return ", ".join(cols)


def cramer_sql(d: int) -> str:
    """SELECT list solving the d x d normal equations from a stats row
    with columns ``s_i_j`` / ``t_i`` (as emitted by xtx_xty_sums), via
    Cramer's rule; emits ``c0..c{d-1}`` rounded to COEF_ROUND dp."""
    a = [[f"s_{min(i, j)}_{max(i, j)}" for j in range(d)] for i in range(d)]
    det = _det_sql(a)
    cols = []
    for k in range(d):
        ak = [[(f"t_{i}" if j == k else a[i][j]) for j in range(d)] for i in range(d)]
        cols.append(f"round(({_det_sql(ak)}) / ({det}), {COEF_ROUND}) AS c{k}")
    return ", ".join(cols)
