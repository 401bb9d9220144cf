"""Query registry — the driver-facing inventory.

Every operator from SURVEY §2 that is implemented gets a named entry here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
a matching ANSI-SQL oracle string for DuckDB. The driver hash-compares the
two at sf=0.01; ``tools/check_oracle.py`` runs the same comparison locally.

Conventions that keep the hash comparison meaningful:
- every computed column is aliased identically in Spark and SQL
- floating-point outputs are rounded (typically 6 dp) *in both* engines
- nondeterministic orderings get explicit deterministic tiebreaks
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports).

    Import order is registration order is ``queries()`` dict order, and
    the driver's correctness gate samples a window of that order — so the
    modules whose queries have appeared least in past CORRECTNESS_r*.json
    artifacts (scalars, streaming_like, trained, and relational's
    window/asof rows — all LOCALCHECK-green every round but rarely
    driver-sampled) are imported FIRST this round to rotate them into the
    driver's sample (VERDICT r8 ask #5)."""
    from streaming_data_pipeline_capstone_spark.queries import scalars  # noqa: F401
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        streaming_like,
    )
    from streaming_data_pipeline_capstone_spark.queries import trained  # noqa: F401
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        relational,
    )
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        curation,
        extras,
        flagship,
        llm_ops,
        quality,
    )


_LOADED = False


def all_queries() -> dict[str, QueryFn]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return dict(ORACLES)
