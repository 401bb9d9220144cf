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
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry.

    The registered callable releases every scoped-persisted frame from
    EARLIER queries before building its own (see cache.py) — a session
    that runs the registry sequentially holds at most one query's cached
    intermediates at a time, instead of accumulating them forever. The
    undecorated function stays importable for direct composition."""

    def deco(fn: QueryFn) -> QueryFn:
        import functools

        from streaming_data_pipeline_capstone_spark.cache import release_scoped

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports).

    Import order is registration order; r10 rotates the modules whose
    queries the r9 driver window did NOT cover (curation's back half,
    extras, flagship, llm_ops, quality) toward the front — the explicit
    ``_SAMPLE_FIRST`` list below then pins the must-sample names ahead of
    everything."""
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        curation,
        extras,
        flagship,
        llm_ops,
        quality,
    )
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        stream_curation,
    )
    from streaming_data_pipeline_capstone_spark.queries import lm  # noqa: F401
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        retrieval,
    )
    from streaming_data_pipeline_capstone_spark.queries import scalars  # noqa: F401
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        streaming_like,
    )
    from streaming_data_pipeline_capstone_spark.queries import trained  # noqa: F401
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        relational,
    )
    from streaming_data_pipeline_capstone_spark.queries import (  # noqa: F401
        tokenizer,
    )


# The driver's correctness gate samples the FIRST ~50 names of queries()
# dict order. Module import order rotated that window in past rounds, but
# per-module granularity can't express "this round's new queries AND the
# never-sampled stragglers first" (ADVICE r9: a pure rotation pushes the
# newest queries out of the externally-sampled set). This explicit list
# leads the dict: everything NEW or semantically changed in r10/r11 first
# (the streaming verdict job, the de-vacuated gates, the strip twin, the
# DSIR funnel), then the queries driver windows covered least recently.
# Names not in the list follow in registration order. Stale names FAIL
# the suite (tests/test_registry.py) instead of being silently ignored —
# the r10 stream_curation_verdicts delivery gap hid behind exactly that
# tolerance.
_SAMPLE_FIRST = [
    # new or semantically changed in r15 (QLD composed onto the batch and
    # filter serving axes; the batched hybrid answered from STREAMED
    # indexes; the whole dense serving family rerouted through per-corpus
    # serving-model resolution — a no-op at the gate corpora, pinned by
    # these samples)
    "text_qld_multi_topk",
    "text_qld_filtered_topk",
    "retrieval_hybrid_rrf_multi_streamed",
    "sim_topk_ivf_pruned",
    "sim_topk_ivfpq_pruned",
    "sim_topk_ivfpq_rerank_pruned",
    "sim_topk_ivfpq_rerank_spill",
    # new or semantically changed in r14 (the term-bucketed postings
    # layout reroutes the whole BM25/hybrid family; the filtered batched
    # probe composes the r13 filter and batch axes)
    "text_bm25_topk",
    "text_bm25_multi_topk",
    "retrieval_hybrid_rrf",
    "retrieval_hybrid_rrf_ann",
    "retrieval_hybrid_rrf_multi",
    "sim_topk_ivfpq_multi_filtered",
    "text_bm25_filtered_topk",
    "text_qld_topk",
    "stream_text_index_ingest",
    "retrieval_hybrid_rrf_multi_filtered",
    # new or semantically changed in r13
    "sim_topk_ivfpq_filtered",
    "sim_topk_ivfpq_rerank_incr",
    "stream_ann_index_ingest",
    "sim_topk_ivfpq_multi",
    "tokenizer_bpe_encode_fixed",
    "pipeline_chunk_pack",
    # new in r12
    "tokenizer_bpe_train",
    "tokenizer_bpe_encode",
    "chunk_fixed_tokens",
    "curation_domain_cap",
    "corpus_health_lm_by_source",
    # new in r11
    "stream_curation_verdicts",
    "sim_topk_ivfpq_rerank_spill",
    "quality_lm_perplexity",
    "quality_lm_ppl_buckets",
    "decontam_bloom_prefilter_w8",
    "corpus_health_by_source",
    # new or semantically changed in r10
    "text_dup_spans_strip_hashed",
    "pipeline_curation_dsir",
    "sim_lsh_pairs_banded_neardup",
    "decontam_ngram_overlap_w8",
    "join_anti_no_urgent_order",
    # least-recently driver-sampled stragglers
    "text_dup_spans_strip",
    "quality_classifier_trained",
    "sim_pq_topk_rerank_fixed",
    "sim_topk_ivfpq_rerank_pruned",
]


def _conditional_names() -> set[str]:
    """Names whose registration is conditional on a generated artifact.

    ``tokenizer_bpe_encode_fixed`` registers only when queries/bpe_vocab.py
    exists (it is regenerated by tools/train_bpe.py, which imports the
    tokenizer module BEFORE the artifact it writes). Listing it
    unconditionally in ``_SAMPLE_FIRST`` made the bootstrap state fail the
    stale-name test — a circular dependency for regenerating the artifact
    (ADVICE r12). The lazy import avoids a registry<->tokenizer import
    cycle at module-init time."""
    try:
        from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
            _HAVE_VOCAB,
        )

        missing = not _HAVE_VOCAB
    except ImportError:
        missing = True
    return {"tokenizer_bpe_encode_fixed"} if missing else set()


def sample_first() -> list[str]:
    """``_SAMPLE_FIRST`` minus conditionally-registered names whose
    artifact is absent — the list the stale-name test pins against."""
    cond = _conditional_names()
    return [n for n in _SAMPLE_FIRST if n not in cond]


def _sample_ordered(d: dict) -> dict:
    out = {n: d[n] for n in sample_first() if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


_LOADED = False


def all_queries() -> dict[str, QueryFn]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return _sample_ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return _sample_ordered(ORACLES)
