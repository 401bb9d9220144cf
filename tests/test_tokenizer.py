"""BPE tokenizer (queries/tokenizer.py): learned merges pinned against an
independent classic Sennrich-style reference implementation (including the
consecutive-occurrence case the double-space replace must get right),
encode consistency, and chunking hand-checks."""

from __future__ import annotations

import collections
import hashlib

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_capstone_spark.operators.textstats import tokens
from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
    _CHUNK,
    _N_MERGES,
    _STRIDE,
    _bpe_train_chain,
    chunk_fixed_tokens,
    tokenizer_bpe_encode,
    tokenizer_bpe_train,
)
from streaming_data_pipeline_capstone_spark.sources.readers import read_table


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent classic BPE: symbol tuples, greedy left-to-right
    non-overlapping merge apply, tie-break (count desc, pair asc)."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for i in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += c
        if not pairs:
            break
        mx = max(pairs.values())
        a, b = sorted(p for p, c in pairs.items() if c == mx)[0]
        merges.append((i + 1, a, b, mx))
        new: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges, vocab


@pytest.fixture(scope="module")
def bpe_micro_dir(spark, tmp_path_factory) -> str:
    """Sennrich's example words plus 'ssss'/'sss' — consecutive repeats
    force the greedy non-overlapping apply ('s s s s' -> 'ss ss', not
    'ss s s'), which a single-space replace representation gets wrong."""
    d = tmp_path_factory.mktemp("bpecorpus")
    rows = [
        (1, "low low low low low lower lower ssss"),
        (2, "newest newest newest newest newest newest sss ssss"),
        (3, "widest widest widest low newer"),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_train_matches_classic_reference(spark, bpe_micro_dir):
    wc: collections.Counter = collections.Counter()
    for r in spark.read.parquet(bpe_micro_dir + "/documents.parquet").collect():
        wc.update(r.text.lower().split())
    expected, ref_vocab = _reference_bpe(dict(wc), _N_MERGES)

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in tokenizer_bpe_train(spark, bpe_micro_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected

    # the repeat words must have produced an (s, s)-style merge somewhere
    # in the learned table, i.e. the fixture exercises the overlap case
    assert any(a == b for _, a, b, _ in got)

    # final per-word segmentations agree with the reference apply
    w, _ = _bpe_train_chain(spark, bpe_micro_dir)
    spark_segs = {
        r.word: tuple(r.s.strip().split("  ")) for r in w.collect()
    }
    # </w> may have merged into the last symbol; strip it per-symbol to
    # reconstruct the plain word key
    ref_segs = {
        "".join(s.replace("</w>", "") for s in syms): syms
        for syms in ref_vocab
    }
    for word, syms in ref_segs.items():
        assert spark_segs[word] == syms, word


def test_bpe_encode_consistent_with_train(spark, sf_smoke):
    enc = tokenizer_bpe_encode(spark, sf_smoke)
    bad = enc.filter(
        (F.col("n_bpe_tokens") > F.col("n_sym_tokens"))
        | (F.col("n_bpe_tokens") < F.col("n_words"))  # >=1 token per word
        | (F.col("compression") < 1.0)
    ).count()
    assert bad == 0
    # non-vacuous: 8 merges must actually compress the corpus
    assert enc.filter(F.col("n_bpe_tokens") < F.col("n_sym_tokens")).count() > 0
    # n_words matches an independent tokenization
    d = read_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n")
    )
    mism = (
        enc.join(d, "doc_id")
        .filter(F.col("n_words") != F.col("n"))
        .count()
    )
    assert mism == 0


def test_chunk_fixed_tokens_hand_checked(spark, sf_smoke):
    out = chunk_fixed_tokens(spark, sf_smoke)
    docs = {
        r.doc_id: r.text.lower().strip().split()
        for r in read_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = out.collect()
    by_doc: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(docs)
    for doc_id, t in docs.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        starts = list(range(0, len(t), _STRIDE))
        assert [c.chunk_idx for c in chunks] == list(range(len(starts)))
        for c, start in zip(chunks, starts):
            piece = t[start : start + _CHUNK]
            assert c.n_tokens == len(piece)
            assert (
                c.chunk_md5
                == hashlib.md5(" ".join(piece).encode()).hexdigest()
            )


def test_fixed_encode_matches_trained_on_training_corpus(spark, sf_oracle):
    """The shipped merge table was trained to pair exhaustion on sf0.01:
    its first 8 merges must equal a fresh distributed training run, the
    full table a fresh driver-side exhaustion train, and — because
    exhaustion makes every training-corpus word a single token — the
    deploy encode's n_bpe_tokens must equal n_words exactly, with
    n_words/n_sym_tokens agreeing with the 8-merge trainer's encode."""
    from streaming_data_pipeline_capstone_spark.operators.bpe import train_bpe
    from streaming_data_pipeline_capstone_spark.queries.bpe_vocab import MERGES
    from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
        _word_counts,
        tokenizer_bpe_encode_fixed,
    )

    _, fresh = _bpe_train_chain(spark, sf_oracle)
    assert fresh == [tuple(m) for m in MERGES[: len(fresh)]]
    wc = [(r.word, int(r.cnt)) for r in _word_counts(spark, sf_oracle).collect()]
    assert [tuple(m) for m in train_bpe(wc, None)] == [tuple(m) for m in MERGES]

    fixed = {
        r.doc_id: r for r in tokenizer_bpe_encode_fixed(spark, sf_oracle).collect()
    }
    dyn = {r.doc_id: r for r in tokenizer_bpe_encode(spark, sf_oracle).collect()}
    assert set(fixed) == set(dyn)
    for doc_id, fr in fixed.items():
        dr = dyn[doc_id]
        assert (fr.n_words, fr.n_sym_tokens) == (dr.n_words, dr.n_sym_tokens)
        assert fr.n_bpe_tokens == fr.n_words  # exhaustion: 1 token/word
        assert fr.n_bpe_tokens <= dr.n_bpe_tokens  # more merges, never fewer tokens


def test_bpe_oracle_survives_early_dry_corpus(spark, tmp_path_factory):
    """A corpus whose pair counts run dry before _N_MERGES: the Spark
    trainer breaks out early; the unrolled oracle's merge-apply CTEs are
    LEFT JOINs so later (empty-b) rounds pass the vocab through instead
    of cross-joining it away. Both engines must agree on train AND
    encode output."""
    import duckdb

    d = tmp_path_factory.mktemp("drycorpus")
    # one distinct word 'ab': merges (a,b) then (ab,</w>) then dry
    spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id BIGINT, text STRING"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    sf = str(d)

    train = [
        tuple(r)
        for r in tokenizer_bpe_train(spark, sf).orderBy("merge_rank").collect()
    ]
    assert [t[:4] for t in train] == [
        (1, "a", "b", "ab"),
        (2, "ab", "</w>", "ab</w>"),
    ]
    enc = {tuple(r) for r in tokenizer_bpe_encode(spark, sf).collect()}

    from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
        _bpe_encode_oracle,
        _bpe_train_oracle,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    o_train = [tuple(r) for r in con.execute(_bpe_train_oracle()).fetchall()]
    assert o_train == train
    o_enc = {tuple(r) for r in con.execute(_bpe_encode_oracle()).fetchall()}
    assert o_enc == enc


def test_chunk_pack_bins_consistent(spark, sf_oracle):
    """pipeline_chunk_pack: chunks agree with chunk_fixed_tokens; bins
    respect the 512-token budget exactly (32-token chunks divide it, so
    every bin except each lang's last holds exactly 16 full chunks'
    worth or closes on short tail chunks without overflow)."""
    from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
        pipeline_chunk_pack,
    )

    rows = pipeline_chunk_pack(spark, sf_oracle).collect()
    base = {
        (r.doc_id, r.chunk_idx): r.n_tokens
        for r in chunk_fixed_tokens(spark, sf_oracle).collect()
    }
    assert {(r.doc_id, r.chunk_idx) for r in rows} == set(base)
    for r in rows:
        assert r.n_tokens == base[(r.doc_id, r.chunk_idx)]
    # per-(lang, bin) token totals never exceed budget + one straddler,
    # and non-final bins are full enough that adding the next chunk
    # would overflow
    import collections

    per = collections.defaultdict(list)
    for r in rows:
        per[r.lang].append(r)
    for lang, rs in per.items():
        rs.sort(key=lambda r: (r.doc_id, r.chunk_idx))
        bins = collections.defaultdict(int)
        run = 0
        for r in rs:
            assert r.bin_id == run // 512, (lang, r)
            run += r.n_tokens
            bins[r.bin_id] += r.n_tokens
