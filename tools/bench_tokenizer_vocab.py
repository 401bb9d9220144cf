"""Vocab-size decade for the deploy-path BPE encode (VERDICT r12 ask #3).

The r12 fixed encode applied merges as an O(vocab)-deep literal replace
chain — per-row cost and plan size both grew with vocabulary, so the
8-merge demo could never become a 30k-merge tokenizer. The r13 deploy
encode segments the DISTINCT-WORD frame in one Arrow-batched pandas pass
and broadcasts (word -> token count) back; plan shape is constant in
vocab size. This tool measures that claim on the sf1 corpus:

- ``segmenting`` — bpe_encode_with_merges at growing prefixes of the
  shipped exhaustion vocab (8 -> 106 merges on this corpus; its 31-word
  vocabulary is the merge cap — tests/test_tokenizer_vocab.py proves the
  same path compiles and is correct at a 1,024-merge synthetic vocab).
  Expected: FLAT in vocab size.
- ``replace_chain`` — the r12 shape, rebuilt here for comparison at
  sizes below its 64-merge guard. Expected: growing with vocab (and
  impossible past the cap).

Prints ONE JSON line and writes ``--out`` (default
BENCH_sf1_tokenizer_r13.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [8, 32, 64, 106]
CHAIN_SIZES = [8, 32, 64]


def _chain_encode(spark, sf_dir: str, merges):
    """The r12 replace-chain encode, reconstructed for the comparison."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
        _seed_symbols,
        _word_counts,
        tokens,
    )
    from streaming_data_pipeline_capstone_spark.sources.readers import read_table

    words = _word_counts(spark, sf_dir).select("word")
    sym = _seed_symbols(words.withColumn("cnt", F.lit(1))).select("word", "s")
    expr = F.col("s")
    for a, b in merges:
        expr = F.replace(expr, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    per_word = sym.select(
        "word",
        F.size(F.split(F.trim(expr), "  ")).alias("w_bpe"),
        (F.length("word") + F.lit(1)).alias("w_sym"),
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    return (
        docs.select("doc_id", F.explode("t").alias("word"))
        .join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("w_bpe").alias("n_bpe_tokens"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1")
    ap.add_argument("--out", default="BENCH_sf1_tokenizer_r13.json")
    args = ap.parse_args()

    from streaming_data_pipeline_capstone_spark.queries.bpe_vocab import MERGES
    from streaming_data_pipeline_capstone_spark.queries.tokenizer import (
        bpe_encode_with_merges,
    )
    from streaming_data_pipeline_capstone_spark.session import get_spark

    spark = get_spark(app_name="bench-tokenizer-vocab")
    spark.range(1).count()
    pairs = [(a, b) for _, a, b, _ in MERGES]

    seg: dict[str, float] = {}
    chain: dict[str, float] = {}
    for n in SIZES:
        times = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            bpe_encode_with_merges(spark, args.sf_dir, pairs[:n]).count()
            times.append(time.time() - t0)
        seg[str(n)] = round(min(times), 3)
    for n in CHAIN_SIZES:
        times = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            _chain_encode(spark, args.sf_dir, pairs[:n]).count()
            times.append(time.time() - t0)
        chain[str(n)] = round(min(times), 3)
    spark.stop()

    artifact = {
        "metric": "tokenizer_vocab_decade",
        "unit": "sec_warm_min2",
        "sf_dir": args.sf_dir,
        "shipped_merges": len(MERGES),
        "segmenting_encode_s": seg,
        "replace_chain_encode_s": chain,
        "flatness": round(seg[str(SIZES[-1])] / max(seg[str(SIZES[0])], 1e-9), 2),
        "note": (
            "segmenting = deploy path (pandas over distinct words + "
            "broadcast join; plan constant in vocab); replace_chain = r12 "
            "shape (O(vocab) plan depth, capped at 64). 106 merges = pair "
            "exhaustion on this corpus's 31-word vocabulary; the "
            "1,024-merge batch axis is proven on a synthetic vocab in "
            "tests/test_tokenizer_vocab.py."
        ),
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("segmenting_encode_s", "replace_chain_encode_s",
                       "flatness")}))


if __name__ == "__main__":
    main()
