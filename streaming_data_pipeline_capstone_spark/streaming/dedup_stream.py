"""Incremental (streaming) near-duplicate detection.

The batch MinHash-LSH pipeline (operators/dedup.py) answers "which pairs in
this corpus are near-dups"; a training-data INGEST pipeline needs the
incremental question: "is this NEW document a near-dup of anything seen
before". This module runs that as a Structured Streaming job:

per micro-batch (foreachBatch):
  1. shingle + minhash + band the new documents (same operators as batch)
  2. candidate pairs = new bands ⋈ persistent band index on (band_id, bh)
     — only same-bucket rows meet, exactly the batch pipeline's property,
     so matching cost is O(new docs × bucket occupancy), not O(corpus)
  3. plus new-vs-new candidates within the batch
  4. exact-Jaccard verify against the persistent shingle index
  5. append verified pairs to the output, and the new docs' bands +
     shingles to the index

The index is two parquet tables (bands keyed by bucket hash, shingle sets
keyed by doc). At 100 TB both are partitioned/bucketed by their join key
so step 2 is a bucket-pruned join; here they are plain parquet dirs. State
is storage-backed, not driver-resident — the driver only orchestrates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from streaming_data_pipeline_capstone_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    candidate_pairs_from_bands,
    fingerprint,
    jaccard_verify,
    lsh_bands,
    minhash_signatures,
    shingle_sets,
)


def write_epoch_idempotent(df: DataFrame, path: str, epoch_id: int) -> None:
    """Idempotent per-epoch write for foreachBatch sinks.

    foreachBatch is at-least-once: a crash between the sink write and the
    checkpoint commit replays the same epoch. A plain ``mode("append")``
    would re-append the batch's rows, permanently duplicating index
    entries and every downstream candidate/verified pair. Partitioning by
    ``epoch`` with dynamic-partition overwrite makes the replay OVERWRITE
    exactly its own partition (only partitions present in the written
    data are touched), turning at-least-once delivery into effectively-
    once storage — the standard exactly-once recipe for foreachBatch
    parquet sinks.
    """
    (
        df.withColumn("epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(path)
    )


def read_index(spark, path: str, exclude_epoch: int | None = None) -> DataFrame:
    """Read an epoch-partitioned index table, hiding the epoch column.

    ``exclude_epoch`` drops one epoch's partition (partition-pruned scan):
    on a replayed micro-batch the index already holds the crashed
    attempt's own partition, which must not count as "old" data.
    """
    df = spark.read.parquet(path)
    if exclude_epoch is not None:
        df = df.filter(F.col("epoch") != int(exclude_epoch))
    return df.drop("epoch")


def _merge_batch(
    batch: DataFrame,
    epoch_id: int,
    index_dir: str,
    pairs_dir: str,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    pre_dedup: bool = True,
) -> None:
    spark = batch.sparkSession
    bands_path = os.path.join(index_dir, "bands")
    sets_path = os.path.join(index_dir, "sets")

    if pre_dedup:
        # Streams are where pathological repetition actually shows up
        # (crawl replays delivering the same page many times per batch):
        # collapse normalization-identical docs to their min-id
        # representative BEFORE shingling so k copies can't form a hot
        # LSH bucket emitting k(k-1)/2 pairs — the same mitigation as
        # the batch pipeline's minhash_lsh_dedup(pre_dedup=True), on by
        # default here. One extra in-batch exchange on the 16-byte
        # fingerprint, never on the text.
        reps = (
            batch.select(F.col(id_col), fingerprint(text_col).alias("fp"))
            .groupBy("fp")
            .agg(F.min(id_col).alias(id_col))
        )
        batch = batch.join(reps, id_col, "left_semi")

    sets_new = shingle_sets(batch, id_col, text_col).persist()
    bands_new = lsh_bands(minhash_signatures(sets_new, num_hashes), num_hashes, bands).persist()

    try:
        bands_old = read_index(spark, bands_path, exclude_epoch=epoch_id)
        sets_old = read_index(spark, sets_path, exclude_epoch=epoch_id)
        have_index = True
    except Exception:  # first batch: no index yet
        have_index = False

    # new-vs-new pairs within this batch
    cands = candidate_pairs_from_bands(bands_new)
    all_sets = sets_new
    if have_index:
        # new-vs-old: join on the bucket key — the index side is
        # partitioned by (band_id, bh) at scale, so this prunes to
        # matching buckets only. doc1 = old, doc2 = new (id order fixed
        # afterwards by jaccard_verify's symmetric join).
        cross = (
            bands_new.alias("n")
            .join(
                bands_old.alias("o"),
                (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.bh") == F.col("o.bh")),
            )
            .select(
                F.least(F.col("n.doc"), F.col("o.doc")).alias("doc1"),
                F.greatest(F.col("n.doc"), F.col("o.doc")).alias("doc2"),
            )
            .filter(F.col("doc1") != F.col("doc2"))
            .distinct()
        )
        cands = cands.unionByName(cross).distinct()
        all_sets = sets_new.unionByName(sets_old)

    verified = jaccard_verify(cands, all_sets, threshold)
    write_epoch_idempotent(verified, pairs_dir, epoch_id)
    write_epoch_idempotent(bands_new, bands_path, epoch_id)
    write_epoch_idempotent(sets_new, sets_path, epoch_id)
    sets_new.unpersist()
    bands_new.unpersist()


def streaming_minhash_dedup(
    stream_docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    available_now: bool = True,
    pre_dedup: bool = True,
) -> StreamingQuery:
    """Start the incremental dedup job over a stream of documents.

    Emits verified (doc1, doc2, jaccard, epoch) rows to ``pairs_dir`` —
    including pairs whose two sides arrived in different micro-batches —
    and maintains the band/shingle index under ``index_dir``.
    ``pre_dedup`` (default ON) collapses normalization-identical docs
    within each micro-batch before LSH — the hot-bucket mitigation.
    """

    def merge(batch: DataFrame, epoch_id: int) -> None:
        _merge_batch(
            batch, epoch_id, index_dir, pairs_dir,
            id_col, text_col, threshold, num_hashes, bands,
            pre_dedup=pre_dedup,
        )

    w = stream_docs.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def exact_dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming deduplication with bounded state.

    The exact-dup twin of :func:`streaming_minhash_dedup`'s near-dup path:
    emit only the FIRST arrival of each key combination, suppressing
    re-deliveries that land within the watermark horizon. Built on
    ``dropDuplicatesWithinWatermark`` so per-key state is EVICTED once the
    event-time watermark passes — a plain ``dropDuplicates`` on a stream
    buffers every key forever, which is exactly what a 100 TB ingest
    cannot do. (Trade-off, documented: a duplicate arriving later than
    the watermark horizon is re-emitted; crawl re-deliveries cluster
    tightly in time, so the horizon buys bounded state for a bounded—and
    tunable—dedup window.)
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def compact_index(spark, index_dir: str, partitions_per_table: int = 32) -> None:
    """Compact the growing band/shingle index.

    Each micro-batch writes one small epoch partition; periodically
    rewrite both tables with a sane file count so the per-batch bucket
    join doesn't degrade into a many-small-files scan. All historical
    epochs collapse into the sentinel partition ``epoch=-1`` (which no
    real micro-batch id can collide with), keeping the epoch-partitioned
    layout intact for subsequent idempotent writes.

    ONLY run this with the stream stopped and its checkpoint fully
    committed (e.g. after an ``availableNow`` drain): compacting an epoch
    that later replays would re-append those rows. At real scale this
    would also `partitionBy(bh-prefix)` / bucket by the join key; run it
    from a maintenance job, not the hot path.
    """
    for sub, key in (("bands", "bh"), ("sets", "doc")):
        path = os.path.join(index_dir, sub)
        df = spark.read.parquet(path).drop("epoch")
        tmp = path + "__compacting"
        df.repartition(partitions_per_table, key).write.mode("overwrite").parquet(tmp)
        compacted = spark.read.parquet(tmp).withColumn("epoch", F.lit(-1))
        compacted.write.mode("overwrite").partitionBy("epoch").parquet(path)
        try:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            pass
