"""Multimodal column plumbing (driver mandate X5).

Images / audio / video ride through the engine as opaque ``binary``
columns with a typed metadata struct. The Spark-side plumbing — schema,
partition strategy, Arrow-batched UDF signatures — is real and tested;
the actual media decoding is stubbed (no codec libraries in this
container) behind a deterministic fake, clearly marked.

Scale design: payloads are the widest column by far, so every operator
here (a) prunes the payload column as early as possible, (b) processes it
with ``mapInPandas`` (Arrow batches, zero-copy into the Python worker),
and (c) keys any shuffle on the compact checksum, never on the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)


def pack_binary(df: DataFrame, content_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata struct."""
    payload = F.encode(F.col(content_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real media decode: normalized first
    bytes. Replaces PIL/librosa/ffmpeg feature extraction, which this
    container does not ship."""
    head = payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0")
    return [b / 255.0 for b in head]


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each Python worker sees whole record batches (not
    rows); the output keeps only compact columns (optional ``id_cols``
    pass through untouched) — payload is dropped on the way out, which is
    what you want before any downstream shuffle.
    """
    ids = [df.schema[c] for c in id_cols]
    out_schema = T.StructType(
        [
            *ids,
            T.StructField("checksum", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )
    src = df.select(
        *id_cols, F.md5(F.col(payload_col)).alias("checksum"), F.col(payload_col).alias("p")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: pdf[c] for c in id_cols}
            out["checksum"] = pdf["checksum"]
            out["features"] = pdf["p"].map(_fake_decode_features)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — NOT available in this environment.

    The production implementation decodes with PIL inside mapInPandas
    (same batch shape as extract_features). Stubbed per driver contract.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not shipped in this container; "
        "use extract_features for the deterministic fake path"
    )


def sample_video_frames(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Frame sampling — NOT available in this environment (needs ffmpeg)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings, not shipped here; "
        "the plumbing contract matches extract_features (binary in, "
        "array<float> features out, checksum-keyed)"
    )
