"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode step is STUBBED
behind a deterministic fake (clearly marked below); everything Spark-side —
schema, partition-preserving mapInPandas, batch shapes, metadata structs —
is real and tested. Swap `_fake_decode` for a real libvips/ffmpeg call on a
cluster with codecs installed and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fake_decode(blob: bytes, n_features: int = 8) -> list[float]:
    """STUB decode: deterministic per-byte-histogram 'features'.

    A real deployment replaces this with PIL/libvips (images) or
    ffmpeg/torchaudio (audio/video). NotImplementedError would also be
    acceptable here; the deterministic fake lets the batch plumbing be
    asserted end-to-end in tests.
    """
    if blob is None:
        return [0.0] * n_features
    buckets = [0] * n_features
    for by in blob:
        buckets[by % n_features] += 1
    total = max(1, len(blob))
    return [b / total for b in buckets]


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs.

    mapInPandas streams record batches through Python once — no per-row
    pickling; partitioning of the input is preserved (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["blob"].map(lambda b: 0 if b is None else len(b)),
                    "features": pdf["blob"].map(
                        lambda b: _fake_decode(b, n_features)
                    ),
                }
            )

    return media.select("media_id", "blob").mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as utf-8 blobs so the
    binary pipeline can be exercised against driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
