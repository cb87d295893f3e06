"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns paired with a
typed metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas``.  The media
libraries are not in this container, so the decode kernels are STUBBED
(deterministic fake features, clearly marked) — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.

At 100 TB: binaries stay columnar in parquet; mapInPandas streams Arrow
record batches so one task never materializes more than a batch; metadata
predicates (mime, size) push down to the scan because they live in plain
columns, not inside the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("checksum", LongType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: payload = UTF-8 bytes of
    the text, metadata columns alongside the blob.  This is the canonical
    multimodal layout: blob opaque, metadata queryable/pushdown-able."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature-extraction over binary payloads via mapInPandas (Arrow
    batches).  ``real_decode=True`` is the hook where PIL/ffmpeg/librosa
    would plug in; unavailable in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                # Real kernels (PIL.Image.open, soundfile.read, ...) would
                # decode pdf["payload"] here; libs absent in this container.
                raise NotImplementedError("media decode libs not available")
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    # Deterministic fake "feature": byte sum mod 2^31-1 —
                    # stands in for an image-embedding/audio-fingerprint.
                    "checksum": payloads.map(lambda b: sum(b) % 2147483647).astype("int64"),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)
