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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("scale_num", LongType()),
        StructField("scale_den", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame", BinaryType()),
        StructField("checksum", LongType()),
    ]
)


def resize_media(
    media: DataFrame, scale_num: int = 1, scale_den: int = 4, real_decode: bool = False
) -> DataFrame:
    """Resize/downsample plumbing: binary in → (smaller) binary out through
    an Arrow batch, metadata updated alongside.  ``real_decode=True`` is
    where PIL's ``Image.resize`` / an ffmpeg scale filter would run; the
    deterministic stand-in keeps every ``scale_den``-th byte run of
    ``scale_num`` bytes — same I/O shape, same schema contract.
    """
    if not (0 < scale_num <= scale_den):
        raise ValueError("scale must satisfy 0 < num <= den")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError("media decode libs not available")

            def shrink(b: bytes) -> bytes:
                out = bytearray()
                for i in range(0, len(b), scale_den):
                    out += b[i : i + scale_num]
                return bytes(out)

            payloads = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": payloads,
                    "n_bytes": payloads.map(len).astype("int64"),
                    "scale_num": scale_num,
                    "scale_den": scale_den,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    every_nth: int = 2,
    real_decode: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing: ONE input row fans out to MANY frame rows
    inside the Arrow kernel (the batch-shape change a real video sampler
    needs — ffmpeg would emit decoded frames here).  The deterministic
    stand-in treats the payload as fixed-size ``frame_bytes`` chunks and
    keeps every ``every_nth`` chunk; per-frame checksum mirrors the
    feature column a perceptual hash would fill.
    """
    if frame_bytes <= 0 or every_nth <= 0:
        raise ValueError("frame_bytes and every_nth must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError("media decode libs not available")
            ids, idxs, totals, frames, sums = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_nth):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(fi)
                    totals.append(n_frames)
                    frames.append(bytes(chunk))
                    sums.append(sum(chunk) % 2147483647)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
