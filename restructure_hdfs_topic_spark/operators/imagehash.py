"""Perceptual image hashing + near-duplicate image detection.

Extends the multimodal plumbing (``operators/multimodal.py``) from
byte-level stand-ins to REAL content-addressed image dedup, the way a
large-scale multimodal training pipeline dedups its image side (LAION /
DataComp-style preprocessing): decode → grayscale → fixed tiny grid →
difference hash (dHash), then banded-Hamming near-dup grouping over the
64-bit fingerprints.

Why dHash: it is the standard cheap perceptual hash (gradient sign grid),
robust to re-encoding/resize/gamma shifts, and it reduces image near-dup
to integer Hamming distance — which this repo already solves EXACTLY at
scale via pigeonhole banding (``dedup.hamming_near_dup_pairs``: band
equality generates a lossless candidate superset, ``bit_count(xor)``
verifies; shuffle key is (band, band bits), never a cross join).

Decoder independence: pixels come from pillow when installed, else the
builtin BMP/PGM/PPM codec (both decode EXACT pixel values from the spec);
grayscale uses the shared ITU-R 601-2 integer formula and the downsample
here is an exact integer box mean implemented in numpy — so the hash is
bit-identical whichever decoder runs (unlike ``Image.resize``, whose
resampling differs between pillow and the builtin codec).

At 100 TB: the hash kernel is one Arrow-batched ``mapInPandas`` pass over
the payload column (images never shuffle — 8 bytes per image leave the
scan); pairing shuffles only (band, key, fingerprint) rows; grouping is
the repo's contraction connected-components.  Reference analogue: the
reference dedups records by serialized identity
(format/RecordConverterFactory.kt:62-84); this is the multimodal
counterpart where identity must be perceptual, not byte-exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators.dedup import (
    connected_components,
    hamming_near_dup_pairs,
)
from restructure_hdfs_topic_spark.operators.multimodal import _pil_open

__all__ = [
    "text_as_images",
    "image_dhash",
    "image_near_dup_pairs",
    "image_dedup_groups",
    "dedup_images_keep_first",
]


def text_as_images(
    documents: DataFrame,
    width: int = 16,
    height: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic image corpus: render each document's first
    ``width*height`` UTF-8 bytes as a binary P5 (grayscale netpbm) payload
    — a pure-JVM generator (hex → pad → unhex; no Python crossing) that
    gives benches and scale checks a decodable image column at any SF
    without shipping binary fixtures.  Documents sharing a text prefix
    become perceptually identical images, so near-dup structure exists by
    construction.

    Returns (media_id, payload, mime, n_bytes) — the MEDIA_SCHEMA layout.
    """
    n = width * height
    header = f"P5\n{width} {height}\n255\n".encode()
    # UTF-8 bytes (not chars) must fill the raster exactly: pad/truncate in
    # hex space where one byte is always two chars ('30' pads = 0x30).
    raster = F.unhex(
        F.rpad(
            F.substring(F.hex(F.encode(F.col(text_col), "UTF-8")), 1, 2 * n),
            2 * n,
            "30",
        )
    )
    return documents.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(F.lit(header), raster).alias("payload"),
        F.lit("image/x-portable-anymap").alias("mime"),
        F.lit(len(header) + n).cast("long").alias("n_bytes"),
    )


def _box_mean_grid(pix, w: int, h: int, tw: int, th: int):
    """Exact integer box-mean downsample of a grayscale pixel list to a
    (th, tw) grid.  Cell (x, y) averages source box [x*w//tw, max(+1,
    (x+1)*w//tw)) × [y*h//th, ...) — every box non-empty even when the
    source is SMALLER than the target (degenerates to nearest-neighbor),
    and all arithmetic is integer floor, so the grid is identical across
    decoders, numpy versions, and engines."""
    import numpy as np

    a = np.asarray(pix, dtype=np.int64).reshape(h, w)
    # Row/column box sums via one cumulative-sum table (O(w*h) build,
    # O(1) per cell) — exact integers throughout.
    csum = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=csum[1:, 1:])
    xs = [x * w // tw for x in range(tw)]
    xe = [max(xs[x] + 1, (x + 1) * w // tw) for x in range(tw)]
    ys = [y * h // th for y in range(th)]
    ye = [max(ys[y] + 1, (y + 1) * h // th) for y in range(th)]
    grid = np.empty((th, tw), dtype=np.int64)
    for y in range(th):
        y0, y1 = ys[y], ye[y]
        for x in range(tw):
            x0, x1 = xs[x], xe[x]
            s = csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            grid[y, x] = s // ((y1 - y0) * (x1 - x0))
    return grid


def dhash_bits(pix, w: int, h: int, hash_w: int = 8, hash_h: int = 8) -> int:
    """64-bit dHash of a grayscale pixel list: box-mean to a
    (hash_w+1) × hash_h grid, then bit (y*hash_w + x) is set iff the
    right neighbor is strictly brighter.  Returned as the SIGNED 64-bit
    two's-complement value (Spark ``long``)."""
    grid = _box_mean_grid(pix, w, h, hash_w + 1, hash_h)
    val = 0
    for y in range(hash_h):
        row = grid[y]
        for x in range(hash_w):
            if row[x + 1] > row[x]:
                val |= 1 << (y * hash_w + x)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def image_dhash(
    media: DataFrame,
    hash_w: int = 8,
    hash_h: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> DataFrame:
    """Perceptual difference-hash per image — one Arrow-batched
    ``mapInPandas`` pass; 8 bytes of fingerprint (default 8×8 = 64 bits)
    leave the scan per image, the payload never shuffles.

    Non-image mimes and undecodable payloads yield a NULL ``dhash`` with
    the failure class in ``decode_status`` ('ok' / 'not_image' /
    'undecodable') — a scraped corpus always contains a few bad blobs, and
    one of them must not fail the task (multimodal.decode_media contract).

    Returns (media_id, dhash: long nullable, width, height, decode_status).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(mime: str, payload: bytes):
            mime = mime or ""
            if not mime.startswith("image/"):
                return (None, 0, 0, "not_image")
            try:
                img = _pil_open(payload or b"").convert("L")
                w, h = img.width, img.height
                return (
                    dhash_bits(img.getdata(), w, h, hash_w, hash_h),
                    w,
                    h,
                    "ok",
                )
            except Exception:
                return (None, 0, 0, "undecodable")

        for pdf in it:
            rows = [one(m, b) for m, b in zip(pdf[mime_col], pdf[payload_col])]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "dhash": pd.Series([r[0] for r in rows], dtype="Int64"),
                    "width": pd.Series([r[1] for r in rows], dtype="int64"),
                    "height": pd.Series([r[2] for r in rows], dtype="int64"),
                    "decode_status": [r[3] for r in rows],
                }
            )

    id_type = media.schema[id_col].dataType.simpleString()
    return media.select(id_col, mime_col, payload_col).mapInPandas(
        batches,
        schema=(
            f"media_id {id_type}, dhash long, width long, height long,"
            " decode_status string"
        ),
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 4,
    hash_w: int = 8,
    hash_h: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
    dedup: bool = True,
) -> DataFrame:
    """Image pairs whose dHashes differ in ≤ ``max_hamming`` bits — exact
    over the fingerprints via pigeonhole banding (no cross join; see
    ``dedup.hamming_near_dup_pairs``).  Undecodable images match nothing.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    hashes = image_dhash(media, hash_w, hash_h, id_col, payload_col, mime_col)
    return hamming_near_dup_pairs(
        hashes,
        id_col="media_id",
        hash_col="dhash",
        bits=hash_w * hash_h,
        max_hamming=max_hamming,
        dedup=dedup,
    )


def image_dedup_groups(
    media: DataFrame,
    max_hamming: int = 4,
    hash_w: int = 8,
    hash_h: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> DataFrame:
    """Transitive near-dup image groups: banded-Hamming edges (dedup=False
    — contraction CC absorbs the per-band duplicates, saving a shuffle)
    into the repo's contraction connected-components.  group_id = min
    media_id of the group; decodable singletons are their own group;
    undecodable images carry group_id NULL (membership unknowable).

    Returns (media_id, group_id, decode_status).
    """
    from restructure_hdfs_topic_spark.caching import scoped_persist

    hashes = scoped_persist(
        image_dhash(media, hash_w, hash_h, id_col, payload_col, mime_col),
        scope="imagehash.groups.hashes",
    )
    decodable = hashes.filter(F.col("dhash").isNotNull())
    edges = hamming_near_dup_pairs(
        decodable,
        id_col="media_id",
        hash_col="dhash",
        bits=hash_w * hash_h,
        max_hamming=max_hamming,
        dedup=False,
    )
    groups = connected_components(
        decodable.select(F.col("media_id").alias("id")), edges
    )
    return hashes.alias("h").join(
        groups.alias("g"), F.col("h.media_id") == F.col("g.id"), "left"
    ).select(
        F.col("h.media_id").alias("media_id"),
        F.col("g.group_id").alias("group_id"),
        F.col("h.decode_status").alias("decode_status"),
    )


def dedup_images_keep_first(
    media: DataFrame,
    max_hamming: int = 4,
    hash_w: int = 8,
    hash_h: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> DataFrame:
    """Keep ONE image per perceptual near-dup group (the lowest media_id —
    deterministic under any partitioning) plus every undecodable image
    (perceptual identity unknowable → never silently dropped; filter on
    ``decode_status`` upstream to quarantine instead).  Returns the media
    rows that survive."""
    groups = image_dedup_groups(
        media, max_hamming, hash_w, hash_h, id_col, payload_col, mime_col
    )
    keep_ids = (
        groups.filter(F.col("group_id").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("group_id").orderBy(F.col("media_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("media_id")
        .union(
            groups.filter(F.col("group_id").isNull()).select("media_id")
        )
    )
    # Data-scaled id set: leave the join side to AQE (a forced broadcast
    # would ship a corpus-sized id list to every executor at 100 TB).
    return media.join(
        keep_ids.withColumnRenamed("media_id", id_col), on=id_col, how="inner"
    )
