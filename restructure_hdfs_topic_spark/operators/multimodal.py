"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns paired with a
typed metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas``.  Two decode
modes: the default deterministic byte-level stand-in kernels (no media
libraries needed), and ``real_decode=True``, which decodes ``image/*``
payloads with pillow when installed or the builtin pure-Python
BMP/PGM/PPM codec (``operators/imagecodec.py``) otherwise — so the real
path runs, and is tested, even in containers without media libraries.

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

try:  # optional extra: pillow-backed real image decode (VERDICT r4 #7)
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    # No pillow: fall back to the builtin pure-Python codec (uncompressed
    # BMP / binary PGM/PPM — formats pillow also reads, so fixtures and
    # features are decoder-independent).  Payloads in formats the builtin
    # cannot parse degrade per-record to byte-level features through the
    # kernels' existing corrupt-media handling.
    from restructure_hdfs_topic_spark.operators import imagecodec as _PILImage

    HAS_PIL = False

# Transcoded outputs follow the encoder that is actually available:
# pillow writes PNG; the builtin codec writes binary netpbm.
_OUT_FORMAT = "PNG" if HAS_PIL else "PPM"
_OUT_MIME = "image/png" if HAS_PIL else "image/x-portable-anymap"


def _pil_open(payload: bytes):
    from io import BytesIO

    return _PILImage.open(BytesIO(payload))

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
    batches).  ``real_decode=True`` decodes ``image/*`` payloads —
    pillow when installed, else the builtin BMP/PGM/PPM codec —
    (first_byte = first grayscale pixel, checksum = pixel sum — the slots
    an image embedding would fill).  Non-image mimes, and image formats
    the active decoder cannot parse, keep the byte-level features."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def features(mime: str, b: bytes) -> tuple[int, int]:
            # NULL payload/mime rows (a NULL text encodes to NULL) degrade
            # like empty blobs — one bad row must not fail the task.
            mime, b = mime or "", b or b""
            if real_decode and mime.startswith("image/"):
                try:
                    px = list(_pil_open(b).convert("L").getdata())
                    return (px[0] if px else -1, sum(px) % 2147483647)
                except Exception:
                    # Corrupt/truncated payloads degrade to the byte-level
                    # features instead of failing the whole job — a scraped
                    # corpus always contains a few undecodable blobs.
                    pass
            return (b[0] if len(b) else -1, sum(b) % 2147483647)

        for pdf in it:
            feats = [
                features(m, b) for m, b in zip(pdf["mime"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"]
                    .map(lambda b: len(b or b""))
                    .astype("int64"),
                    "first_byte": pd.Series([f[0] for f in feats], dtype="int64"),
                    # Deterministic "feature": stands in for an
                    # image-embedding/audio-fingerprint.
                    "checksum": pd.Series([f[1] for f in feats], dtype="int64"),
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
        def pil_resize(b: bytes) -> bytes:
            from io import BytesIO

            img = _pil_open(b)
            w = max(1, img.width * scale_num // scale_den)
            h = max(1, img.height * scale_num // scale_den)
            out = BytesIO()
            img.resize((w, h)).save(out, format=_OUT_FORMAT)
            return out.getvalue()

        for pdf in it:

            def shrink(b: bytes) -> bytes:
                b = b or b""
                out = bytearray()
                for i in range(0, len(b), scale_den):
                    out += b[i : i + scale_num]
                return bytes(out)

            def resize_one(m: str, b: bytes) -> tuple[bytes, str]:
                """(payload, mime): the PIL path TRANSCODES to PNG, so the
                emitted mime must follow the bytes — advertising JPEG for
                PNG payloads would mislead every content-type consumer."""
                m = m or ""
                if m.startswith("image/") and b:
                    try:
                        return pil_resize(b), _OUT_MIME
                    except Exception:
                        pass  # undecodable image → byte-level downsample
                return shrink(b), m

            if real_decode:
                resized = [
                    resize_one(m, b) for m, b in zip(pdf["mime"], pdf["payload"])
                ]
                payloads = pd.Series(
                    [p for p, _m in resized],
                    dtype="object",
                    index=pdf.index,  # align with pdf columns in the yield
                )
                mimes = pd.Series(
                    [m for _p, m in resized], dtype="object", index=pdf.index
                )
            else:
                payloads = pdf["payload"].map(shrink)
                mimes = pdf["mime"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": mimes,
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
        def pil_frames(payload: bytes) -> tuple[int, list[tuple[int, bytes, int]]]:
            """(total frames, [(frame_index, PNG bytes, grayscale pixel-sum
            checksum)]) for every ``every_nth`` frame of an (animated)
            image — pillow's ImageSequence stands in for a video frame
            iterator."""
            from io import BytesIO

            img = _pil_open(payload)
            # NB: ImageSequence.Iterator yields the SAME Image object
            # seeked in place — list()-ing it gives N references to the
            # final frame.  seek() per sampled index decodes each frame.
            n_frames = getattr(img, "n_frames", 1)
            out = []
            for fi in range(0, n_frames, every_nth):
                img.seek(fi)
                frame = img.convert("L")
                buf = BytesIO()
                frame.save(buf, format=_OUT_FORMAT)
                out.append(
                    (fi, buf.getvalue(), sum(frame.getdata()) % 2147483647)
                )
            return n_frames, out

        for pdf in it:
            ids, idxs, totals, frames, sums = [], [], [], [], []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                mime, payload = mime or "", payload or b""
                if real_decode and mime.startswith("image/") and payload:
                    try:
                        n_frames, decoded = pil_frames(payload)
                    except Exception:
                        decoded = None  # corrupt image → chunk fallback
                    if decoded is not None:
                        for fi, png, ck in decoded:
                            ids.append(mid)
                            idxs.append(fi)
                            totals.append(n_frames)
                            frames.append(png)
                            sums.append(ck)
                        continue
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
