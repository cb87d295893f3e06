"""Multimodal plumbing: opaque binary payloads + typed metadata through
Arrow-batched kernels — schema contracts, batch-shape changes (frame
fan-out), determinism under repartitioning, and the real-decode stub."""

import pytest

from restructure_hdfs_topic_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    resize_media,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, bytes(range(200)) * 3, "video/fake", 600),
        (2, b"abc" * 100, "audio/fake", 300),
        (3, b"", "image/fake", 0),
    ]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, mime string, n_bytes long"
    )


def test_documents_as_media_schema(spark):
    docs = spark.createDataFrame([(7, "hello")], "doc_id long, text string")
    m = documents_as_media(docs).collect()[0]
    assert (m["media_id"], bytes(m["payload"]), m["mime"], m["n_bytes"]) == (
        7,
        b"hello",
        "text/plain",
        5,
    )


def test_decode_media_features_deterministic(spark):
    feats = {r["media_id"]: r for r in decode_media(_media(spark)).collect()}
    assert feats[2]["n_bytes"] == 300
    assert feats[2]["first_byte"] == ord("a")
    assert feats[2]["checksum"] == sum(b"abc" * 100) % 2147483647
    assert feats[3]["first_byte"] == -1  # empty payload sentinel


def test_resize_media_ratio_and_schema(spark):
    out = {r["media_id"]: r for r in resize_media(_media(spark), 1, 4).collect()}
    # keep 1 byte of every 4: 600 → 150, 300 → 75, 0 → 0.
    assert out[1]["n_bytes"] == 150 and len(bytes(out[1]["payload"])) == 150
    assert out[2]["n_bytes"] == 75
    assert out[3]["n_bytes"] == 0
    assert (out[1]["scale_num"], out[1]["scale_den"]) == (1, 4)
    # Deterministic content: first kept byte of each 4-byte group.
    assert bytes(out[2]["payload"]) == (b"abc" * 100)[::4][:75]
    with pytest.raises(ValueError):
        resize_media(_media(spark), 5, 4)


def test_sample_frames_fan_out(spark):
    frames = sample_frames(_media(spark), frame_bytes=100, every_nth=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # id 1: 600 bytes → 6 frames → sampled indices 0,2,4.
    assert sorted(r["frame_index"] for r in by_id[1]) == [0, 2, 4]
    assert all(r["n_frames"] == 6 for r in by_id[1])
    assert all(len(bytes(r["frame"])) == 100 for r in by_id[1])
    # id 2: 300 bytes → 3 frames → 0,2; id 3: empty → no rows.
    assert sorted(r["frame_index"] for r in by_id[2]) == [0, 2]
    assert 3 not in by_id
    # Per-frame checksum matches the chunk bytes.
    f0 = next(r for r in by_id[2] if r["frame_index"] == 0)
    assert f0["checksum"] == sum((b"abc" * 100)[:100]) % 2147483647


def test_multimodal_partitioning_independence(spark):
    m = _media(spark)
    a = {(r["media_id"], r["frame_index"]): r["checksum"]
         for r in sample_frames(m, 64, 3).collect()}
    b = {(r["media_id"], r["frame_index"]): r["checksum"]
         for r in sample_frames(m.repartition(5), 64, 3).collect()}
    assert a == b and a


def _pgm(color, w=8, h=8):
    """Uniform 8-bit grayscale PGM — decodable by pillow AND the builtin
    codec, so these tests run (not skip) in any environment."""
    return b"P5\n%d %d\n255\n" % (w, h) + bytes([color]) * (w * h)


def _bmp24(w=4, h=4):
    """Uncompressed 24-bit BMP with a distinct top-left pixel (255,255,255),
    all others (0,0,0) — pins row order (bottom-up raster) in the decoder."""
    import struct

    stride = (w * 3 + 3) & ~3
    raster = bytearray(stride * h)
    # BMP rows are bottom-up: top-left pixel lives in the LAST stored row.
    top_row_off = (h - 1) * stride
    raster[top_row_off : top_row_off + 3] = b"\xff\xff\xff"
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return bytes(header + dib + raster)


def test_real_decode_image_features(spark):
    """real_decode=True decodes image payloads with whichever decoder is
    available (pillow or the builtin BMP/PGM/PPM codec) — identical
    grayscale features either way (same ITU-R 601-2 integer formula)."""
    from pyspark.sql import functions as F

    rows = [(1, _pgm(0)), (2, _pgm(200)), (3, _bmp24())]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.lit("image/x-test").alias("mime"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    feats = {r["media_id"]: r for r in decode_media(media, real_decode=True).collect()}
    assert feats[1]["first_byte"] == 0 and feats[1]["checksum"] == 0
    assert feats[2]["first_byte"] == 200
    assert feats[2]["checksum"] == (200 * 64) % 2147483647
    # BMP: first getdata() pixel is the TOP-left; L(255,255,255) = 255.
    assert feats[3]["first_byte"] == 255
    assert feats[3]["checksum"] == 255


def test_real_decode_resize_and_frames(spark):
    """Resize halves the decoded dimensions and transcodes (mime follows
    the bytes); frame sampling emits one row per sampled frame."""
    from io import BytesIO

    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.operators import multimodal as mm

    rows = [(1, _pgm(50)), (2, _pgm(200))]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.lit("image/x-test").alias("mime"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    resized = {
        r["media_id"]: r
        for r in resize_media(media, 1, 2, real_decode=True).collect()
    }
    assert resized[2]["mime"] == mm._OUT_MIME
    payload = bytes(resized[2]["payload"])
    if payload[:2] in (b"P5", b"P6"):
        from restructure_hdfs_topic_spark.operators import imagecodec

        out = imagecodec.open(payload)
    else:  # PNG ⇒ pillow wrote it ⇒ pillow is importable
        from PIL import Image

        out = Image.open(BytesIO(payload))
    assert (out.width, out.height) == (4, 4)

    frames = sample_frames(media, real_decode=True).collect()
    assert {(r["media_id"], r["frame_index"]) for r in frames} == {(1, 0), (2, 0)}
    assert all(r["n_frames"] == 1 for r in frames)
    f2 = next(r for r in frames if r["media_id"] == 2)
    assert f2["checksum"] == (200 * 64) % 2147483647


def test_builtin_codec_multiframe_and_unsupported():
    """The builtin codec directly: concatenated netpbm documents are
    frames; unsupported formats raise (⇒ the kernels degrade per-record)."""
    import pytest as _pytest

    from restructure_hdfs_topic_spark.operators import imagecodec

    anim = _pgm(10) + _pgm(20) + _pgm(30)
    img = imagecodec.open(anim)
    assert img.n_frames == 3
    img.seek(2)
    assert img.getdata()[0] == 30
    img.seek(0)
    assert img.convert("L").getdata()[0] == 10
    with _pytest.raises(EOFError):
        img.seek(3)
    with _pytest.raises(ValueError):
        imagecodec.open(b"\x89PNG\r\n\x1a\nnot-actually-png")
    # Resize: nearest-neighbor keeps uniform images uniform.
    small = imagecodec.open(_pgm(77, 8, 8)).resize((3, 5))
    assert (small.width, small.height) == (3, 5)
    assert set(small.getdata()) == {77}
    # RGB roundtrip through save().
    from io import BytesIO

    rgb = imagecodec.open(_bmp24())
    buf = BytesIO()
    rgb.save(buf, format="PPM")
    again = imagecodec.open(buf.getvalue())
    assert again.mode == "RGB" and again.getdata()[0] == (255, 255, 255)
