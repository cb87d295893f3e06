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


def test_real_decode_raises_without_pil(spark):
    from restructure_hdfs_topic_spark.operators.multimodal import HAS_PIL

    if HAS_PIL:
        pytest.skip("pillow installed — the real decode path is live")
    # Driver-side fail-fast (no Spark job launched for a doomed plan).
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_media(_media(spark), real_decode=True)
    with pytest.raises(NotImplementedError, match="pillow"):
        resize_media(_media(spark), real_decode=True)
    with pytest.raises(NotImplementedError, match="pillow"):
        sample_frames(_media(spark), real_decode=True)


def test_real_decode_with_pil(spark):
    """Exercised only where pillow exists (skips cleanly otherwise): real
    image decode fills the same schema slots the stub stands in for."""
    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    from pyspark.sql import functions as F

    def png(color):
        img = Image.new("L", (8, 8), color)
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(0)), (2, png(200))]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.lit("image/png").alias("mime"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    feats = {r["media_id"]: r for r in decode_media(media, real_decode=True).collect()}
    assert feats[1]["first_byte"] == 0 and feats[1]["checksum"] == 0
    assert feats[2]["first_byte"] == 200
    assert feats[2]["checksum"] == (200 * 64) % 2147483647

    resized = {r["media_id"]: r for r in resize_media(media, 1, 2, real_decode=True).collect()}
    out = Image.open(BytesIO(bytes(resized[2]["payload"])))
    assert out.size == (4, 4)

    frames = sample_frames(media, real_decode=True).collect()
    assert {(r["media_id"], r["frame_index"]) for r in frames} == {(1, 0), (2, 0)}
    assert all(r["n_frames"] == 1 for r in frames)
