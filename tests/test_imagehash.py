"""Perceptual image hashing + near-dup grouping (operators/imagehash.py).

Exactness strategy mirrors the BPE suite: an INDEPENDENT pure-Python
reference model (separate decode path, naive per-box double loop) is
compared bit-for-bit against the operator on random images, then the
pipeline-level semantics (pairs / groups / keep-first) are pinned on
deterministic fixtures.
"""

from __future__ import annotations

import random
import struct

import pytest

from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators import imagecodec
from restructure_hdfs_topic_spark.operators.dedup import hamming_near_dup_pairs
from restructure_hdfs_topic_spark.operators.imagehash import (
    dedup_images_keep_first,
    dhash_bits,
    image_dedup_groups,
    image_dhash,
    image_near_dup_pairs,
    text_as_images,
)


# --------------------------------------------------------------------------
# fixture builders (binary netpbm / BMP bytes, no media libs)
# --------------------------------------------------------------------------

def pgm(width, height, pix):
    return b"P5\n%d %d\n255\n" % (width, height) + bytes(bytearray(pix))


def ppm(width, height, rgb):
    flat = bytearray()
    for r, g, b in rgb:
        flat += bytes((r, g, b))
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(flat)


def bmp(width, height, rgb):
    """Uncompressed bottom-up 24-bit BMP."""
    stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for row in range(height - 1, -1, -1):
        line = bytearray()
        for x in range(width):
            r, g, b = rgb[row * width + x]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        raster += line
    off = 54
    size = off + len(raster)
    head = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return bytes(head + info + raster)


def gradient_pix(w, h, tilt=1):
    return [min(255, (x * 8 + y * tilt)) % 256 for y in range(h) for x in range(w)]


# --------------------------------------------------------------------------
# independent reference model
# --------------------------------------------------------------------------

def ref_dhash(payload: bytes, hash_w=8, hash_h=8) -> int:
    """Independent dHash: decode via the codec module directly, grayscale
    via the shared ITU formula through convert("L"), box means via a naive
    per-cell double loop (no cumsum table), bits packed the same way."""
    img = imagecodec.open(payload).convert("L")
    w, h, pix = img.width, img.height, img.getdata()
    tw, th = hash_w + 1, hash_h
    grid = []
    for y in range(th):
        y0, y1 = y * h // th, max(y * h // th + 1, (y + 1) * h // th)
        row = []
        for x in range(tw):
            x0, x1 = x * w // tw, max(x * w // tw + 1, (x + 1) * w // tw)
            vals = [pix[yy * w + xx] for yy in range(y0, y1) for xx in range(x0, x1)]
            row.append(sum(vals) // len(vals))
        grid.append(row)
    val = 0
    for y in range(hash_h):
        for x in range(hash_w):
            if grid[y][x + 1] > grid[y][x]:
                val |= 1 << (y * hash_w + x)
    return val - (1 << 64) if val >= 1 << 63 else val


def test_dhash_matches_reference_model_on_random_images(spark):
    rng = random.Random(712)
    rows = []
    expect = {}
    for i in range(40):
        w, h = rng.randint(1, 23), rng.randint(1, 19)
        kind = rng.choice(["pgm", "ppm", "bmp"])
        if kind == "pgm":
            payload = pgm(w, h, [rng.randrange(256) for _ in range(w * h)])
        else:
            rgb = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w * h)]
            payload = ppm(w, h, rgb) if kind == "ppm" else bmp(w, h, rgb)
        rows.append((i, payload, "image/x-test"))
        expect[i] = ref_dhash(payload)
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    got = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media).collect()
    }
    assert got == expect


def test_dhash_kernel_statuses_and_robustness(spark):
    grad = pgm(12, 10, gradient_pix(12, 10))
    rows = [
        (1, grad, "image/x-portable-anymap"),
        (2, b"not an image at all", "image/x-portable-anymap"),
        (3, b"hello world", "text/plain"),
        (4, None, "image/x-portable-anymap"),
        (5, grad, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in image_dhash(media).collect()}
    assert out[1]["decode_status"] == "ok" and out[1]["dhash"] is not None
    assert (out[1]["width"], out[1]["height"]) == (12, 10)
    assert out[2]["decode_status"] == "undecodable" and out[2]["dhash"] is None
    assert out[3]["decode_status"] == "not_image"
    assert out[4]["decode_status"] == "undecodable"
    assert out[5]["decode_status"] == "not_image"


def test_perceptual_invariance_and_discrimination():
    """dHash semantics, not just determinism: a downscaled copy of an image
    hashes close to the original; unrelated noise hashes far."""
    rng = random.Random(99)
    big = gradient_pix(64, 48)
    h_big = dhash_bits(big, 64, 48)
    # Downscale 64x48 -> 32x24 by 2x2 box mean (a 'thumbnail' of the same
    # picture — classic perceptual-dup case; bytes totally different).
    small = [
        (
            big[(2 * y) * 64 + 2 * x]
            + big[(2 * y) * 64 + 2 * x + 1]
            + big[(2 * y + 1) * 64 + 2 * x]
            + big[(2 * y + 1) * 64 + 2 * x + 1]
        )
        // 4
        for y in range(24)
        for x in range(32)
    ]
    h_small = dhash_bits(small, 32, 24)
    noise = [rng.randrange(256) for _ in range(64 * 48)]
    h_noise = dhash_bits(noise, 64, 48)
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h_big, h_small) <= 4
    assert ham(h_big, h_noise) > 16


def test_near_dup_pairs_and_groups(spark):
    grad = gradient_pix(32, 32)
    # Perturb a few pixels slightly — same perceptual content.
    near = list(grad)
    for i in range(0, 1024, 97):
        near[i] = min(255, near[i] + 3)
    inv = [255 - p for p in grad]
    rows = [
        (10, pgm(32, 32, grad), "image/x-portable-anymap"),
        (11, pgm(32, 32, near), "image/x-portable-anymap"),
        (12, pgm(32, 32, inv), "image/x-portable-anymap"),
        (13, b"corrupt", "image/x-portable-anymap"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert set(pairs) == {(10, 11)}
    groups = {
        r["media_id"]: r["group_id"] for r in image_dedup_groups(media, max_hamming=6).collect()
    }
    assert groups[10] == groups[11] == 10
    assert groups[12] == 12  # decodable singleton: own group
    assert groups[13] is None  # undecodable: membership unknowable
    kept = sorted(
        r["media_id"] for r in dedup_images_keep_first(media, max_hamming=6).collect()
    )
    assert kept == [10, 12, 13]  # group rep + singleton + undecodable kept


def test_pairs_match_brute_force_on_random_hashes(spark):
    """Banding over SIGNED 64-bit fingerprints (top bit set → negative
    long) must equal the brute-force all-pairs scan — guards the
    shiftrightunsigned choice."""
    rng = random.Random(4242)
    base = rng.getrandbits(64)
    fps = []
    for i in range(60):
        v = base
        for _ in range(rng.randrange(0, 9)):
            v ^= 1 << rng.randrange(64)
        if rng.random() < 0.3:
            v = rng.getrandbits(64)
        fps.append((i, v - (1 << 64) if v >= 1 << 63 else v))
    expect = set()
    for i, (ia, va) in enumerate(fps):
        for ib, vb in fps[i + 1 :]:
            if bin((va ^ vb) & ((1 << 64) - 1)).count("1") <= 3:
                expect.add((ia, ib))
    hashed = spark.createDataFrame(fps, "id long, fingerprint long")
    got = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dup_pairs(hashed, bits=64, max_hamming=3).collect()
    }
    assert got == expect


def test_text_as_images_roundtrip_and_partitioning_independence(spark):
    docs = spark.createDataFrame(
        [
            (1, "aardvark " * 40),
            (2, "aardvark " * 40 + "tail差分"),  # same 256-byte prefix
            (3, "completely different content " * 12),
            (4, "短い"),  # multibyte UTF-8, shorter than the raster
        ],
        "doc_id long, text string",
    )
    media = text_as_images(docs, 16, 16)
    rows = {r["media_id"]: r for r in media.collect()}
    img = imagecodec.open(rows[4]["payload"])
    assert (img.width, img.height) == (16, 16)
    # Raster = UTF-8 bytes of the text, padded with 0x30.
    body = "短い".encode()
    assert bytes(bytearray(img.getdata()))[: len(body)] == body
    assert set(bytes(bytearray(img.getdata()))[len(body) :]) == {0x30}
    assert all(r["n_bytes"] == len(r["payload"]) for r in rows.values())

    g1 = {
        r["media_id"]: r["group_id"]
        for r in image_dedup_groups(media, max_hamming=4).collect()
    }
    assert g1[1] == g1[2] == 1 and g1[3] == 3
    g2 = {
        r["media_id"]: r["group_id"]
        for r in image_dedup_groups(media.repartition(7), max_hamming=4).collect()
    }
    assert g1 == g2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
