"""Audio fingerprinting (operators/audiofp.py).

WAV codec pinned against hand-built RIFF bytes (stereo averaging, 8-bit,
odd-chunk padding, truncation); constellation hashes pinned on exact-bin
tones where the FFT peak is analytically known; matching semantics pinned
on noise-overlaid and silence-padded copies (the two transformations a
scraped-audio dedup must survive) plus a negative control.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators.audiofp import (
    _FRAME,
    _HOP,
    audio_fingerprints,
    audio_near_dup_pairs,
    decode_wav,
    fingerprint_samples,
    text_as_audio,
    wav_bytes,
)


def tone(k: int, n: int, sr: int = 8000, amp: float = 0.7):
    """Sine at exact FFT bin k of a _FRAME-sample window."""
    t = np.arange(n, dtype=np.float64)
    return amp * np.sin(2 * np.pi * (k * sr / _FRAME) * t / sr)


def melody(bins, frames_per_tone=8, sr=8000):
    return np.concatenate([tone(k, frames_per_tone * _HOP, sr) for k in bins])


# --------------------------------------------------------------------------
# codec
# --------------------------------------------------------------------------

def test_wav_roundtrip_and_stereo_average():
    x = tone(20, 4096)
    sr, mono = decode_wav(wav_bytes(x, 8000))
    assert sr == 8000
    assert np.max(np.abs(mono - x)) < 1e-3  # 16-bit quantization only

    # Hand-built stereo: L = x, R = -x → mono average ≈ 0.
    pcm_l = (np.clip(x, -1, 1) * 32767).round().astype("<i2")
    inter = np.empty(2 * len(x), dtype="<i2")
    inter[0::2], inter[1::2] = pcm_l, -pcm_l
    data = inter.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 2, 8000, 8000 * 4, 4, 16, b"data", len(data),
    )
    sr2, mono2 = decode_wav(hdr + data)
    assert np.max(np.abs(mono2)) < 1e-4

    # 8-bit PCM and odd-sized chunk padding both parse.
    pcm8 = ((np.clip(x, -1, 1) * 127) + 128).round().astype(np.uint8).tobytes()
    odd = b"odd"  # 3-byte junk chunk → 1 pad byte before the next chunk
    wav8 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(odd) + 1 + 8 + len(pcm8))
        + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"junk" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"data" + struct.pack("<I", len(pcm8)) + pcm8
    )
    sr3, mono3 = decode_wav(wav8)
    assert sr3 == 8000 and np.max(np.abs(mono3 - x)) < 2e-2

    for bad in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE"):
        with pytest.raises(ValueError):
            decode_wav(bad)


# --------------------------------------------------------------------------
# fingerprints
# --------------------------------------------------------------------------

def test_constellation_peaks_land_on_exact_bins():
    fps = fingerprint_samples(melody([20, 100, 40]))
    assert fps, "tonal signal must fingerprint"
    f1s = [h >> 32 for _, h in fps]
    # The exact tone bins must anchor hashes, and anchors ON tone bins
    # (±1 for transition smear) must dominate — other-band spectral
    # leakage may contribute deterministic secondary peaks, which is fine
    # for matching (they repeat identically in any copy).
    tone_bins = {19, 20, 21, 39, 40, 41, 99, 100, 101}
    assert {20, 100, 40} <= set(f1s)
    assert sum(f in tone_bins for f in f1s) / len(f1s) > 0.5
    # Silence fingerprints to nothing.
    assert fingerprint_samples(np.zeros(8192)) == []


def test_fingerprints_survive_noise_and_amplitude():
    rng = np.random.default_rng(7)
    x = melody([20, 100, 40, 60])
    clean = set(fingerprint_samples(x))
    noisy = set(fingerprint_samples(x + rng.normal(0, 0.01, len(x))))
    scaled = set(fingerprint_samples(0.25 * x))
    assert len(clean & noisy) / len(clean) > 0.6
    assert scaled == clean  # argmax is amplitude-invariant


def test_audio_match_pairs_semantics(spark):
    rng = np.random.default_rng(13)
    song = melody([20, 100, 40, 60, 80])
    noisy_copy = song + rng.normal(0, 0.01, len(song))
    padded_copy = np.concatenate([np.zeros(5 * _HOP), song])
    other = melody([25, 90, 45, 55, 75])
    rows = [
        (1, wav_bytes(song), "audio/wav"),
        (2, wav_bytes(noisy_copy), "audio/wav"),
        (3, wav_bytes(padded_copy), "audio/wav"),
        (4, wav_bytes(other), "audio/wav"),
        (5, b"not audio", "audio/wav"),
        (6, wav_bytes(song), "text/plain"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    fps = audio_fingerprints(media)
    statuses = {
        r["media_id"]: r["decode_status"]
        for r in fps.groupBy("media_id").agg(
            F.min("decode_status").alias("decode_status")
        ).collect()
    }
    assert statuses[5] == "undecodable" and statuses[6] == "not_audio"
    assert statuses[1] == "ok"

    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in audio_near_dup_pairs(media, min_matches=5).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs
    # The silence-padded copy aligns at dt = -5 frames (t_a - t_b).
    assert pairs[(1, 3)]["dt"] == -5


def test_text_as_audio_near_dup_by_prefix(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world this is a doc"),
            (2, "hello world this is another"),  # same 12-char prefix
            (3, "zzz completely different zzz"),
        ],
        "doc_id long, text string",
    )
    media = text_as_audio(docs)
    decoded = decode_wav(media.filter("media_id=1").collect()[0]["payload"])
    assert decoded[0] == 8000 and len(decoded[1]) == 12 * 8 * _HOP
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_near_dup_pairs(media, min_matches=5).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # Partitioning independence: same pairs from a different layout.
    pairs2 = {
        (r["id_a"], r["id_b"])
        for r in audio_near_dup_pairs(media.repartition(7), min_matches=5).collect()
    }
    assert pairs2 == pairs


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
