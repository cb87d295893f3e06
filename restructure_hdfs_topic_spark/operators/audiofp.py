"""Audio fingerprinting + near-duplicate audio matching.

The audio counterpart of ``operators/imagehash.py``: makes the multimodal
audio column REAL (decode + content fingerprint + scalable matching)
without any media library — PCM WAV is parsed from the RIFF spec with
struct/numpy, and the fingerprint is the classic spectral-peak
constellation (Wang 2003, the Shazam paper; also the shape of Chromaprint
/ audfprint): windowed FFT → per-band spectral peaks → anchor/target peak
pairs hashed with their time delta.  Matching two recordings then needs
no signal comparison at all — shared hash values with a CONSISTENT time
offset identify a near-duplicate (re-encoded, noise-added, or
silence-padded copy).

Spark shape at 100 TB: fingerprint extraction is one Arrow-batched
``mapInPandas`` over the payload column (audio bytes never shuffle; ~tens
of int64 hashes per second of audio leave the scan).  Matching is an
EQUI-JOIN on the 64-bit hash value followed by a (pair, dt) count — a
bounded-bucket hash join like the repo's LSH band joins, never a cross
join; the per-pair offset-consistency vote is a groupBy over matched rows
only.  Reference analogue: perceptual identity for media payloads, vs the
reference's byte-serialized identity (format/RecordConverterFactory.kt).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decode_wav",
    "wav_bytes",
    "text_as_audio",
    "audio_fingerprints",
    "audio_match_pairs",
    "audio_near_dup_pairs",
]


# --------------------------------------------------------------------------
# PCM WAV codec (pure struct/numpy, from the RIFF/WAVE spec)
# --------------------------------------------------------------------------

def decode_wav(payload: bytes):
    """Parse a PCM WAV file → (sample_rate, mono float64 numpy array in
    [-1, 1]).  Supports 8/16-bit integer PCM (format 1), any channel
    count (channels average to mono), odd-sized chunks (RIFF pads to even
    boundaries).  Raises ValueError on anything else."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            # A declared fmt size < 16 passes the body-length check above
            # but would make unpack_from raise struct.error (NOT a
            # ValueError) — normalize to the documented ValueError so
            # callers' quarantine paths see one exception class.
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels < 1:
        raise ValueError(f"only integer PCM supported (format {audio_format})")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.float64)
        raw /= 32768.0
    elif bits == 8:
        raw = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    n = (len(raw) // channels) * channels
    mono = raw[:n].reshape(-1, channels).mean(axis=1)
    return sample_rate, mono


def wav_bytes(samples, sample_rate: int = 8000) -> bytes:
    """Encode a float array in [-1, 1] as 16-bit mono PCM WAV (fixture /
    synthetic-corpus builder — the exact inverse of ``decode_wav``)."""
    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,
        1,
        1,
        sample_rate,
        sample_rate * 2,
        2,
        16,
        b"data",
        len(pcm),
    )
    return hdr + pcm


# --------------------------------------------------------------------------
# constellation fingerprints
# --------------------------------------------------------------------------

# Log-spaced band edges over the 257 rfft bins of a 512-sample frame: one
# peak per band per frame survives — the Shazam trick that makes peaks
# robust to wideband noise (a loud hiss can't mask every band's maximum).
_BAND_EDGES = (1, 8, 16, 32, 64, 128, 257)
_FRAME = 512
_HOP = 256
_FANOUT = 4  # each anchor pairs with the next 4 peaks in time
_MAX_DT = 64  # ... within 64 frames


def _constellation(mono, n_frames_cap: int = 4096):
    """Per-frame per-band spectral peaks → (t, bin) arrays.  Peaks below
    the frame's mean magnitude are discarded (silence emits nothing)."""
    import numpy as np

    n = len(mono) // _HOP - 1
    n = max(0, min(n, n_frames_cap))
    if n <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    idx = np.arange(_FRAME)[None, :] + (_HOP * np.arange(n))[:, None]
    frames = mono[idx] * np.hanning(_FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    ts, bins = [], []
    means = mag.mean(axis=1)
    # Keep a band's peak only if it is within 26 dB of the frame's
    # GLOBAL peak (and above the frame mean, so silence emits nothing).
    # Without the relative gate, spectral leakage from a strong tone in
    # another band pins a spurious "peak" at this band's edge bin —
    # identical edge artifacts across unrelated recordings then
    # accumulate offset-consistent chance matches.
    floors = np.maximum(means, 0.05 * mag.max(axis=1))
    for lo, hi in zip(_BAND_EDGES[:-1], _BAND_EDGES[1:]):
        band = mag[:, lo:hi]
        peak = band.argmax(axis=1)
        val = band[np.arange(n), peak]
        keep = val > floors
        ts.append(np.nonzero(keep)[0])
        bins.append(peak[keep] + lo)
    t = np.concatenate(ts)
    b = np.concatenate(bins)
    order = np.lexsort((b, t))
    return t[order], b[order]


def _hashes_from_peaks(t, b):
    """Anchor→target pair hashes: for each peak, pair with the next
    ``_FANOUT`` peaks within ``_MAX_DT`` frames; hash packs (f1, f2, dt)
    into one int64.  Returns (t_anchor, hash) arrays."""
    import numpy as np

    out_t, out_h = [], []
    m = len(t)
    for i in range(m):
        paired = 0
        for j in range(i + 1, m):
            dt = t[j] - t[i]
            if dt <= 0:
                continue
            if dt > _MAX_DT:
                break
            out_t.append(t[i])
            out_h.append((int(b[i]) << 32) | (int(b[j]) << 16) | int(dt))
            paired += 1
            if paired >= _FANOUT:
                break
    return (
        np.asarray(out_t, dtype=np.int64),
        np.asarray(out_h, dtype=np.int64),
    )


def fingerprint_samples(mono) -> list[tuple[int, int]]:
    """Fingerprint one decoded mono signal → [(t_frame, hash)] — the
    driver-side kernel, exposed for tests and exact-model checks."""
    t, b = _constellation(mono)
    ts, hs = _hashes_from_peaks(t, b)
    return list(zip(ts.tolist(), hs.tolist()))


def audio_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> DataFrame:
    """Constellation fingerprints per audio payload — one Arrow-batched
    ``mapInPandas`` pass, one output row per (anchor frame, hash).
    Non-audio mimes and undecodable payloads emit a single row with NULL
    hash and the failure class in ``decode_status`` (so consumers can
    count/quarantine them without a second scan).

    Returns (media_id, t: long, hash: long, decode_status).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            id_dtype = pdf[id_col].dtype
            ids, ts, hashes, statuses = [], [], [], []
            for mid, mime, payload in zip(
                pdf[id_col], pdf[mime_col], pdf[payload_col]
            ):
                mime = mime or ""
                if not (mime.startswith("audio/") or mime == "application/x-wav"):
                    ids.append(mid), ts.append(None), hashes.append(None)
                    statuses.append("not_audio")
                    continue
                try:
                    _, mono = decode_wav(payload or b"")
                    fps = fingerprint_samples(mono)
                # Exception, not ValueError: one malformed payload in a
                # scraped corpus must become a decode_status row, never a
                # task failure — same quarantine contract as image_dhash
                # (struct/numpy raise non-ValueError classes on hostile
                # bytes even after decode_wav's own validation).
                except Exception:
                    ids.append(mid), ts.append(None), hashes.append(None)
                    statuses.append("undecodable")
                    continue
                if not fps:
                    ids.append(mid), ts.append(None), hashes.append(None)
                    statuses.append("silent")
                    continue
                for tt, hh in fps:
                    ids.append(mid), ts.append(tt), hashes.append(hh)
                    statuses.append("ok")
            yield pd.DataFrame(
                {
                    # id dtype follows the INPUT column (string / int /
                    # ... ids all work) — a forced int64 cast failed deep
                    # inside the Arrow kernel on non-integral ids.
                    "media_id": pd.Series(ids, dtype=id_dtype),
                    "t": pd.Series(ts, dtype="Int64"),
                    "hash": pd.Series(hashes, dtype="Int64"),
                    "decode_status": statuses,
                }
            )

    id_type = media.schema[id_col].dataType.simpleString()
    return media.select(id_col, mime_col, payload_col).mapInPandas(
        batches,
        schema=f"media_id {id_type}, t long, hash long, decode_status string",
    )


def audio_match_pairs(
    fingerprints: DataFrame, min_matches: int = 5
) -> DataFrame:
    """Audio near-dup pairs from fingerprints: equi-join on hash value,
    then the Shazam offset-consistency vote — a true copy (even
    silence-padded or noise-overlaid) aligns many hashes at ONE time
    delta, while chance hash collisions scatter across deltas.  The score
    is the best single-delta count; pairs scoring ≥ ``min_matches`` are
    emitted.

    Scale: the join key is the 64-bit hash (bounded buckets — a hash
    shared by H recordings emits H² rows for that value only, the same
    bucket geometry as the LSH band joins); the vote is one groupBy on
    (id_a, id_b, dt) + a max over dt.  Returns (id_a, id_b, matches, dt)
    with id_a < id_b, dt = t_a - t_b of the winning alignment.
    """
    # One row per DISTINCT hash value per recording (earliest anchor —
    # min is partitioning-independent).  A sustained steady tone emits
    # the same (f1, f2, dt) hash at every anchor frame; without this
    # dedup a single tone shared by two unrelated recordings accumulates
    # an offset-consistent vote all by itself (the classic sustained-note
    # degeneracy — audfprint dedups hashes the same way).  True copies
    # still align every DISTINCT hash at one delta, so real matches keep
    # scores far above ``min_matches``.
    fp = (
        fingerprints.filter(F.col("hash").isNotNull())
        .groupBy("media_id", "hash")
        .agg(F.min("t").alias("t"))
    )
    a, b = fp.alias("a"), fp.alias("b")
    votes = (
        a.join(
            b,
            (F.col("a.hash") == F.col("b.hash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            (F.col("a.t") - F.col("b.t")).alias("dt"),
        )
        .agg(F.count("*").alias("matches"))
    )
    best = votes.groupBy("id_a", "id_b").agg(
        F.max(F.struct("matches", "dt")).alias("best")
    )
    return best.select(
        "id_a",
        "id_b",
        F.col("best.matches").alias("matches"),
        F.col("best.dt").alias("dt"),
    ).filter(F.col("matches") >= min_matches)


def audio_near_dup_pairs(
    media: DataFrame,
    min_matches: int = 5,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> DataFrame:
    """Fingerprint + match in one plan (see ``audio_fingerprints`` /
    ``audio_match_pairs``)."""
    return audio_match_pairs(
        audio_fingerprints(media, id_col, payload_col, mime_col),
        min_matches=min_matches,
    )


def text_as_audio(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tones: int = 12,
    tone_frames: int = 8,
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic synthetic audio corpus: each document's first
    ``n_tones`` characters become a tone sequence (codepoint → exact FFT
    bin frequency k·sr/FRAME, so every tone lands in one spectral bin) —
    SF-scale decodable audio for benches and scale checks without binary
    fixtures.  Documents sharing a text prefix become the same melody,
    so near-dup structure exists by construction.  One Arrow-batched
    ``mapInPandas`` (audio synthesis is not SQL-expressible; the
    generator is corpus plumbing, not a measured operator).

    Returns (media_id, payload, mime, n_bytes).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        tone_len = tone_frames * _HOP
        tcache: dict[int, object] = {}

        def tone(k: int):
            w = tcache.get(k)
            if w is None:
                freq = k * sample_rate / _FRAME
                tt = np.arange(tone_len, dtype=np.float64)
                tcache[k] = w = 0.7 * np.sin(2.0 * np.pi * freq * tt / sample_rate)
            return w

        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                chars = (text or "")[:n_tones]
                # Position-salted mapping: shared PREFIXES produce shared
                # melodies, but a letter recurring at different positions
                # does not (natural-language corpora share letters
                # constantly — without the salt, unrelated docs chance
                # into offset-consistent matches).
                ks = [8 + ((ord(c) + 11 * i) % 120) for i, c in enumerate(chars)] or [8]
                payloads.append(
                    wav_bytes(np.concatenate([tone(k) for k in ks]), sample_rate)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "audio/wav",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return documents.select(id_col, text_col).mapInPandas(
        batches,
        schema="media_id long, payload binary, mime string, n_bytes long",
    )
