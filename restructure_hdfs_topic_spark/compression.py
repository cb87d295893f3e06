"""Compression codecs (SURVEY O23, compression/*.kt).

gzip and identity map directly onto Spark writer options.  ZIP is not a
Hadoop/Spark writer codec (and object-store readers do not split it), so
the reference's ``.csv.zip`` single-entry format is produced by a repack
pass over the written output: each data file becomes ``<name>.zip`` with
one entry, deflate level 7 (compression/ZipCompression.kt:16-29).

The repack touches each output file once; at cluster scale the same loop
runs in executors over a parallelized path list — kept driver-side here
because zip output is a compatibility format, not a hot path.
"""

from __future__ import annotations

import os
import zipfile

SPARK_WRITER_CODECS = {"gzip", "none", None}


def writer_compression(compression: str | None) -> str | None:
    """The codec to hand to the Spark writer; zip writes uncompressed first
    and repacks afterwards."""
    if compression in ("zip",):
        return None
    return compression


def repack_to_zip(target_dir: str, extensions: tuple[str, ...] = (".csv", ".json")) -> list[str]:
    """Replace every uncompressed data file under ``target_dir`` with a
    single-entry ``<name>.zip`` (deflate level 7).  Returns created paths.

    LOCAL-filesystem post-pass: zip is not a Spark writer codec, so this
    compat shim (reference CompressionFactory.kt zip flavor) walks the
    written tree.  For cluster/URI targets use ``compression="gzip"`` —
    the writer codec path, applied distributedly during the write."""
    created: list[str] = []
    for dirpath, _dirs, files in os.walk(target_dir):
        for fname in files:
            if not fname.endswith(extensions) or fname.startswith(("_", ".")):
                continue
            src = os.path.join(dirpath, fname)
            dst = src + ".zip"
            with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED, compresslevel=7) as zf:
                zf.write(src, arcname=fname)
            os.remove(src)
            # Hadoop's local ChecksumFileSystem writes DOT-PREFIXED
            # sidecars (.<name>.crc); check both spellings so no stale
            # checksum survives to poison a later same-named write.
            for crc in (
                src + ".crc",
                os.path.join(dirpath, f".{fname}.crc"),
            ):
                if os.path.exists(crc):
                    os.remove(crc)
            created.append(dst)
    return created


def read_zip_entry(path: str) -> bytes:
    """Read back the single entry of a ``.zip`` output file (the
    reference's decompress side, CompressionFactory.kt:22-27)."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        if len(names) != 1:
            raise ValueError(f"{path}: expected single-entry zip, found {names}")
        return zf.read(names[0])
