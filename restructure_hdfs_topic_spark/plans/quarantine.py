"""Corrupt-target quarantine (SURVEY O25, worker/FileCache.kt:173-201).

The reference hits corruption when it re-reads an existing target file to
append to it; a file that fails decompress/parse is moved aside to
``<name>.corrupted[-N]`` and a fresh file is started.  Our engine never
appends, but the cleaner (O20/O21) re-reads target output for extraction
verification — a corrupt file there would poison the verdict join (or
abort it).  This job scans the target tree, validates each data file
(gzip integrity + format parse), and renames failures to ``.corrupted``
so subsequent reads skip them (Spark readers match on extension).

Scale shape: validation runs INSIDE executors (binaryFile distributes the
files); only the tiny bad-file list returns to the driver, which performs
the renames through the Hadoop FileSystem API (works on object stores).
"""

from __future__ import annotations

import gzip
import io
import json as _json
import os

from pyspark.sql import SparkSession


def _validate_bytes(name: str, data: bytes, fmt: str) -> str | None:
    """Return an error string if the file bytes are corrupt, else None."""
    import zipfile

    try:
        if name.endswith(".gz"):
            data = gzip.decompress(data)
        elif name.endswith(".zip"):
            # compression='zip' targets are single-entry archives
            # (compression.repack_to_zip); validate the INNER payload —
            # raw deflate bytes would fail every text check below.
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                names = zf.namelist()
                if len(names) != 1:
                    return f"zip entries: {len(names)}"
                data = zf.read(names[0])
        if fmt == "json":
            for line in io.BytesIO(data).read().splitlines():
                if line.strip():
                    _json.loads(line)
        elif fmt == "csv":
            data.decode("utf-8")
        return None
    except Exception as exc:  # corrupt: any decode/parse failure
        return f"{type(exc).__name__}: {exc}"


def find_corrupt_targets(spark: SparkSession, target_dir: str, fmt: str) -> list[str]:
    """Distributed scan: validate every data file under ``target_dir``;
    returns the corrupt paths."""
    ext = {"json": ".json", "csv": ".csv"}.get(fmt)
    # Listing is driver-side Hadoop FS metadata (same O(#files) the
    # reference's walker holds); byte validation runs in executors through
    # pyarrow's filesystem.  Neither Spark's file sources nor sc.binaryFiles
    # fit here: a recovery tool runs precisely when files changed underneath
    # Spark, where the DataFrame source's FileStatusCache serves stale sizes
    # and Hadoop's local checksum layer (.crc sidecars) throws inside the
    # JVM before any validator sees the bytes.
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(target_dir)
    fs = root.getFileSystem(conf)
    paths: list[str] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")) or ".corrupted" in name:
            continue
        if name.startswith("schema-"):
            # Schema sidecars are pretty-printed whole-file JSON documents,
            # not data files — the reference's quarantine (FileCache.kt's
            # append path) never touches them, and validating them as
            # JSON-lines would quarantine every healthy sidecar.
            continue
        if ext is not None and ext not in name:
            continue
        paths.append(status.getPath().toString())
    if not paths:
        return []

    def check(path: str) -> str | None:
        import pyarrow.fs as pafs

        filesystem, fpath = pafs.FileSystem.from_uri(path)
        try:
            with filesystem.open_input_stream(fpath) as stream:
                data = stream.read()
        except Exception:
            return path  # unreadable == corrupt
        return path if _validate_bytes(path, data, fmt) is not None else None

    n_slices = max(1, min(len(paths), 64))
    bad = spark.sparkContext.parallelize(paths, n_slices).map(check).collect()
    return sorted(p for p in bad if p)


def quarantine_corrupt_targets(
    spark: SparkSession, target_dir: str, fmt: str
) -> list[str]:
    """Find corrupt target files and rename each to ``<name>.corrupted[-N]``
    (FileCache.kt:173-201 naming).  Returns the quarantined paths."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    moved = []
    for path in find_corrupt_targets(spark, target_dir, fmt):
        src = jvm.org.apache.hadoop.fs.Path(path)
        fs = src.getFileSystem(conf)
        dest = jvm.org.apache.hadoop.fs.Path(path + ".corrupted")
        n = 0
        while fs.exists(dest):
            n += 1
            dest = jvm.org.apache.hadoop.fs.Path(f"{path}.corrupted-{n}")
        fs.rename(src, dest)
        moved.append(dest.toString())
    return moved
