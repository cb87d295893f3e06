"""The main restructure pipeline (SURVEY §3.1), Spark-first.

Reference lifecycle (worker/RestructureWorker.kt:43-168): per topic, stream
Avro records one at a time, derive (path, time bin), skip already-committed
offsets, append rows into per-(project,user,topic,bin) CSV/JSON files.

Spark equivalent: ONE declarative plan —

    read → event-time coalesce (O9) → time bin (O10) → sanitize ids (O11)
         → [optional offsets anti-join (O5)] → [optional keep-last dedup (O14)]
         → write.partitionBy(project, user, topic, bin) (O13)

Catalyst prunes columns into the scan, the only shuffles are the optional
dedup/anti-join exchanges, and the partitioned write replaces the
reference's LRU file-handle cache (worker/FileCacheStore.kt:122-133) —
Spark's committer manages handles and atomic visibility.

At 100 TB: the write is hash-partitioned on the partition columns via
``repartition`` so each output bin is written by one task (no
thousands-of-small-files explosion), AQE handles skewed users.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.time import event_time, time_bin
from restructure_hdfs_topic_spark.functions.paths import sanitize_id

PARTITION_COLS = ["projectId", "userId", "topic", "bin"]


def organize_events(events: DataFrame, topic: str = "events") -> DataFrame:
    """Derive the record-organization columns (O9–O11) for the driver's
    ``events`` table, mapping it onto the reference's record model:
    ``user_id`` → userId, ``ts`` → event time, constant project/topic.

    Returns the input plus (projectId, userId, topic, bin) — the write
    partition columns of the reference's output layout
    ``projectId/userId/topic/yyyyMMdd_HH00`` (path/FormattedPathFactory.kt:111).
    """
    return (
        # cast('double') keeps sub-second precision; unix_timestamp would
        # truncate to whole seconds before event_time re-expands it.
        events.withColumn("time", event_time(time_s=F.col("ts").cast("double")))
        .withColumn("bin", time_bin(F.col("ts")))
        .withColumn("projectId", sanitize_id(F.lit(None).cast("string"), "unknown-project"))
        .withColumn("userId", sanitize_id(F.col("user_id"), "unknown-user"))
        .withColumn("topic", F.lit(topic))
    )


def restructure_records(
    records: DataFrame,
    project_col: str | None = None,
    user_col: str = "user_id",
    topic: str = "events",
    time_col: str = "ts",
    bin_format: str = "yyyyMMdd_HH'00'",
) -> DataFrame:
    """Generic record-organization projection for any key/value-ish table."""
    project = (
        sanitize_id(F.col(project_col), "unknown-project")
        if project_col
        else F.lit("unknown-project")
    )
    return (
        records.withColumn("projectId", project)
        .withColumn("userId", sanitize_id(F.col(user_col), "unknown-user"))
        .withColumn("topic", F.lit(topic))
        .withColumn("bin", time_bin(F.col(time_col), bin_format))
    )


def write_restructured(
    organized: DataFrame,
    output_dir: str,
    fmt: str = "json",
    compression: str | None = None,
    max_records_per_file: int | None = None,
    topics: list[str] | None = None,
) -> None:
    """Partitioned sink (O13) + schema sidecar (O24).

    The reference appends into one file per bin by download-decompress-
    append-reupload (worker/FileCache.kt:61-103) — O(file²) traffic on
    object stores. We write each bin once per batch instead; contents are
    identical at directory granularity (SURVEY §7.3 divergence note).
    """
    writer = (
        organized
        # One task per output bin: avoids the many-small-files problem the
        # reference solves with its LRU writer cache.
        .repartition(*[F.col(c) for c in PARTITION_COLS])
        .write.mode("append")
        .partitionBy(*PARTITION_COLS)
    )
    from restructure_hdfs_topic_spark.compression import writer_compression

    # zip is not a Spark writer codec: write uncompressed, repack below —
    # the same two-phase shape as the Avro job (passing 'zip' through
    # would throw IllegalArgumentException at write time).
    codec = writer_compression(compression)
    if codec and codec != "none":
        writer = writer.option("compression", codec)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    getattr(writer, fmt)(output_dir)
    if compression == "zip":
        from restructure_hdfs_topic_spark.compression import repack_to_zip

        repack_to_zip(
            output_dir, extensions=(f".{fmt}",), spark=organized.sparkSession
        )
    _write_schema_sidecar(organized, output_dir, topics)


def _write_schema_sidecar(
    organized: DataFrame, output_dir: str, topics: list[str] | None = None
) -> None:
    """``schema-<topic>.json`` once per topic dir (worker/FileCacheStore.kt:100-116).

    The caller passes the topic list it already knows (the job processes one
    topic per iteration); only a caller that genuinely doesn't triggers the
    distinct scan.  Writes go through the Hadoop FileSystem API so the
    sidecar lands on whatever store the output does (file://, s3a://, …).
    """
    if topics is None:
        topics = [r[0] for r in organized.select("topic").distinct().collect()]
    schema_json = json.dumps(organized.drop(*PARTITION_COLS).schema.jsonValue(), indent=2)
    spark = organized.sparkSession
    jvm = spark._jvm
    hadoop_conf = spark._jsc.hadoopConfiguration()
    out_path = jvm.org.apache.hadoop.fs.Path(output_dir)
    fs = out_path.getFileSystem(hadoop_conf)
    fs.mkdirs(out_path)
    for topic in topics:
        path = jvm.org.apache.hadoop.fs.Path(output_dir, f"schema-{topic}.json")
        if not fs.exists(path):
            try:
                stream = fs.create(path, False)
            except Exception:
                # Exists-then-create is a TOCTOU window: a concurrent
                # instance winning the sidecar create is benign — the data
                # write already succeeded and the sidecar content is
                # identical.
                continue
            try:
                stream.write(bytearray(schema_json, "utf-8"))
            finally:
                stream.close()
