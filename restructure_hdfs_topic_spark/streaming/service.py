"""Service mode as Structured Streaming (SURVEY O27, M5).

Reference (Application.kt:100-119, worker/Job.kt:12-46): a scheduled
executor polls the source every ``service.interval`` seconds (default
300 s) and runs the restructure pipeline; ``minimumFileAge`` (60 s) is a
crude late-data guard.

Spark-first: a file-source ``readStream`` with
``trigger(processingTime=...)`` (service loop) or ``availableNow`` (one
shot that drains the backlog then stops).  ``maxFilesPerTrigger``
reproduces ``maxFilesPerTopic``; the principled replacement for
``minimumFileAge`` is a WATERMARK on event time — late records are
handled by the engine, not by guessing file ages.  Checkpointing gives
the exactly-once file tracking the reference built by hand with Redis
offsets (O16-O18) — in streaming mode the engine's own commit log is the
offset store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from restructure_hdfs_topic_spark.functions.time import time_bin
from restructure_hdfs_topic_spark.functions.paths import sanitize_id
from restructure_hdfs_topic_spark.plans.restructure import PARTITION_COLS


def streaming_restructure(
    spark: SparkSession,
    source_dir: str,
    schema,
    source_format: str = "parquet",
    max_files_per_trigger: int | None = None,
    user_col: str = "user_id",
    time_col: str = "ts",
    topic: str = "events",
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream → record organization (O9-O11) with a watermark replacing
    the reference's minimumFileAge late-data guard."""
    reader = spark.readStream.format(source_format).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(source_dir)
    return (
        df.withWatermark(time_col, watermark)
        .withColumn("projectId", F.lit("unknown-project"))
        .withColumn("userId", sanitize_id(F.col(user_col), "unknown-user"))
        .withColumn("topic", F.lit(topic))
        .withColumn("bin", time_bin(F.col(time_col)))
    )


def start_service(
    organized: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    interval_s: int | None = None,
) -> StreamingQuery:
    """writeStream partitioned sink; ``interval_s`` (reference default
    300 s) → processingTime trigger; None → availableNow (drain & stop)."""
    writer = (
        organized.writeStream.format(fmt)
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*PARTITION_COLS)
        .outputMode("append")
    )
    if interval_s:
        writer = writer.trigger(processingTime=f"{interval_s} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_template_service(
    organized: DataFrame,
    config,
    topic: str,
    checkpoint_dir: str,
    interval_s: int | None = None,
) -> StreamingQuery:
    """Streaming form of the TEMPLATE physical layout (O11 physical half,
    path/FormattedPathFactory.kt:111): each micro-batch runs the same
    two-phase sink as the batch job — distributed staging write, then the
    metadata-only finalize that places files at the rendered
    ``${projectId}/${userId}/${topic}/<bin><ext>`` tree, merging into bins
    earlier batches already wrote (the reference's append path).

    ``foreachBatch`` is the Structured Streaming composition point for
    custom sinks; the engine's checkpoint makes each batch replay-once.
    Replay after a crash *inside* a batch is handled at both phases:

    - staging leftovers of the failed attempt are deleted before the
      batch's write (the staging dir exists only within one batch), so
      partial stage-outs never double rows;
    - a crash after finalize but before the checkpoint commit replays a
      fully-finalized batch → at-least-once into final bins, the same
      window the reference's commit-after-store has
      (worker/RestructureWorker.kt).  Upstream
      ``streaming_seen_record_filter`` (stateful exactly-once) closes it
      when exact delivery matters.
    """
    if getattr(config.paths, "layout", None) != "template":
        # _write_topic branches on the config layout; silently producing a
        # Hive partition-column tree from a function that promises the
        # rendered template tree would be a data-layout surprise.
        raise ValueError(
            "start_template_service requires config.paths.layout='template' "
            f"(got {getattr(config.paths, 'layout', None)!r}); use "
            "start_service for the Hive layout"
        )
    cfg = config

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = f"{cfg.target_dir.rstrip('/')}/_staging_{topic}"
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(staging)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            fs.delete(hpath, True)
        from restructure_hdfs_topic_spark.plans.avro_job import _write_topic

        _write_topic(batch_df, cfg, topic)

    writer = (
        organized.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if interval_s:
        writer = writer.trigger(processingTime=f"{interval_s} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_avro_stream(
    spark: SparkSession,
    topic_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming Avro source for one topic directory — the
    streaming form of the reference's polling service over its REAL input
    format: a ``binaryFile`` file stream decoded by the same pure-Python
    container kernel as the batch reader (each file's embedded writer
    schema, per-record Kafka offsets).  The stream's checkpoint is the
    seen-file ledger (engine-managed exactly-once; the batch path's offset
    state is the replayable equivalent)."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from restructure_hdfs_topic_spark.sources.avro import (
        make_avro_decoder,
        union_schema_for_paths,
        walk_topics,
    )

    topics = walk_topics(topic_dir, spark=spark)
    if not topics:
        raise ValueError(f"no Avro topics under {topic_dir}")
    # Union the headers of every existing file so a topic that evolved
    # before the stream started loses no fields (files arriving later with
    # NEW fields still project onto this fixed stream schema — restart the
    # stream to pick them up; Structured Streaming schemas are static).
    decode, out_schema = make_avro_decoder(
        union_schema_for_paths(
            spark, [f.path for files in topics.values() for f in files]
        )
    )
    bin_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    binary = reader.load(topic_dir).select("path", "modificationTime", "content")
    return binary.mapInPandas(decode, schema=out_schema)


def run_service(
    spark: SparkSession,
    input_root: str,
    config,
    max_iterations: int | None = None,
    sleep_fn=None,
    clock=None,
    restructure: bool = True,
) -> list[dict]:
    """O27 batch-job scheduler (Application.kt:100-119, worker/Job.kt:12-46):
    run the Avro restructure job every ``service.interval_s`` and — when
    enabled — the cleaner every ``cleaner.interval_s``, until interrupted
    (or ``max_iterations`` restructure runs, for tests/one-shot).

    ``sleep_fn``/``clock`` are injectable for tests; the defaults are real
    time.  This is the driver-loop analogue of the reference's scheduled
    executor — the streaming functions above are the Structured Streaming
    form for a continuously-arriving source.
    """
    import time as _time

    from restructure_hdfs_topic_spark.plans.avro_job import (
        run_avro_cleaner_job,
        run_avro_restructure_job,
    )

    sleep_fn = sleep_fn or _time.sleep
    clock = clock or _time.time
    results: list[dict] = []
    last_clean = clock()
    iteration = 0
    while max_iterations is None or iteration < max_iterations:
        iteration += 1
        if restructure:
            out = run_avro_restructure_job(spark, input_root, config, now_s=clock())
            out["job"] = "restructure"
            results.append(out)
        if config.cleaner.enable and clock() - last_clean >= config.cleaner.interval_s:
            cleaned = run_avro_cleaner_job(spark, input_root, config, now_s=clock())
            cleaned["job"] = "clean"
            results.append(cleaned)
            last_clean = clock()
        if max_iterations is not None and iteration >= max_iterations:
            break
        sleep_fn(config.service.interval_s)
    return results


def windowed_rate(
    organized: DataFrame,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful extension beyond the reference: watermarked windowed counts
    per (user, window) — the streaming analogue of time binning with true
    late-data semantics."""
    return (
        organized.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"), F.col("userId"))
        .agg(F.count("*").alias("n_records"))
        .select(F.col("win.start").alias("bin_start"), "userId", "n_records")
    )
