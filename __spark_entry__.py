"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()[name]`` is an operator from SURVEY.md §2 (or a north-star
extension) re-expressed Spark-first; ``oracle_sql()[name]`` is the
equivalent ANSI SQL for DuckDB over the same parquet views.  Column names
are aliased identically on both sides (driver hashes sort columns by name).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.time import time_bin
from restructure_hdfs_topic_spark.functions.paths import (
    parse_source_filename,
    render_path,
    sanitize_id,
)
from restructure_hdfs_topic_spark.operators.dedup import keep_last_dedup
from restructure_hdfs_topic_spark.sources.tables import configure as _utc
from restructure_hdfs_topic_spark.sources.tables import load_table as _t


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the restructure pipeline's record organization (O9-O11)
    over sf0.001 events — the reference's core per-record derivation."""
    _utc(spark)
    return q_restructure_flagship(spark, "/root/testdata/sf0.001")


# --- queries --------------------------------------------------------------


def q_restructure_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    events = _t(spark, sf_dir, "events")
    return events.select(
        F.col("event_id"),
        sanitize_id(F.col("user_id"), "unknown-user").alias("userId"),
        F.lit("unknown-project").alias("projectId"),
        F.lit("events").alias("topic"),
        time_bin(F.col("ts")).alias("bin"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "restructure_flagship": q_restructure_flagship,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "restructure_flagship": """
            SELECT event_id,
                   COALESCE(NULLIF(regexp_replace(CAST(user_id AS VARCHAR), '[^a-zA-Z0-9_-]+', '', 'g'), ''), 'unknown-user') AS userId,
                   'unknown-project' AS projectId,
                   'events' AS topic,
                   COALESCE(strftime(ts, '%Y%m%d_%H00'), 'unknown_date') AS bin
            FROM events
        """,
    }
