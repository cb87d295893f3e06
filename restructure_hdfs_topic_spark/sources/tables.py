"""Loaders for the driver-generated parquet tables (TESTDATA.md).

``events.ts`` is physically INT64 TIMESTAMP(NANOS) which Spark's vectorized
parquet reader refuses; we read it as long via the legacy nanosAsLong conf
and convert to a proper TimestampType (micros) — the same truncation DuckDB
applies (ns → us).  Session time is forced to UTC so time-bin derivation
(functions/time.py) is deterministic regardless of the host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the runtime confs every query in this engine relies on."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
