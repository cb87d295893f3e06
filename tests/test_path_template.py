"""O11 path templating, pinned to the reference's
FormattedPathFactoryTest.kt:12-60 golden paths and validation errors."""

import pytest
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.paths import (
    DEFAULT_TEMPLATE,
    render_template,
    validate_template,
)


def _render_one(spark, template, **kw):
    df = spark.range(1).select(
        render_template(
            template,
            topic=F.lit("t"),
            project=F.lit("p"),
            user=F.lit("u"),
            source=F.lit("s"),
            time=F.to_timestamp(F.lit("2021-01-02 10:05:00")),
            **kw,
        ).alias("path")
    )
    return df.collect()[0].path


def test_format_with_time_parameters(spark):
    # FormattedPathFactoryTest.testFormat golden.
    path = _render_one(
        spark,
        "${topic}/${projectId}/${userId}/${sourceId}/${time:yyyyMM}/${time:dd}/${filename}",
        extension=".csv.gz",
    )
    assert path == "t/p/u/s/202101/02/20210102_1000.csv.gz"


def test_default_template(spark):
    # FormattedPathFactoryTest.unparameterized golden.
    path = _render_one(spark, DEFAULT_TEMPLATE, extension=".csv.gz")
    assert path == "p/u/t/20210102_1000.csv.gz"


def test_attempt_suffix_and_null_time(spark):
    df = spark.range(3).select(
        render_template(
            "${topic}/${attempt}${extension}x${time:yyyy}",
            topic=F.lit("t"),
            project=F.lit("p"),
            user=F.lit("u"),
            time=F.lit(None).cast("timestamp"),
            attempt=F.col("id").cast("int"),
            extension=".csv",
        ).alias("path")
    )
    # attempt 0 → no suffix; null time → unknown-time (and unknown_date bin).
    assert [r.path for r in df.collect()] == [
        "t/.csvxunknown-time",
        "t/_1.csvxunknown-time",
        "t/_2.csvxunknown-time",
    ]


def test_validation_errors():
    with pytest.raises(ValueError, match="topic"):
        validate_template("${projectId}/${userId}/${filename}")
    with pytest.raises(ValueError, match="filename"):
        validate_template("${topic}/${projectId}")
    with pytest.raises(ValueError, match="unknown"):
        validate_template("${topic}/${filename}${unknown}")
    # extension+attempt can substitute for filename — only together.
    validate_template("${topic}/${attempt}${extension}")
    with pytest.raises(ValueError):
        validate_template("${topic}/${attempt}")
    with pytest.raises(ValueError):
        validate_template("${topic}/${extension}")


def test_sanitize_and_defaults_in_render(spark):
    df = spark.range(1).select(
        render_template(
            "${projectId}/${userId}/${sourceId}/${topic}/${filename}",
            topic=F.lit("t"),
            project=F.lit("p!@#"),
            user=F.lit(""),
            source=F.lit(None).cast("string"),
            time=F.to_timestamp(F.lit("2021-01-02 10:05:00")),
            extension=".json",
        ).alias("path")
    )
    assert df.collect()[0].path == "p/unknown-user/unknown-source/t/20210102_1000.json"
