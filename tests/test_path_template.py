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


def test_logical_and_physical_renderers_agree(spark):
    """The column-expression renderer (functions/paths.render_template) and
    the finalize-time driver renderer (plans/layout.render_final_path) must
    produce the SAME path for the same record across every supported
    template shape — drift between them would place files somewhere the
    logical plan does not predict."""
    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.functions.paths import render_template
    from restructure_hdfs_topic_spark.plans.layout import render_final_path

    templates = [
        "${projectId}/${userId}/${topic}/${filename}",
        "${topic}/${projectId}/${userId}/${sourceId}/${time:yyyyMM}/${time:dd}/${filename}",
        "${projectId}/${topic}/${time:yyyyMMdd}${attempt}${extension}",
        "${topic}/${userId}/${time:yyyy}/${time:MM}/${filename}",
    ]
    cases = [
        # (project, user, source, time, attempt)
        ("p one", "u@ser", "s/1", "2021-01-02 10:05:00", 0),
        ("", None, None, "2021-01-02 10:05:00", 2),
    ]
    df = spark.createDataFrame(
        [(p, u, s, t, a) for p, u, s, t, a in cases],
        "project string, user string, source string, t string, attempt int",
    ).withColumn("t", F.to_timestamp("t"))
    for tmpl in templates:
        logical = [
            r["path"]
            for r in df.select(
                render_template(
                    tmpl,
                    topic=F.lit("tp"),
                    project=F.col("project"),
                    user=F.col("user"),
                    source=F.col("source"),
                    time=F.col("t"),
                    attempt=F.col("attempt"),
                    extension=".csv",
                ).alias("path")
            ).collect()
        ]
        from restructure_hdfs_topic_spark.functions.time import time_bin

        bins = [
            r["b"]
            for r in df.select(time_bin(F.col("t"), "yyyyMMdd_HH'00'").alias("b")).collect()
        ]
        import re as _re
        from datetime import datetime, timezone

        tps = [
            p.removeprefix("time:")
            for p in dict.fromkeys(_re.findall(r"\$\{(time:[^}]*)}", tmpl))
        ]
        for (proj, user, src, t, attempt), bin_name, got_logical in zip(cases, bins, logical):
            ts = datetime.strptime(t, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)
            kv = {
                "projectId": _sanitize(proj, "unknown-project"),
                "userId": _sanitize(user, "unknown-user"),
                "sourceId": _sanitize(src, "unknown-source"),
                "bin": bin_name,
                "attempt": str(attempt),
            }
            for i, pat in enumerate(tps):
                # Spark date_format and Java DateTimeFormatter share these
                # pattern letters for the shapes under test.
                java_to_py = {"yyyyMM": "%Y%m", "dd": "%d", "yyyyMMdd": "%Y%m%d", "yyyy": "%Y", "MM": "%m"}
                kv[f"__tp{i}"] = ts.strftime(java_to_py[pat])
            got_physical = render_final_path(tmpl, "tp", kv, ".csv")
            assert got_physical == got_logical, (tmpl, kv, got_physical, got_logical)


def _sanitize(v, default):
    import re as _re

    cleaned = _re.sub(r"[^a-zA-Z0-9_-]+", "", v or "")
    return cleaned or default
