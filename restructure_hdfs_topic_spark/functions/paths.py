"""Path templating, ID sanitization and source-filename parsing (O3/O11).

Reference semantics:
- sanitize (path/RecordPathFactory.kt:120-129): strip every char outside
  ``[a-zA-Z0-9_-]``; empty/null falls back to a default like
  ``unknown-project`` / ``unknown-user`` / ``unknown-source``.
- path template (path/FormattedPathFactory.kt:31-111): default layout
  ``${projectId}/${userId}/${topic}/${filename}`` where filename is the
  time bin plus extension (path/ObservationKeyPathFactory.kt:25-38).
- filename parse (accounting/TopicPartitionOffsetRange.kt:50-61): Kafka
  Connect S3 sink names ``<topic>+<partition>+<offsetFrom>[+<offsetTo>].avro``.

All pure built-in column expressions (regexp/concat) — codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SANITIZE_PATTERN = "[^a-zA-Z0-9_-]+"

# Kafka topic names cannot contain '+' ([a-zA-Z0-9._-] only), and excluding
# it from the topic class keeps this regex EXACTLY equivalent to the
# '+'-split parse in with_parsed_filenames — a lazy [^/]+? would accept
# 'a+b+0+1+2.avro' as topic 'a+b' while the split assigns topic 'a' and
# then casts 'b' to int (a job-killing error under ANSI mode).  Single
# source of truth: sources/avro.py compiles this same string.
FILENAME_RE = r"^(?:.*/)?([^/+]+)\+(\d+)\+(\d+)(?:\+(\d+))?\.avro$"


def sanitize_id(col: Column, default: str) -> Column:
    """Strip illegal chars; empty or null → ``default``."""
    cleaned = F.regexp_replace(col.cast("string"), SANITIZE_PATTERN, "")
    return F.coalesce(F.nullif(cleaned, F.lit("")), F.lit(default))


def render_path(
    project: Column,
    user: Column,
    topic: Column,
    filename: Column,
) -> Column:
    """Default template ``${projectId}/${userId}/${topic}/${filename}``."""
    return F.concat_ws("/", project, user, topic, filename)


TEMPLATE_PARAM_RE = "\\$\\{([^}]*)}"
KNOWN_PARAMS = {
    "filename",
    "topic",
    "projectId",
    "userId",
    "sourceId",
    "attempt",
    "extension",
}
DEFAULT_TEMPLATE = "${projectId}/${userId}/${topic}/${filename}"


def validate_template(template: str) -> list[str]:
    """O11 template validation (FormattedPathFactory.kt:41-70): unknown
    parameters are errors; ``topic`` is mandatory; ``filename`` — or both
    ``extension`` and ``attempt`` — must appear.  Returns the parameter
    list in template order."""
    import re

    params = re.findall(TEMPLATE_PARAM_RE, template)
    unknown = [
        p for p in set(params) if p not in KNOWN_PARAMS and not p.startswith("time:")
    ]
    if unknown:
        raise ValueError(
            f"Cannot use path format {template}: unknown parameters {sorted(unknown)}. "
            f"Legal parameter names are time formats (e.g., ${{time:YYYYmmDD}}) "
            f"or the following: {sorted(KNOWN_PARAMS)}"
        )
    if "topic" not in params:
        raise ValueError("Path must include topic parameter.")
    if "filename" not in params and ("extension" not in params or "attempt" not in params):
        raise ValueError(
            "Path must include filename parameter or extension and attempt parameters."
        )
    return params


def render_template(
    template: str,
    topic: Column,
    project: Column,
    user: Column,
    source: Column | None = None,
    time: Column | None = None,
    attempt: Column | None = None,
    extension: str = "",
    bin_format: str = "yyyyMMdd_HH'00'",
) -> Column:
    """O11 full template render (FormattedPathFactory.kt:72-104) as ONE
    concat column expression: ids sanitized with their defaults, ``attempt``
    → ``_N`` suffix (empty for 0), ``filename`` = time bin + attempt suffix
    + extension, ``${time:pattern}`` → UTC-formatted time or
    ``unknown-time`` when null.
    """
    import re

    from restructure_hdfs_topic_spark.functions.time import time_bin

    validate_template(template)
    attempt = attempt if attempt is not None else F.lit(0)
    time = time if time is not None else F.lit(None).cast("timestamp")
    attempt_suffix = F.when(
        attempt == 0, F.lit("")
    ).otherwise(F.concat(F.lit("_"), attempt.cast("string")))
    values: dict[str, Column] = {
        "projectId": sanitize_id(project, "unknown-project"),
        "userId": sanitize_id(user, "unknown-user"),
        "sourceId": sanitize_id(
            source if source is not None else F.lit(None).cast("string"),
            "unknown-source",
        ),
        "topic": topic,
        "filename": F.concat(time_bin(time, bin_format), attempt_suffix, F.lit(extension)),
        "attempt": attempt_suffix,
        "extension": F.lit(extension),
    }
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(TEMPLATE_PARAM_RE, template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        p = m.group(1)
        if p.startswith("time:"):
            parts.append(
                F.coalesce(F.date_format(time, p.removeprefix("time:")), F.lit("unknown-time"))
            )
        else:
            parts.append(values[p])
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts)


def parse_source_filename(name: Column) -> list[Column]:
    """Extract (topic, partition, offset_from, offset_to) from a source
    object name.  ``offset_to`` falls back to ``offset_from`` for
    single-offset filenames (the reference treats those as from==to).

    Column-expression form (4 regexp passes) — correct anywhere, but for
    bulk parsing prefer ``with_parsed_filenames``, which materializes the
    split once and runs ONE regex per row.
    """
    topic = F.regexp_extract(name, FILENAME_RE, 1)
    partition = F.regexp_extract(name, FILENAME_RE, 2).cast("int")
    offset_from = F.regexp_extract(name, FILENAME_RE, 3).cast("long")
    offset_to_raw = F.nullif(F.regexp_extract(name, FILENAME_RE, 4), F.lit(""))
    offset_to = F.coalesce(offset_to_raw.cast("long"), offset_from)
    return [
        topic.alias("topic"),
        partition.alias("partition"),
        offset_from.alias("offset_from"),
        offset_to.alias("offset_to"),
    ]


def with_parsed_filenames(files: DataFrame, name_col: str = "filename") -> DataFrame:
    """O3 bulk parse: one validity regex + one split per row, materialized
    in their own projection so Catalyst never duplicates them (the 4×
    regexp_extract form cost 17.5 s/100k rows in BENCH_r01 vs the oracle's
    1.3 s one-pass).  Kafka topic names cannot contain ``+``, so splitting
    the stem on ``+`` is exact.
    """
    name = F.col(name_col)
    stem = F.regexp_replace(F.substring_index(name, "/", -1), r"\.avro$", "")
    staged = files.select(
        "*",
        F.split(stem, r"\+").alias("__parts"),
        name.rlike(FILENAME_RE).alias("__valid"),
    )
    parts, valid = F.col("__parts"), F.col("__valid")
    # F.get: 0-based, null out-of-bounds (single-offset names have 3 parts);
    # casts only evaluate under the valid guard (regex guarantees digits).
    return staged.select(
        *[c for c in files.columns],
        F.when(valid, F.get(parts, 0)).otherwise(F.lit("")).alias("topic"),
        F.when(valid, F.get(parts, 1).cast("int")).alias("partition"),
        F.when(valid, F.get(parts, 2).cast("long")).alias("offset_from"),
        F.when(
            valid, F.coalesce(F.get(parts, 3).cast("long"), F.get(parts, 2).cast("long"))
        ).alias("offset_to"),
    )
