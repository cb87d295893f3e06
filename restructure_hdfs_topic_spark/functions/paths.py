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

FILENAME_RE = r"^(?:.*/)?([^/]+?)\+(\d+)\+(\d+)(?:\+(\d+))?\.avro$"


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


def parse_source_filename(name: Column) -> list[Column]:
    """Extract (topic, partition, offset_from, offset_to) from a source
    object name.  ``offset_to`` is null for single-offset filenames
    (the reference treats those as from==to).
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
    """Project a manifest DataFrame with parsed filename columns."""
    return files.select("*", *parse_source_filename(F.col(name_col)))
