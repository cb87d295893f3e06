"""Record membership check (SURVEY O22,
format/CsvAvroConverterFactory.kt:107-126 / JsonAvroConverterFactory.kt:39-50).

The reference answers "does this output file contain this record?" by
comparing selected columns positionally (CSV) or the exact serialized line
(JSON).  Spark-first: a LEFT SEMI join on the selected columns — one
shuffle (broadcast when either side is small), no per-record probing.
The cleaner's extraction verification (O20/O21) composes this with a
per-file ALL aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contains_records(
    target: DataFrame,
    records: DataFrame,
    on: list[str] | list[tuple[str, str]],
) -> DataFrame:
    """Rows of ``records`` present in ``target`` on the given columns.

    ``on``: column names shared by both frames, or (record_col, target_col)
    pairs when names differ.
    """
    pairs = [(c, c) if isinstance(c, str) else c for c in on]
    cond = None
    for rc, tc in pairs:
        clause = records[rc].eqNullSafe(target[tc])
        cond = clause if cond is None else cond & clause
    return records.join(target, cond, "left_semi")


def missing_records(
    target: DataFrame,
    records: DataFrame,
    on: list[str] | list[tuple[str, str]],
) -> DataFrame:
    """Complement: rows of ``records`` NOT present in ``target`` (anti join) —
    the cleaner's not-fully-extracted evidence."""
    pairs = [(c, c) if isinstance(c, str) else c for c in on]
    cond = None
    for rc, tc in pairs:
        clause = records[rc].eqNullSafe(target[tc])
        cond = clause if cond is None else cond & clause
    return records.join(target, cond, "left_anti")
