"""Temporal join operators (north-star extension; the reference has no
join machinery at all — SURVEY §2.1).

The as-of join is the time-series primitive Spark lacks natively: for
every left row, attach the latest right row with ``right.time <=
left.time`` per key.  The scalable shape is NOT a range join (quadratic
per key without tight bounds) but a single-shuffle union + ordered
carry-forward: tag both sides, sort by (key, time, side), and propagate
the last seen right value with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window.  One shuffle on the key, linear work,
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_window_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    window_s: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Range join on |left.time − right.time| ≤ ``window_s`` per key — the
    scale-correct shape: both sides bucket their timestamps at
    ``window_s`` width, the right side additionally lands in its ±1
    buckets, and the equi-join on (key, bucket) generates a candidate
    superset that an exact band filter prunes.  Work is linear in matches
    per bucket — never the per-key quadratic of a naive inequality join.

    Returns left columns + right's non-key columns prefixed.
    """
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / F.lit(int(window_s * 1_000_000)))
    l = left.withColumn("__b", bucket(time_col))
    r_cols = [c for c in right.columns if c not in key_cols]
    r = right.select(
        *key_cols, *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols]
    ).withColumn(
        "__b",
        F.explode(
            F.array(
                *[
                    bucket(f"{right_prefix}{time_col}") + F.lit(d)
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    joined = l.join(r, [*key_cols, "__b"])
    dt = F.abs(
        F.unix_micros(F.col(time_col)) - F.unix_micros(F.col(f"{right_prefix}{time_col}"))
    )
    return joined.filter(dt <= int(window_s * 1_000_000)).drop("__b")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the most recent ``right``
    values at or before its ``time_col`` for the same key (null if none).

    ``right`` must be unique per (key, time) — pre-aggregate if not, so
    tie behavior is deterministic.  Matches DuckDB's ``ASOF LEFT JOIN ...
    ON l.key = r.key AND l.t >= r.t`` semantics (equal timestamps match).
    """
    from pyspark.sql import types as T

    # All carried fields ride in ONE struct marker: the marker is NULL for
    # left rows and NON-NULL for every right row, so last(ignorenulls)
    # carries the MATCHED ROW even when its value fields are genuinely
    # NULL (per-column last() would skip it and surface an older value —
    # diverging from SQL ASOF semantics).  Right rows with a NULL
    # timestamp are dropped up front: `l.t >= NULL` never matches, and
    # NULLS-FIRST ordering would otherwise carry them into every row.
    row_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__r_row", F.lit(None).cast(row_type))
    )
    r_tag = (
        right.filter(F.col(time_col).isNotNull())
        .select(
            *key_cols,
            time_col,
            F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_row"),
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    # Right rows (__side 0) sort before left rows at the same timestamp, so
    # an equal-time right value is visible to the left row (>= semantics).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*", F.last("__r_row", ignorenulls=True).over(w).alias("__asof_row")
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__asof_row").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return out
