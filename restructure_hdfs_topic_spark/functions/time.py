"""Event-time extraction and time binning (SURVEY O9/O10).

Reference semantics (util/TimeUtil.kt:21-50): event time is the first
non-null of, in priority order:

    value.time (double, seconds since epoch)
    key.timeStart (double, seconds)
    key.start (long, epoch millis)
    value.dateTime (ISO-8601 string)
    value.date (date string)
    value.timeReceived (double, seconds)
    value.timeCompleted (double, seconds)

and the time bin (path/RecordPathFactory.kt:103-105,122-124) is the UTC hour
bucket formatted ``yyyyMMdd_HH00`` with null time → ``unknown_date``.

Spark-first: a single ``coalesce`` of built-in conversions — stays inside
whole-stage codegen, no UDF, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNKNOWN_BIN = "unknown_date"
DEFAULT_BIN_FORMAT = "yyyyMMdd_HH'00'"


def event_time(
    time_s: Column | None = None,
    time_start_s: Column | None = None,
    start_ms: Column | None = None,
    date_time_iso: Column | None = None,
    date_str: Column | None = None,
    time_received_s: Column | None = None,
    time_completed_s: Column | None = None,
) -> Column:
    """First-match event-time coalesce over the reference's priority list.

    Each argument is an optional Column of the indicated physical type; the
    result is a TimestampType column (UTC session time).
    """
    candidates: list[Column] = []
    for sec in (time_s, time_start_s):
        if sec is not None:
            candidates.append(F.timestamp_seconds(sec.cast("double")))
    if start_ms is not None:
        candidates.append(F.timestamp_millis(start_ms.cast("long")))
    if date_time_iso is not None:
        candidates.append(F.to_timestamp(date_time_iso))
    if date_str is not None:
        candidates.append(F.to_timestamp(F.to_date(date_str)))
    for sec in (time_received_s, time_completed_s):
        if sec is not None:
            candidates.append(F.timestamp_seconds(sec.cast("double")))
    if not candidates:
        raise ValueError("event_time() needs at least one candidate column")
    return F.coalesce(*candidates) if len(candidates) > 1 else candidates[0]


def time_bin(ts: Column, fmt: str = DEFAULT_BIN_FORMAT) -> Column:
    """UTC hour bin ``yyyyMMdd_HH00``; null timestamp → ``unknown_date``."""
    return F.coalesce(F.date_format(ts, fmt), F.lit(UNKNOWN_BIN))
