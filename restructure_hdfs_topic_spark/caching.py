"""Generation-scoped DataFrame persistence.

``DataFrame.persist()`` registers the plan in the session's CacheManager,
which holds a strong reference until an explicit ``unpersist()`` — Spark's
ContextCleaner never reclaims SQL-cache entries on its own.  Operators that
persist an intermediate *inside* a returned lazy plan (the LSH shingle
frame, the curation scrub, incremental-dedup signatures) therefore leak one
cache generation per call in any repeated context: a bench loop re-running
a query warm, a long-lived service curating batch after batch.

``scoped_persist`` bounds that to ONE live generation per named scope: each
call releases the previous call's handle (non-blocking) before persisting
the new frame.  Unpersisting an earlier generation is always
correctness-safe — a consumer still holding the old plan just recomputes —
so the trade is bounded memory/disk for a possible recompute of a stale
plan nobody normally re-evaluates.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def scoped_persist(
    df: DataFrame,
    scope: str,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df``, releasing the persist of the PRIOR call in ``scope``.

    If the prior call's plan is semantically identical (a warm re-run of
    the same query), its still-cached handle is returned instead — the
    repeat run hits the populated cache rather than recomputing it.

    Building a SECOND, different plan in the same scope before executing
    the first releases the first plan's cache early: that pending plan
    still computes correctly, it just recomputes the intermediate — the
    documented bounded-memory trade.  The registry is lock-guarded so
    concurrent callers cannot each persist a generation and strand one
    handle outside the registry (which would reintroduce the leak)."""
    with _LOCK:
        old = _LIVE.get(scope)
        if old is not None:
            try:
                # Reuse only if still actually cached — an external
                # clearCache() (e.g. bench inter-query hygiene) empties the
                # CacheManager without our knowledge, and returning a
                # no-longer-cached handle would silently lose caching.
                still_cached = old.storageLevel.useMemory or old.storageLevel.useDisk
                if still_cached and df.sameSemantics(old):
                    return old
            except Exception:
                pass  # old handle's session gone — fall through and replace
            _LIVE.pop(scope, None)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass  # session may be gone; nothing to release
        handle = df.persist(level)
        _LIVE[scope] = handle
        return handle


def release_scope(scope: str) -> None:
    """Explicitly release a scope's live persist (e.g. at service shutdown)."""
    with _LOCK:
        old = _LIVE.pop(scope, None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
