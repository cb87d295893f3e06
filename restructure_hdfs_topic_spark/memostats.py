"""Process-global memo instrumentation (VERDICT r13 #3).

Several operators memoize *results* whose construction is execution
(``near_dup_groups``/``_soft_dedup_stage`` transitive closures, the IVF
route/centroids, the build-once /tmp artifact templates).  A warm bench
iteration that hits such a memo prices a fingerprint scan instead of the
real closure — a perfectly honest number for a repeated caller, but a
WEAK number for "how fast is the closure".  Every memo site therefore
reports hits/misses here, and the bench snapshots the counters around
each timed iteration so the recorded JSON says exactly which warm
numbers are memo-assisted.

Pure bookkeeping: never consulted to produce results, adds two dict
operations per memo lookup.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_COUNTS: dict[str, list[int]] = {}  # name -> [hits, misses]


def record(name: str, hit: bool) -> None:
    """Count one lookup against the named memo (thread-safe: operators
    run from bench/plan thread pools)."""
    with _LOCK:
        c = _COUNTS.setdefault(name, [0, 0])
        c[0 if hit else 1] += 1


def snapshot() -> dict[str, tuple[int, int]]:
    """(hits, misses) per memo name, cumulative for this process."""
    with _LOCK:
        return {k: (v[0], v[1]) for k, v in _COUNTS.items()}


def delta(before: dict[str, tuple[int, int]]) -> dict[str, list[int]]:
    """Per-memo [hits, misses] accrued since ``before`` (zeros dropped)."""
    now = snapshot()
    out: dict[str, list[int]] = {}
    for k, (h, m) in now.items():
        bh, bm = before.get(k, (0, 0))
        if h - bh or m - bm:
            out[k] = [h - bh, m - bm]
    return out
