"""Optional Redis transport for offsets (O17) and topic locks (O19).

The reference ships two Redis-backed flavors of its accounting layer:

- ``accounting/RedisRemoteLockManager.kt:8-45`` — per-topic lease via
  ``SET NX PX(24h)`` keyed ``<prefix>/<name>.lock`` holding a per-app UUID;
  ``close()`` deletes the key only when the stored UUID is the closer's own.
- ``accounting/OffsetRedisPersistence.kt:34-102`` — the committed
  ``OffsetRangeSet`` serialized as one JSON document
  ``{"partitions": [{"topic", "partition", "ranges": [{"from", "to",
  "lastProcessed"}]}]}`` under a single key (``lastProcessed`` ISO-8601,
  ``WRITE_DATES_AS_TIMESTAMPS`` disabled).

These classes reproduce both wire formats against any client object that
speaks the redis-py surface (``set``/``get``/``delete``) — the container
has no redis server or package, so production use passes a real
``redis.Redis`` and tests pass an in-memory stub.  Everything is driver-
side metadata I/O: the interval set is heap-scale by the reference's own
contract, so no Spark job touches Redis.
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from restructure_hdfs_topic_spark.operators.offsets import (
    STATE_SCHEMA,
    merge_offset_intervals,
)

DEFAULT_TTL_MS = 24 * 3600 * 1000  # RedisRemoteLockManager.kt:43


class RedisLock:
    """A held lease; ``close()`` is the reference's owner-check delete
    (RedisRemoteLockManager.kt:29-36 — GET, compare UUID, DEL).  Like the
    reference, GET→DEL is not transactional; the server-side PX expiry
    bounds the damage of a stale delete to the expiry boundary."""

    def __init__(self, client, key: str, owner: str):
        self._client = client
        self._key = key
        self._owner = owner

    def close(self) -> None:
        got = self._client.get(self._key)
        if got is not None and _to_str(got) == self._owner:
            self._client.delete(self._key)

    def __enter__(self) -> "RedisLock":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class RedisLockManager:
    """O19 over a real Redis: non-blocking ``acquire`` returning None when
    the lease is held, 24 h PX lease, owner-only unlock — drop-in for
    ``locks.StorageLockManager`` where a Redis endpoint exists (the
    deployment the storage-lease module documents as its weaker
    plain-S3 case)."""

    def __init__(self, client, key_prefix: str, ttl_ms: int = DEFAULT_TTL_MS):
        self._client = client
        self._prefix = key_prefix.rstrip("/")
        self._ttl_ms = ttl_ms
        self.owner = str(uuid.uuid4())

    def acquire(self, name: str) -> RedisLock | None:
        key = f"{self._prefix}/{name}.lock"
        # SET NX PX — atomic server-side; redis-py returns True/None.
        if self._client.set(key, self.owner, nx=True, px=self._ttl_ms):
            return RedisLock(self._client, key, self.owner)
        return None


def _to_str(value) -> str:
    return value.decode() if isinstance(value, (bytes, bytearray)) else str(value)


def _iso(ts) -> str:
    # Spark's collect() yields NAIVE datetimes in the driver's LOCAL zone
    # (TimestampType.fromInternal goes through fromtimestamp) — labelling
    # them UTC directly would shift lastProcessed by the host's UTC offset
    # on every write.  A naive .astimezone() interprets local wall time,
    # which round-trips correctly on any driver timezone.
    dt = ts if ts.tzinfo is not None else ts.astimezone()
    return dt.astimezone(timezone.utc).isoformat().replace("+00:00", "Z")


class RedisOffsetPersistence:
    """O17 state over Redis in the reference's exact JSON wire format
    (OffsetRedisPersistence.kt:69-84): one document per state key holding
    every (topic, partition)'s merged interval list.

    ``read`` → committed state DataFrame (STATE_SCHEMA; empty when the key
    is missing).  ``write`` → serialize a merged state frame under the
    key.  ``commit`` mirrors ``commit_offsets``: read + union + interval
    merge + write — call it only after the data write action succeeded
    (commit-after-store, O18)."""

    def __init__(self, client):
        self._client = client

    def read(self, spark: SparkSession, key: str) -> DataFrame:
        raw = self._client.get(key)
        if raw is None:
            return spark.createDataFrame([], STATE_SCHEMA)
        doc = json.loads(_to_str(raw))
        rows = []
        for part in doc.get("partitions", []):
            for rng in part.get("ranges", []):
                lp = rng.get("lastProcessed")
                # Range.to is nullable in the reference (a pending
                # single-offset range); ensureToOffset() maps null → from
                # (OffsetRangeSet.kt:167-170).
                to = rng.get("to")
                rows.append(
                    (
                        part["topic"],
                        int(part["partition"]),
                        int(rng["from"]),
                        int(to if to is not None else rng["from"]),
                        datetime.fromisoformat(lp.replace("Z", "+00:00"))
                        if lp is not None
                        else None,
                    )
                )
        return spark.createDataFrame(rows, STATE_SCHEMA)

    def write(self, spark: SparkSession, key: str, state: DataFrame) -> None:
        by_tp: dict[tuple, list[dict]] = {}
        has_mtime = "last_processed" in state.columns
        for r in state.collect():
            rng = {"from": r["offset_from"], "to": r["offset_to"]}
            lp = r["last_processed"] if has_mtime else None
            rng["lastProcessed"] = _iso(lp) if lp is not None else None
            by_tp.setdefault((r["topic"], r["partition"]), []).append(rng)
        doc = {
            "partitions": [
                {
                    "topic": t,
                    "partition": p,
                    "ranges": sorted(ranges, key=lambda x: (x["from"], x["to"])),
                }
                for (t, p), ranges in sorted(by_tp.items())
            ]
        }
        self._client.set(key, json.dumps(doc))

    def commit(self, spark: SparkSession, key: str, new_ranges: DataFrame) -> DataFrame:
        merged = merge_offset_intervals(
            self.read(spark, key).unionByName(new_ranges, allowMissingColumns=True)
        )
        self.write(spark, key, merged)
        return self.read(spark, key)
