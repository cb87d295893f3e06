"""O17/O19 Redis transport parity (stub client — no Redis in container):
RedisRemoteLockManager.kt SET NX PX semantics and OffsetRedisPersistence.kt
JSON wire format, against the redis-py client surface."""

import json
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.redis_backends import (
    RedisLockManager,
    RedisOffsetPersistence,
)


class StubRedis:
    """In-memory redis-py lookalike honoring NX + PX expiry."""

    def __init__(self):
        self.store: dict = {}
        self.expiry: dict = {}

    def _alive(self, key) -> bool:
        exp = self.expiry.get(key)
        if exp is not None and exp <= time.time():
            self.store.pop(key, None)
            self.expiry.pop(key, None)
            return False
        return key in self.store

    def set(self, key, value, nx=False, px=None):
        if nx and self._alive(key):
            return None
        self.store[key] = value
        self.expiry[key] = time.time() + px / 1000.0 if px is not None else None
        return True

    def get(self, key):
        return self.store.get(key) if self._alive(key) else None

    def delete(self, key):
        self.store.pop(key, None)
        self.expiry.pop(key, None)


def test_redis_lock_nx_px_owner_unlock():
    client = StubRedis()
    a = RedisLockManager(client, "prefix")
    b = RedisLockManager(client, "prefix")
    lock_a = a.acquire("topic_x")
    assert lock_a is not None
    assert client.get("prefix/topic_x.lock") == a.owner
    # NX: second app refused (RedisRemoteLockManager.kt:19-26).
    assert b.acquire("topic_x") is None
    # Owner-check delete: b's close is a no-op (:29-36).
    lock_b_like = type(lock_a)(client, "prefix/topic_x.lock", b.owner)
    lock_b_like.close()
    assert client.get("prefix/topic_x.lock") == a.owner
    # Real owner release frees the key.
    lock_a.close()
    assert b.acquire("topic_x") is not None
    # Independent names never contend.
    assert a.acquire("topic_y") is not None


def test_redis_lock_px_expiry_breaks_lease():
    client = StubRedis()
    a = RedisLockManager(client, "p", ttl_ms=1)  # expires immediately
    b = RedisLockManager(client, "p")
    assert a.acquire("t") is not None
    time.sleep(0.01)  # server-side PX expiry (:41-44)
    assert b.acquire("t") is not None


def test_redis_offsets_round_trip_and_merge(spark):
    client = StubRedis()
    p = RedisOffsetPersistence(client)
    key = "offsets/events.json"
    # Missing key → empty state (OffsetRedisPersistence.kt:39-52 null path).
    assert p.read(spark, key).count() == 0

    from datetime import datetime, timezone

    ts = datetime(2024, 1, 15, tzinfo=timezone.utc)
    new = spark.createDataFrame(
        [("t", 0, 0, 10, ts), ("t", 0, 11, 20, ts), ("t", 1, 5, 7, ts)],
        "topic string, partition int, offset_from long, offset_to long, last_processed timestamp",
    )
    state = p.commit(spark, key, new)
    got = sorted(
        (r["topic"], r["partition"], r["offset_from"], r["offset_to"])
        for r in state.collect()
    )
    # Adjacent [0,10]+[11,20] merged on commit.
    assert got == [("t", 0, 0, 20), ("t", 1, 5, 7)]

    # Reference wire format: partitions[].{topic,partition,ranges[].{from,to,lastProcessed}}.
    doc = json.loads(client.get(key))
    assert set(doc) == {"partitions"}
    first = doc["partitions"][0]
    assert set(first) == {"topic", "partition", "ranges"}
    assert set(first["ranges"][0]) == {"from", "to", "lastProcessed"}
    assert first["ranges"][0]["lastProcessed"].startswith("2024-01-15T00:00:00")

    # Second commit merges against the stored document.
    more = spark.createDataFrame(
        [("t", 0, 21, 30, ts)],
        "topic string, partition int, offset_from long, offset_to long, last_processed timestamp",
    )
    state2 = p.commit(spark, key, more)
    got2 = sorted(
        (r["topic"], r["partition"], r["offset_from"], r["offset_to"])
        for r in state2.collect()
    )
    assert got2 == [("t", 0, 0, 30), ("t", 1, 5, 7)]


def test_redis_offsets_reads_reference_shaped_document(spark):
    """A document written by the reference (hand-built to its Jackson
    shape) must load, including a null lastProcessed."""
    client = StubRedis()
    client.set(
        "k",
        json.dumps(
            {
                "partitions": [
                    {
                        "topic": "audio",
                        "partition": 2,
                        "ranges": [
                            {"from": 100, "to": 200, "lastProcessed": "2023-06-01T12:00:00Z"},
                            {"from": 300, "to": 400, "lastProcessed": None},
                            # Nullable Range.to: ensureToOffset maps to=from
                            # (OffsetRangeSet.kt:167-170).
                            {"from": 500, "to": None, "lastProcessed": None},
                        ],
                    }
                ]
            }
        ),
    )
    rows = RedisOffsetPersistence(client).read(spark, "k").collect()
    by_from = {r["offset_from"]: r for r in rows}
    assert by_from[100]["offset_to"] == 200
    assert by_from[100]["last_processed"] is not None
    assert by_from[300]["last_processed"] is None
    assert by_from[100]["topic"] == "audio" and by_from[100]["partition"] == 2
    assert by_from[500]["offset_to"] == 500
