"""O17/O19 Redis transport parity (stub client — no Redis in container):
RedisRemoteLockManager.kt SET NX PX semantics and OffsetRedisPersistence.kt
JSON wire format, against the redis-py client surface."""

import json
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.redis_backends import (
    RedisLock,
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


# ---------------------------------------------------------------------------
# Round-trip tests against a client that ENFORCES Redis semantics: an
# in-process RESP2 socket server (tests/mini_redis.py).  Everything crosses
# the wire as bytes, SET option parsing and NX atomicity happen server-side
# — pinning the behaviors of the reference's docker-backed integration
# tests (RedisRemoteLockManagerTest.kt, OffsetRangeRedisTest.kt) without
# infrastructure (VERDICT r5 next-round #3).
# ---------------------------------------------------------------------------

from tests.mini_redis import MiniRedisClient, MiniRedisServer


@pytest.fixture()
def live_redis():
    with MiniRedisServer() as srv:
        client = MiniRedisClient(srv.port)
        assert client.ping() == "PONG"
        yield client
        client.close()


def test_live_exclusive_and_granular_locks(live_redis):
    """RedisRemoteLockManagerTest.testExclusiveLock / testGranularityLock:
    same-name lease excludes the second manager; different names coexist."""
    m1 = RedisLockManager(live_redis, "locks")
    m2 = RedisLockManager(live_redis, "locks")
    with m1.acquire("t") as l1:
        assert l1 is not None
        assert m2.acquire("t") is None
        l2 = m2.acquire("t2")
        assert l2 is not None
        l2.close()


def test_live_non_overlapping_lock_reacquire(live_redis):
    """testNonOverlappingLock(SameManager): after close, either manager can
    re-acquire."""
    m1 = RedisLockManager(live_redis, "locks")
    m2 = RedisLockManager(live_redis, "locks")
    l1 = m1.acquire("t")
    assert l1 is not None
    l1.close()
    l2 = m2.acquire("t")
    assert l2 is not None
    l2.close()
    l3 = m1.acquire("t")
    assert l3 is not None
    l3.close()


def test_live_owner_only_unlock_and_ttl(live_redis):
    """close() deletes only the closer's own UUID (owner-check GET+DEL);
    an expired PX lease frees the name server-side."""
    m1 = RedisLockManager(live_redis, "locks")
    m2 = RedisLockManager(live_redis, "locks")
    l1 = m1.acquire("t")
    assert l1 is not None
    # A non-owner close must not free the lease.
    stranger = RedisLock(live_redis, "locks/t.lock", m2.owner)
    stranger.close()
    assert m2.acquire("t") is None
    l1.close()
    # PX expiry: a short lease frees itself.
    m3 = RedisLockManager(live_redis, "locks", ttl_ms=80)
    assert m3.acquire("t") is not None
    assert m1.acquire("t") is None
    time.sleep(0.12)
    l4 = m1.acquire("t")
    assert l4 is not None
    l4.close()


def test_live_offsets_read_empty(spark, live_redis):
    """OffsetRangeRedisTest.readEmpty: missing key reads as empty state;
    a written-then-deleted key reads empty again."""
    p = RedisOffsetPersistence(live_redis)
    assert p.read(spark, "test/topic").count() == 0
    p.write(spark, "test/topic", spark.createDataFrame([], _state_schema()))
    assert live_redis.get("test/topic") is not None
    assert p.read(spark, "test/topic").count() == 0
    live_redis.delete("test/topic")
    assert p.read(spark, "test/topic").count() == 0


def _state_schema():
    from restructure_hdfs_topic_spark.operators.offsets import STATE_SCHEMA

    return STATE_SCHEMA


def _ranges(spark, rows):
    from datetime import datetime, timezone

    lm = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    return spark.createDataFrame(
        [(t, pt, lo, hi, lm) for (t, pt, lo, hi) in rows], _state_schema()
    )


def test_live_offsets_write_and_containment(spark, live_redis):
    """OffsetRangeRedisTest.write: adjacent file ranges merge so the set
    contains [0,2] but not [0,3], other partitions or topics."""
    p = RedisOffsetPersistence(live_redis)
    p.commit(spark, "test/topic", _ranges(spark, [("a", 0, 0, 1), ("a", 0, 1, 2)]))
    state = {
        ((r.topic, r.partition), (r.offset_from, r.offset_to))
        for r in p.read(spark, "test/topic").collect()
    }
    assert state == {(("a", 0), (0, 2))}


def test_live_offsets_cleanup_wire_format(spark, live_redis):
    """OffsetRangeRedisTest.cleanUp: the raw Redis document is the
    reference's exact JSON shape with MERGED ranges [0,2] and [4,4] and an
    ISO-8601 lastProcessed."""
    p = RedisOffsetPersistence(live_redis)
    p.commit(
        spark,
        "test/topic",
        _ranges(spark, [("a", 0, 0, 1), ("a", 0, 1, 2), ("a", 0, 4, 4)]),
    )
    raw = live_redis.get("test/topic")
    assert isinstance(raw, bytes)  # real redis-py returns bytes
    doc = json.loads(raw.decode())
    assert [p_["topic"] for p_ in doc["partitions"]] == ["a"]
    ranges = doc["partitions"][0]["ranges"]
    assert [(r["from"], r["to"]) for r in ranges] == [(0, 2), (4, 4)]
    for r in ranges:
        assert r["lastProcessed"].endswith("Z")
        assert r["lastProcessed"].startswith("2024-03-01T12:00:00")
    # And a reload parses it back identically (persist-merge-reload).
    state = {
        (r.offset_from, r.offset_to)
        for r in p.read(spark, "test/topic").collect()
    }
    assert state == {(0, 2), (4, 4)}


def test_live_nx_atomicity_under_threads(live_redis):
    """Many concurrent SET NX on one key: exactly one winner (the server
    serializes commands like real Redis)."""
    import threading

    wins = []

    def contend(i):
        c = MiniRedisClient(live_redis._sock.getpeername()[1])
        try:
            if c.set("locks/race.lock", f"owner-{i}", nx=True, px=60_000):
                wins.append(i)
        finally:
            c.close()

    threads = [threading.Thread(target=contend, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
