"""O19: storage-based topic leases (reference RedisRemoteLockManager.kt
semantics — SET NX with 24h TTL, owner-only unlock) over the state dir."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.config import (
    PathConfig,
    RestructureConfig,
    WorkerConfig,
)
from restructure_hdfs_topic_spark.locks import StorageLockManager
from restructure_hdfs_topic_spark.plans.avro_job import run_avro_restructure_job

FIXTURES = "/root/reference/src/integrationTest/resources"


def test_lease_mutual_exclusion_and_owner_unlock(spark, tmp_path):
    state = str(tmp_path / "state")
    a = StorageLockManager(spark, state)
    b = StorageLockManager(spark, state)  # a second engine instance
    lock_a = a.acquire("topic_x")
    assert lock_a is not None
    # Second instance cannot take a held lease (RedisRemoteLockManager
    # .kt:19-26 returns null on NX failure).
    assert b.acquire("topic_x") is None
    # Owner-only unlock: b releasing a's lease is a no-op (:29-36).
    b._release("topic_x")
    assert b.acquire("topic_x") is None
    # Independent names don't contend.
    lock_b = b.acquire("topic_y")
    assert lock_b is not None
    lock_b.close()
    # Real release frees the lease for the other instance.
    lock_a.close()
    assert b.acquire("topic_x") is not None


def test_expired_lease_is_broken(spark, tmp_path):
    state = str(tmp_path / "state")
    a = StorageLockManager(spark, state, ttl_s=-1)  # already expired
    b = StorageLockManager(spark, state)
    assert a.acquire("topic_x") is not None
    # TTL passed → the stale lease is broken and re-acquired (the Redis
    # server would have expired the key, :41-44).
    got = b.acquire("topic_x")
    assert got is not None
    # And now it is a LIVE lease: a third instance is refused.
    c = StorageLockManager(spark, state)
    assert c.acquire("topic_x") is None


@pytest.mark.skipif(not os.path.isdir(FIXTURES), reason="reference fixtures unavailable")
def test_job_skips_locked_topics(spark, tmp_path):
    """Two-session scenario: a concurrent engine holds one topic's lease;
    this engine processes the other topic and counts the skip."""
    cfg = RestructureConfig(
        target_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
        format="csv",
        lock_enable=True,
        worker=WorkerConfig(minimum_file_age_s=0),
        paths=PathConfig(layout="hive"),
    )
    os.makedirs(cfg.state_dir, exist_ok=True)
    other = StorageLockManager(spark, cfg.state_dir)
    held = other.acquire("application_server_status")
    assert held is not None

    result = run_avro_restructure_job(spark, FIXTURES, cfg, mode="python")
    assert result["topics_locked"] == 1
    assert "application_server_status" not in result["topics"]
    assert result["topics"]["android_phone_acceleration"]["records_written"] > 0

    # Lease released → the next iteration picks the skipped topic up.
    held.close()
    result2 = run_avro_restructure_job(spark, FIXTURES, cfg, mode="python")
    assert result2["topics_locked"] == 0
    assert result2["topics"]["application_server_status"]["records_written"] > 0
