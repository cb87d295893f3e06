"""scoped_persist: one live cache generation per scope, warm-run reuse."""

import pytest

from restructure_hdfs_topic_spark.caching import _LIVE, release_scope, scoped_persist


@pytest.fixture(autouse=True)
def _clean_scope():
    yield
    release_scope("t.scope")
    release_scope("t.other")


def test_same_plan_reuses_cached_handle(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    h1 = scoped_persist(df, "t.scope")
    h1.count()  # populate
    assert h1.storageLevel.useMemory
    h2 = scoped_persist(spark.range(10).selectExpr("id", "id * 2 AS v"), "t.scope")
    # Semantically identical plan → the SAME still-cached handle comes back.
    assert h2 is h1
    assert h2.storageLevel.useMemory


def test_new_plan_releases_prior_generation(spark):
    h1 = scoped_persist(spark.range(10), "t.scope")
    h1.count()
    h2 = scoped_persist(spark.range(20), "t.scope")
    h2.count()
    # Prior generation released (CacheManager would otherwise hold it forever).
    assert not h1.storageLevel.useMemory
    assert h2.storageLevel.useMemory
    assert _LIVE["t.scope"] is h2


def test_scopes_are_independent(spark):
    h1 = scoped_persist(spark.range(10), "t.scope")
    h2 = scoped_persist(spark.range(20), "t.other")
    h1.count(), h2.count()
    assert h1.storageLevel.useMemory and h2.storageLevel.useMemory


def test_release_scope(spark):
    h = scoped_persist(spark.range(10), "t.scope")
    h.count()
    release_scope("t.scope")
    assert not h.storageLevel.useMemory
    assert "t.scope" not in _LIVE


def test_clearcache_invalidates_reuse(spark):
    df = spark.range(30).selectExpr("id", "id + 1 AS v")
    h1 = scoped_persist(df, "t.scope")
    h1.count()
    spark.catalog.clearCache()
    h2 = scoped_persist(spark.range(30).selectExpr("id", "id + 1 AS v"), "t.scope")
    # The externally-uncached old handle must NOT be returned as-is.
    h2.count()
    assert h2.storageLevel.useMemory
