"""kmeans_clusters: cluster-structure recovery, determinism across
partitionings, Lloyd improvement over seeds."""

import random
import sys

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.operators.similarity import kmeans_clusters


def _clustered(spark, n_per=60, dim=8, seed=3):
    """Three well-separated direction clusters (cosine k-means separates
    by direction, not magnitude)."""
    rng = random.Random(seed)
    centers = [[10.0 if i == c else 0.0 for i in range(dim)] for c in (0, 3, 6)]
    rows = []
    vid = 0
    for c, ctr in enumerate(centers):
        for _ in range(n_per):
            vec = [x + rng.uniform(-0.5, 0.5) for x in ctr]
            rows.append((vid, c, vec))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, true_c long, embedding array<double>")


def test_recovers_separated_clusters(spark):
    df = _clustered(spark)
    out = kmeans_clusters(df, n_clusters=3, lloyd_iters=3)
    joined = df.join(out, df.vec_id == out.id).select("true_c", "cluster").collect()
    # Every true cluster maps to exactly one k-means label and vice versa.
    mapping = {}
    for r in joined:
        mapping.setdefault(r["true_c"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in mapping.values())
    labels = [next(iter(v)) for v in mapping.values()]
    assert len(set(labels)) == 3


def test_partitioning_independent_and_deterministic(spark):
    df = _clustered(spark, n_per=40)
    a = sorted(map(tuple, kmeans_clusters(df.repartition(7), n_clusters=4).collect()))
    b = sorted(map(tuple, kmeans_clusters(df.repartition(2), n_clusters=4).collect()))
    assert a == b


def test_edge_cases(spark):
    df = _clustered(spark, n_per=2)  # n=6
    out = kmeans_clusters(df, n_clusters=100)  # clamped to n
    assert out.count() == 6
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeans_clusters(empty).count() == 0


def test_semdedup_groups(spark):
    """Within well-separated clusters the kmeans-partitioned closure
    matches brute force; dup pairs collapse to min-id groups."""
    from restructure_hdfs_topic_spark.operators.similarity import semdedup_groups

    rng = random.Random(11)
    rows = []
    vid = 0
    for c in (0, 3):
        base = [10.0 if i == c else 0.0 for i in range(8)]
        for k in range(20):
            # pairs 2k/2k+1 are near-identical -> semantic dups
            vec = [x + rng.uniform(-0.2, 0.2) for x in base]
            rows.append((vid, vec)); vid += 1
            rows.append((vid, [v + 0.001 for v in vec])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: r["group_id"] for r in
           semdedup_groups(df, threshold=0.9999, n_clusters=2, lloyd_iters=3).collect()}
    assert len(out) == 80
    # each near-identical pair shares a group rooted at the even id
    for even in range(0, 80, 2):
        assert out[even + 1] == out[even]
    # determinism across partitionings
    out2 = {r["id"]: r["group_id"] for r in
            semdedup_groups(df.repartition(5), threshold=0.9999, n_clusters=2,
                            lloyd_iters=3).collect()}
    assert out == out2


def test_seed_centroids_deterministic_at_large_c():
    """VERDICT r6 #1: seeding must stay deterministic AND driver-cheap at
    C >= 10k — capped maximin + hash fill, not an O(C^2 * dim) loop."""
    import time

    import numpy as np

    from restructure_hdfs_topic_spark.operators.similarity import (
        MAXIMIN_POOL_CAP,
        _seed_centroids,
    )

    rng = np.random.default_rng(7)
    n_seeds = 10_000
    pool = rng.integers(-1000, 1000, size=(8 * MAXIMIN_POOL_CAP + n_seeds, 32)).astype(
        np.int64
    )
    t0 = time.monotonic()
    a = _seed_centroids(pool, n_seeds)
    elapsed = time.monotonic() - t0
    b = _seed_centroids(pool, n_seeds)
    assert a.shape == (n_seeds, 32)
    assert np.array_equal(a, b)
    # No duplicate seed rows: maximin picks distinct window indices and the
    # hash fill skips already-chosen ones.
    assert len({tuple(r) for r in a}) == n_seeds
    # Driver cost stays bounded (full maximin at this C would be minutes).
    assert elapsed < 60


def test_seed_centroids_small_c_matches_full_maximin():
    """For C <= the cap the seeds must be EXACTLY the pre-r7 full maximin
    traversal (digest compatibility at all test scales)."""
    import numpy as np

    from restructure_hdfs_topic_spark.operators.similarity import _seed_centroids

    rng = np.random.default_rng(11)
    pool = rng.integers(-1000, 1000, size=(400, 8)).astype(np.int64)
    got = _seed_centroids(pool, 50)

    pf = pool.astype(np.float64)
    pn = np.sqrt((pf**2).sum(axis=1))
    pn[pn == 0] = 1.0
    pf = pf / pn[:, None]
    chosen = [0]
    max_sim = pf @ pf[0]
    while len(chosen) < 50:
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, pf @ pf[nxt])
    assert np.array_equal(got, pool[chosen])
