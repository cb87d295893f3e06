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
