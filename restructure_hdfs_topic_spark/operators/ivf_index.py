"""Persistable IVF index: build once, query across jobs.

``similarity.ivf_ann_topk`` trains its coarse quantizer per call (with an
in-process memo); a real similarity-search deployment trains ONCE and
serves many query batches from an on-disk index.  This module materializes
the IVF structure the way a warehouse-native vector index should be laid
out:

- ``<path>/assignments/`` — the corpus, quantized, **parquet-partitioned
  BY cluster** (``cluster=K/`` directories).  This IS the inverted file:
  a query batch probing ``nprobe`` clusters touches only those partitions
  — Spark's partition pruning (static or dynamic, via the equi-join on
  the partition column) skips every other file, so query cost scales with
  probed data, not corpus size.
- ``<path>/centroids/`` — the trained centroids (C rows of
  ``array<long>``; √n × dim ints, 16 MB at n=1e9/dim=64 — always
  collectable/broadcastable).
- ``<path>/_ivf_meta.json`` — dim / n / n_centroids / training params.

Training reuses the engine's exact-integer Lloyd machinery (associative
int64 partial sums ⇒ partitioning-independent centroids) and the
hash-selected order-independent seeding of ``ivf_ann_topk``; scoring
reuses ``_bucket_scorer`` (blocked int64 matmul per cluster group).

Lifecycle (r12/r13, mirroring the BM25 index — shared machinery in
``restructure_hdfs_topic_spark.generations``): ``append_to_ivf_index``
routes arrivals into the trained cells (FAISS add-after-train) as
replay-safe ``<path>/append-gNNNNN/`` generations (r13 — deterministic
names from the committed meta + atomic publish last, so a crashed
append's replay overwrites its own orphan instead of double-storing);
``delete_ivf_vectors`` tombstones ids generationally
(``<path>/tombstones/ts-gNNNNN/``, atomic meta publish) — serving
anti-joins them, so results equal an index of the survivors under the
same centroids (FAISS ``remove_ids``); ``vacuum_ivf_index`` purges
tombstoned rows physically AND folds append generations into a fresh
``base-gNNNNN/`` generation (assignments AND the IVFPQ code store move
together) with the no-metaless-window publish discipline of
``compact_bm25_index``.

READER CONTRACT (ADVICE r12): writers serialize on the ``ivf-mutate``
lease, but readers are lock-free — a reader that loaded a meta and
lazily executes its plan AFTER a vacuum/delete sweep may fail mid-query
on the swept superseded dirs.  Either re-serve promptly on failure, or
defer sweeping: pass ``sweep_superseded=False`` to
``vacuum_ivf_index``/``delete_ivf_vectors`` and run
``repair_ivf_index(min_age_s=...)`` periodically — it only sweeps once
the publish that superseded a dir is at least ``min_age_s`` old, giving
in-flight plans that long to drain.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators.similarity import (
    _calibrate_nprobe,
    _collect_lloyd_partials,
    _ivf_lloyd_partials,
    _quantize,
)


def _index_scorer(k: int):
    """applyInPandas kernel for INDEX queries: unlike the self-join ANN's
    ``_bucket_scorer`` (where every corpus member is also a query), only
    ``is_corpus=False`` rows are queries here — corpus members must not
    emit neighbor rows of their own (a corpus copy of a query id would
    otherwise double-emit pairs and corrupt the rank window).  A query
    that IS a corpus member still gets its self-pair excluded by id."""
    import pandas as pd

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        corpus_mask = pdf["is_corpus"].to_numpy()
        query_mask = ~corpus_mask
        if not corpus_mask.any() or not query_mask.any():
            return empty
        vecs = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        ids = pdf["id"].to_numpy()
        cvecs, c_ids = vecs[corpus_mask], ids[corpus_mask]
        qvecs, q_ids = vecs[query_mask], ids[query_mask]
        dots = qvecs @ cvecs.T
        qn = np.sqrt(np.einsum("ij,ij->i", qvecs, qvecs).astype(np.float64))
        cn = np.sqrt(np.einsum("ij,ij->i", cvecs, cvecs).astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / (qn[:, None] * cn[None, :])
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf
        nq, nc = sims.shape
        kk = min(k, nc)
        if kk <= 0:
            return empty
        if nc > kk:
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            top = np.broadcast_to(np.arange(nc), (nq, nc))
        vals = np.take_along_axis(sims, top, axis=1)
        keep = np.isfinite(vals).ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(q_ids, top.shape[1])[keep],
                "neighbor_id": c_ids[top.ravel()[keep]],
                "cosine": np.round(vals.ravel()[keep], 6),
            }
        )

    return score_bucket

_META = "_ivf_meta.json"

# Fixed artifact schemas (r13, guide §1/§6): every store this module
# writes has a schema pinned by its kernel contract, so readers pass it
# explicitly — parquet footer schema inference launched one driver job
# per read (visible as 'parquet at NativeMethodAccessorImpl' jobs, and
# real listing latency on object stores).  ``cluster`` is the partition
# column; naming it in the schema also pins its type to long (matching
# the kernels) instead of partition-value inference.
_ASSIGN_SCHEMA = "id long, vec array<long>, cluster long"
_CODES_SCHEMA = "id long, code binary, cluster long"
_CENTROID_SCHEMA = "cluster long, centroid array<long>"
_TOMB_SCHEMA = "id long"


def _load_centroids(spark: SparkSession, path: str):
    """Collect the bounded centroid table and order it DRIVER-SIDE
    (r13, guide §2.4): ``orderBy("cluster").collect()`` planned a global
    range sort — a range-partitioning sampling job plus a sort exchange
    — for a table bounded at ``n_centroids`` rows; a plain collect plus
    a Python sort returns the identical matrix with one job and zero
    exchanges."""
    import numpy as np

    cent_rows = spark.read.schema(_CENTROID_SCHEMA).parquet(
        f"{path}/centroids"
    ).collect()
    cent_rows.sort(key=lambda r: r["cluster"])
    return np.stack(
        [np.asarray(r["centroid"], dtype=np.int64) for r in cent_rows]
    )


def _check_integral_id(df: DataFrame, id_col: str) -> None:
    """The Arrow kernels declare ``id long`` in their output schemas (the
    contract shared with the whole ANN family); a non-integral id column
    would be silently coerced or rejected at the Arrow boundary — fail
    loudly at the API instead."""
    t = df.schema[id_col].dataType.simpleString()
    if t not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{id_col!r} must be an integral column for the IVF index "
            f"(got {t}); map string ids through xxhash64/zipWithIndex first"
        )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    lloyd_iters: int = 1,
    n_rows: int | None = None,
    lock: bool = True,
    meta_extra: dict | None = None,
) -> dict:
    """Train the coarse quantizer and materialize the inverted file at
    ``path``.  Returns the meta dict.  Deterministic end-to-end: seeds
    are the lowest-``xxhash64(id)`` vectors (order-independent), Lloyd
    refinement is exact int64, and the partitioned write is one
    ``partitionBy(cluster)`` repartition.  ``meta_extra`` merges extra
    keys into the published meta (the streaming sink's bootstrap stamps
    its ``last_batch_id`` this way, so the build and the exactly-once
    state commit together).

    Runs under the artifact's single-writer mutation lease (like every
    other mutator of this layout): a rebuild overwrites dirs and sweeps
    generations a concurrent delete/vacuum/append would be reading and
    publishing against."""
    from restructure_hdfs_topic_spark.locks import artifact_mutation_lease

    _check_integral_id(embeddings, id_col)
    lease = artifact_mutation_lease(
        embeddings.sparkSession, path, "ivf-mutate", lock=lock
    )
    try:
        return _build_ivf_index(
            embeddings,
            path,
            id_col,
            vec_col,
            n_centroids,
            lloyd_iters,
            n_rows,
            meta_extra,
        )
    finally:
        if lease is not None:
            lease.close()


def _build_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    n_centroids: int | None,
    lloyd_iters: int,
    n_rows: int | None,
    meta_extra: dict | None = None,
) -> dict:
    import math

    import numpy as np

    from restructure_hdfs_topic_spark.generations import invalidate_meta

    # Invalidate FIRST (the ADVICE-r10 discipline the BM25 build follows):
    # a build killed between the assignments overwrite and the meta write
    # must present as "no meta", never as the previous meta describing
    # half-written assignments.  The shared helper also removes the atomic
    # publisher's fallback copies (.old/.tmp) — a fallback reader
    # resurrecting .old would reopen exactly the window this closes.
    invalidate_meta(embeddings.sparkSession, f"{path}/{_META}")
    n = n_rows if n_rows is not None else embeddings.count()
    if n_centroids is None:
        n_centroids = max(2, min(65536, int(math.isqrt(n))))
    quant = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    )
    # Hash-threshold seed selection — same shape (and same seeds) as
    # ivf_ann_topk: prunes in the scan, no exchange, ordered fallback only
    # if the uniform hash under-delivers.
    hashed = quant.withColumn("h", F.xxhash64(F.col("id")))
    frac = min(1.0, (4.0 * n_centroids) / max(n, 1))
    cutoff = min((-(1 << 63)) + int((1 << 64) * frac), (1 << 63) - 1)
    rows = hashed.filter(F.col("h") < F.lit(cutoff)).select("h", "vec").collect()
    if len(rows) < min(n_centroids, n):
        rows = hashed.orderBy("h").limit(n_centroids).select("h", "vec").collect()
    rows.sort(key=lambda r: r["h"])
    centroids = np.stack(
        [np.asarray(r["vec"], dtype=np.int64) for r in rows[:n_centroids]]
    )

    from restructure_hdfs_topic_spark.caching import scoped_persist

    quant = scoped_persist(quant, scope="ivf_index.build.quant")
    for _ in range(lloyd_iters):
        agg = _collect_lloyd_partials(
            quant.mapInPandas(
                _ivf_lloyd_partials(centroids),
                schema="cluster long, pos long, s long, c long",
            )
        )
        new_cents = centroids.copy()
        for r in agg:
            new_cents[r["cluster"]] = np.asarray(r["s"], dtype=np.int64) // r["c"]
        centroids = new_cents

    members = quant.mapInPandas(
        _assign_nearest(centroids), schema="id long, vec array<long>, cluster long"
    )
    # ONE repartition on the partition column: each cluster's rows land in
    # one task, so the partitioned write emits one file per cluster dir
    # instead of |tasks| fragments.
    (
        members.repartition(F.col("cluster"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/assignments")
    )
    spark = embeddings.sparkSession
    cent_rows = [
        (int(i), [int(x) for x in c]) for i, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        cent_rows, "cluster long, centroid array<long>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    meta = {
        "format": "restructure_hdfs_topic_spark/ivf/v1",
        "dim": int(centroids.shape[1]),
        "n": int(n),
        "n_centroids": int(n_centroids),
        "lloyd_iters": int(lloyd_iters),
    }
    if meta_extra:
        meta.update(meta_extra)
    _write_meta(spark, f"{path}/{_META}", meta)
    # A rebuild resets to the root layout: sweep tombstones, vacuum
    # generations, and append generations a previous lifecycle left
    # (unreferenced by the fresh meta; a crash before this sweep leaves
    # harmless litter).
    from restructure_hdfs_topic_spark.generations import (
        sweep_generational_litter,
    )

    sweep_generational_litter(
        spark,
        path,
        _META,
        child_prefixes=("base-g", "append-g"),
        sweep_meta_litter=False,  # invalidate_meta already ran
    )
    return meta


def _assign_nearest(cents):
    """mapInPandas kernel: nearest-centroid label per corpus vector (one
    blocked affinity matmul per batch — the corpus half of
    ``_ivf_fused_assign`` without probe fan-out)."""
    import pandas as pd

    def assign(batches):
        import numpy as np

        cf = cents.astype(np.float64)
        cn = np.sqrt((cf**2).sum(axis=1))
        cn[cn == 0] = 1.0
        for pdf in batches:
            if not len(pdf):
                continue
            vv = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            vn = np.sqrt((vv.astype(np.float64) ** 2).sum(axis=1))
            vn[vn == 0] = 1.0
            sims = (vv @ cf.T) / (vn[:, None] * cn[None, :])
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "vec": pdf["vec"],
                    "cluster": np.argmax(sims, axis=1).astype("int64"),
                }
            )

    return assign


def _probe_assign(cents, nprobe: int):
    """mapInPandas kernel: each QUERY vector fans out to its ``nprobe``
    nearest clusters (all rows ``is_corpus=False`` — index queries are not
    corpus members, unlike the self-join ANN's fused kernel)."""
    import pandas as pd

    def assign(batches):
        import numpy as np

        cf = cents.astype(np.float64)
        cn = np.sqrt((cf**2).sum(axis=1))
        cn[cn == 0] = 1.0
        p = min(nprobe, len(cf))
        for pdf in batches:
            if not len(pdf):
                continue
            vv = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            vn = np.sqrt((vv.astype(np.float64) ** 2).sum(axis=1))
            vn[vn == 0] = 1.0
            sims = (vv @ cf.T) / (vn[:, None] * cn[None, :])
            if p < sims.shape[1]:
                top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            else:
                top = np.broadcast_to(
                    np.arange(sims.shape[1]), (len(vv), sims.shape[1])
                )
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), top.shape[1]),
                    "vec": pdf["vec"].iloc[
                        np.repeat(np.arange(len(pdf)), top.shape[1])
                    ].to_numpy(),
                    "cluster": top.ravel().astype("int64"),
                }
            )

    return assign


def append_to_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lock: bool = True,
    meta_extra: dict | None = None,
) -> dict:
    """Incremental corpus growth: assign NEW embeddings to the EXISTING
    centroids and append them to the inverted file (the standard IVF
    deployment shape — the coarse quantizer is retrained rarely, arrivals
    are routed into the trained cells; FAISS's ``add`` after ``train``).
    Returns the updated meta.

    CRASH-REPLAY IDEMPOTENT (r13, VERDICT r12 #1 — the BM25 segment
    discipline): each batch lands in its own ``<path>/append-gNNNNN/``
    generation dir whose name derives deterministically from the
    COMMITTED meta, written ``mode=overwrite`` and referenced by the meta
    only in the final atomic publish.  A crash between the data write and
    the publish leaves the previous meta valid (the orphan dir is
    unreferenced — ``repair_ivf_index`` sweeps it), and a REPLAY of the
    same batch re-derives the same name and overwrites its own orphan —
    no double-stored vectors, no ``n`` drift.  Serving unions the base
    with every referenced append generation (the BM25 segment-union
    shape); ``vacuum_ivf_index`` folds appends back into a single base.

    Ids currently TOMBSTONED by ``delete_ivf_vectors`` are rejected
    loudly (the serve-time anti-join would silently hide the new vector
    behind the tombstone) — vacuum first, or use fresh ids.  Appended
    ids must otherwise be NEW (the ``append_bm25_segment`` contract): an
    id repeated across generations would serve as two corpus vectors.
    Indexes carrying a PQ code store must append through
    ``append_to_ivfpq_index`` (this appender is rejected there — it
    would leave the new vectors codeless and invisible to the ADC scan).
    Cell quality degrades only if the new data's distribution drifts far
    from the training corpus, at which point rebuild.

    Scale shape: one Arrow assignment pass against broadcast centroids +
    one ``partitionBy(cluster)`` generation write.  ``meta_extra``
    merges extra keys into the same atomic publish (the streaming sink's
    ``last_batch_id`` rides here — state and data commit together).

    Runs under the artifact's single-writer mutation lease (VERDICT r11
    #2): generation names derive from the committed meta, so a second
    concurrent appender would collide — it fails loudly instead;
    ``lock=False`` opts out for externally-serialized callers."""
    from restructure_hdfs_topic_spark.locks import artifact_mutation_lease

    spark = embeddings.sparkSession
    _check_integral_id(embeddings, id_col)
    lease = artifact_mutation_lease(spark, path, "ivf-mutate", lock=lock)
    try:
        from restructure_hdfs_topic_spark.compression import small_file_exists

        if small_file_exists(f"{path}/_pq_meta.json", spark=spark):
            raise ValueError(
                "append_to_ivf_index: this index carries a PQ code store — "
                "append through append_to_ivfpq_index so the new vectors "
                "get codes (a codeless append would be invisible to the "
                "ADC scan)"
            )
        return _append_generation(
            embeddings, path, id_col, vec_col, books=None, meta_extra=meta_extra
        )
    finally:
        if lease is not None:
            lease.close()


def _append_generation(
    embeddings: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    books=None,
    meta_extra: dict | None = None,
) -> dict:
    """Shared replay-safe append core (IVF and IVFPQ): one assignment
    pass, one (or two, with ``books``) generation-dir writes, one atomic
    publish.  Caller holds the ``ivf-mutate`` lease.

    r13 single-pass shape (guide §1.4/§2.4): the batch count rides the
    generation WRITE as an ``Observation`` instead of a separate count
    action, and the tombstone-collision check and the PQ encode read the
    just-WRITTEN generation (bounded, columnar) instead of re-executing
    the upstream batch lineage — one pass over the arrivals total, no
    persist needed.  A reject after the data write leaves an
    unreferenced orphan dir (harmless: the publish never ran; a retry
    re-derives the same name and overwrites it, ``repair_ivf_index``
    sweeps it)."""
    from pyspark.sql import Observation

    spark = embeddings.sparkSession
    meta = load_ivf_meta(spark, path)
    centroids = _load_centroids(spark, path)

    quant = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    )
    members = quant.mapInPandas(
        _assign_nearest(centroids),
        schema="id long, vec array<long>, cluster long",
    )
    from restructure_hdfs_topic_spark.generations import next_gen

    gen, name = next_gen(meta, "append_gen", "append-g")
    obs = Observation()
    (
        members.observe(obs, F.count(F.lit(1)).alias("n"))
        .repartition(F.col("cluster"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cluster")
        .parquet(f"{path}/{name}/assignments")
    )
    # A provably-empty batch (e.g. limit(0)) is optimized to an empty
    # relation and the CollectMetrics node is pruned with it — the
    # observation never fires.  Check the WRITTEN dir listing FIRST and
    # only consult the observation when part files exist (ADVICE r13 #3:
    # ``Observation.get`` blocking semantics when metrics never fire are
    # version-sensitive — on a dirless write we never touch it).
    from restructure_hdfs_topic_spark.compression import fs_list_dir

    children = fs_list_dir(f"{path}/{name}/assignments", spark)
    has_data = any(c.startswith("cluster=") for c in children)
    if not has_data:
        n_batch = 0
    else:
        try:
            n_batch = int(obs.get["n"])
        except Exception:
            # Defensive residue: data exists but the metric is unreadable
            # (shouldn't happen — the write that produced the files also
            # fires the CollectMetrics node); count the durable rows.
            n_batch = int(
                spark.read.schema(_ASSIGN_SCHEMA)
                .parquet(f"{path}/{name}/assignments")
                .count()
            )
    if n_batch == 0:
        # An empty batch cannot change the index (and its generation dir
        # holds no parquet files — a fileless generation would fail
        # schema inference at read): drop the empty dir and commit only
        # the meta_extra keys, if any (the streaming sink's exactly-once
        # state must advance even on empty batches).
        from restructure_hdfs_topic_spark.compression import fs_delete_dir

        fs_delete_dir(f"{path}/{name}", spark)
        if meta_extra:
            meta.update(meta_extra)
            meta["version"] = int(meta.get("version", 0)) + 1
            _write_meta_atomic(spark, f"{path}/{_META}", meta)
        return meta
    # The durable generation, read back only when a consumer exists (the
    # tombstone-collision check or the PQ encode) — with neither, the
    # read's construction alone would cost a driver job for nothing.
    written = spark.read.schema(_ASSIGN_SCHEMA).parquet(
        f"{path}/{name}/assignments"
    )
    if meta.get("tomb_dir", ""):
        _reject_tombstoned_appends(spark, meta, path, written.select("id"))
    if books is not None:
        from restructure_hdfs_topic_spark.operators.pq import _make_encode_kernel

        (
            written.mapInPandas(
                _make_encode_kernel(books, passthrough=("cluster",)),
                schema="id long, code binary, cluster long",
            )
            .repartition(F.col("cluster"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("cluster")
            .parquet(f"{path}/{name}/codes")
        )
    meta["appends"] = list(meta.get("appends", [])) + [
        {"name": name, "n": n_batch}
    ]
    meta["append_gen"] = gen
    meta["n"] = int(meta["n"]) + n_batch
    meta["version"] = int(meta.get("version", 0)) + 1
    if meta_extra:
        meta.update(meta_extra)
    # THE publish: until this instant the new generation is unreferenced
    # litter and the previous meta serves the pre-append corpus.
    _write_meta_atomic(spark, f"{path}/{_META}", meta)
    return meta


def _ivf_data_dirs(meta: dict, path: str, kind: str) -> list[str]:
    """Every referenced dir holding ``kind`` rows (``assignments`` or
    ``codes``): the live base plus each referenced append generation, in
    append order — the BM25 segment-union shape.  A zero-row base (an
    all-deleted corpus vacuumed, then re-grown by appends) holds no
    parquet files, so it is excluded — reading it would fail schema
    inference and it cannot contribute rows anyway (the per-part row
    arithmetic: physical rows = ``n``; base rows = ``n`` minus the
    referenced appends' counts)."""
    appends = meta.get("appends", [])
    base_n = int(meta["n"]) - sum(int(a["n"]) for a in appends)
    dirs = [f"{_ivf_base_root(meta, path)}/{kind}"] if base_n > 0 else []
    return dirs + [f"{path}/{a['name']}/{kind}" for a in appends]


def _read_ivf_union(
    spark: SparkSession, meta: dict, path: str, kind: str
) -> DataFrame:
    """Union scan over the base + append generations of one store.  Each
    part keeps its parquet partition pruning (the ``cluster`` partition
    column survives the union, so an equi-join on cluster still prunes
    every part's directories)."""
    schema = _CODES_SCHEMA if kind == "codes" else _ASSIGN_SCHEMA
    out = None
    for d in _ivf_data_dirs(meta, path, kind):
        part = spark.read.schema(schema).parquet(d)
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame([], schema)
    return out


def load_ivf_meta(spark: SparkSession, path: str) -> dict:
    meta = _read_meta(spark, f"{path}/{_META}")
    if meta.get("format") != "restructure_hdfs_topic_spark/ivf/v1":
        raise ValueError(f"{path}: not an ivf/v1 index")
    return meta


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int | None = None,
    target_recall: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    calibration_sample: int = 512,
) -> DataFrame:
    """Top-k neighbors for a query batch against a stored index:
    ``(query_id, rank, neighbor_id, cosine)``.

    Plan shape: centroids collect (C×dim ints, bounded); queries fan out
    to their ``nprobe`` clusters in one Arrow pass; the assignments scan
    is equi-joined on the PARTITION column, so Spark prunes every
    un-probed ``cluster=K`` directory (dynamic partition pruning against
    the query side; at 1000-executor scale the probed fraction ≈
    nprobe/C of the corpus is all that is read); per-cluster scoring is
    the shared blocked-matmul kernel; global top-k is one window.  When
    ``nprobe`` is None it is calibrated against a hash-sample of the
    stored corpus — the same recall-targeted auto-tune as
    ``ivf_ann_topk``."""
    import numpy as np

    meta = load_ivf_meta(spark, path)
    if int(meta["n"]) - int(meta.get("n_deleted", 0)) <= 0:
        # Everything deleted (and possibly vacuumed — an all-deleted
        # vacuum's generation holds no parquet files, so reading it would
        # fail on schema inference; it also cannot hold a neighbor).
        return _empty_topk(spark)
    centroids = _load_centroids(spark, path)
    assignments = _read_ivf_union(spark, meta, path, "assignments")
    tomb = _ivf_tombstone_df(spark, meta, path)
    if tomb is not None:
        # Tombstoned vectors are dead everywhere downstream: the
        # calibration sample, the probed members, the scored top-k — the
        # index serves exactly the surviving corpus under the same
        # centroids (FAISS remove_ids semantics).
        assignments = assignments.join(tomb, "id", "left_anti")

    if nprobe is None:
        # Hash-threshold sample of the stored corpus — the seed-selection
        # shape from build: a bounded-fraction scan filter, NOT an
        # orderBy().limit() that would TakeOrdered the ENTIRE index on
        # every auto-calibrated query call.  Ordered fallback only if the
        # uniform hash under-delivers (P ≈ e^-sample, vanishing).
        n_idx = int(meta["n"]) - int(meta.get("n_deleted", 0))
        frac = min(1.0, (4.0 * calibration_sample) / max(n_idx, 1))
        cutoff = min((-(1 << 63)) + int((1 << 64) * frac), (1 << 63) - 1)
        hashed = assignments.withColumn("h", F.xxhash64(F.col("id")))
        sample = hashed.filter(F.col("h") < F.lit(cutoff)).select("h", "vec").collect()
        if len(sample) < min(calibration_sample, n_idx):
            sample = (
                hashed.orderBy("h").limit(calibration_sample)
                .select("h", "vec").collect()
            )
        sample.sort(key=lambda r: r["h"])
        sample_vecs = np.stack(
            [np.asarray(r["vec"], dtype=np.int64) for r in sample[:calibration_sample]]
        )
        nprobe = _calibrate_nprobe(sample_vecs, centroids, k, target_recall)
    nprobe = max(1, min(int(nprobe), meta["n_centroids"]))

    _check_integral_id(queries, id_col)
    from restructure_hdfs_topic_spark.caching import scoped_persist

    quant_q = queries.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("vec")
    )
    # Persisted: the probed-cluster collect below and the scorer union
    # both consume the probe fan-out (queries are the bounded side of
    # every index call, so the cache is small by contract).
    probes = scoped_persist(
        quant_q.mapInPandas(
            _probe_assign(centroids, nprobe),
            schema="id long, vec array<long>, cluster long",
        ).withColumn("is_corpus", F.lit(False)),
        scope="ivf_index.query.probes",
    )
    # STATIC partition pruning (r13): the probed cluster set collects
    # (bounded by min(|queries|·nprobe, n_centroids)) and becomes a
    # literal IN filter on the partition column — it reaches the
    # PartitionFilters of EVERY generation's parquet scan, including
    # through the base∪appends union, where Spark's dynamic partition
    # pruning does not fire (the BM25 index prunes its term buckets the
    # same way).  ``collect_set`` does the dedup in the map-side partial
    # aggregation, so one bounded set row reaches the driver instead of
    # a ``distinct()`` shuffle of the whole probe fan-out (guide §2.3).
    # The corpus side carries is_corpus=True for the scorer.
    probed_sets = probes.select("cluster").agg(
        F.collect_set("cluster").alias("cs")
    ).collect()
    corpus_side = _prune_clusters(
        assignments,
        sorted(int(c) for c in (probed_sets[0]["cs"] if probed_sets else [])),
        int(meta["n_centroids"]),
    ).select("cluster", "id", "vec").withColumn("is_corpus", F.lit(True))
    members = corpus_side.unionByName(
        probes.select("cluster", "id", "vec", "is_corpus")
    )
    scored = members.groupBy("cluster").applyInPandas(
        _index_scorer(k), schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        # A corpus vector lives in exactly one cluster, so (query,
        # neighbor) pairs are unique across groups — no dedup shuffle
        # (same argument as _ivf_score).
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def delete_ivf_vectors(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    lock: bool = True,
    sweep_superseded: bool = True,
) -> dict:
    """Delete vectors from the index WITHOUT a rebuild (FAISS
    ``remove_ids`` semantics; the same takedown lane
    ``delete_bm25_docs`` gives the text index): deleted ids land in a
    generational ``<path>/tombstones/ts-gNNNNN/`` dir (previous set ∪
    new hits) that the meta switches to in ONE atomic publish; serving
    anti-joins the probed members against it, so results equal an index
    holding only the survivors UNDER THE SAME CENTROIDS (the trained
    quantizer is corpus-level state a deletion does not retrain —
    exactly FAISS's contract; pinned in tests/test_ivf_delete.py).
    ``vacuum_ivf_index`` purges tombstoned rows physically.

    Stats discipline matches the BM25 lane: the candidate tombstone
    generation is written FIRST and ``n_deleted`` derives from the
    READ-BACK written set, so the published count can never disagree
    with the durable ids; a no-hit delete cleans up its empty-delta
    generation and returns the meta unchanged.  Runs under the
    artifact's single-writer mutation lease."""
    from restructure_hdfs_topic_spark.compression import fs_delete_dir
    from restructure_hdfs_topic_spark.locks import artifact_mutation_lease

    _check_integral_id(ids, id_col)
    lease = artifact_mutation_lease(spark, path, "ivf-mutate", lock=lock)
    try:
        meta = load_ivf_meta(spark, path)
        want = ids.select(F.col(id_col).alias("id")).distinct()
        live = _read_ivf_union(spark, meta, path, "assignments").select("id")
        tomb = _ivf_tombstone_df(spark, meta, path)
        if tomb is not None:
            live = live.join(tomb, "id", "left_anti")
        # Broadcast the delete batch so the corpus-sized live id scan
        # joins without an exchange — at index scale a sort-merge here
        # would shuffle every live id to hash partitions just to match a
        # small takedown set (guide §3.1).  ENFORCED bound (ADVICE r13
        # #2): "bounded by contract" is checked against Catalyst's size
        # estimate (driver-side, no job), and a takedown set too big to
        # broadcast falls back to the planner's choice instead of OOMing
        # the driver.
        from restructure_hdfs_topic_spark.generations import broadcast_if_bounded

        # The delta count rides the tombstone write as an Observation on
        # the hits subtree (r14, guide §1.4; hits ≡ written ∖ old, so the
        # observed rows ARE the newly-durable ids) — bounded-wait getter
        # with the read-back count as the fallback (ADVICE r13 #3).
        from pyspark.sql import Observation

        from restructure_hdfs_topic_spark.generations import (
            drop_tombstone_generation,
            observation_get_bounded,
            write_tombstone_generation,
        )

        del_obs = Observation()
        hits = live.join(broadcast_if_bounded(want), "id").observe(
            del_obs, F.count(F.lit(1)).alias("n")
        )
        new_tomb = hits if tomb is None else hits.unionByName(tomb)
        gen, name, written = write_tombstone_generation(
            spark, path, meta, new_tomb, "id", schema=_TOMB_SCHEMA
        )
        row = observation_get_bounded(del_obs)
        if row is None:
            newly = (
                written.join(tomb, "id", "left_anti")
                if tomb is not None
                else written
            )
            delta = int(newly.count())
        else:
            delta = int(row["n"] or 0)
        if delta == 0:
            drop_tombstone_generation(spark, path, meta, name)
            return meta
        old_name = meta.get("tomb_dir", "")
        meta["tomb_dir"], meta["tomb_gen"] = name, gen
        meta["n_deleted"] = int(meta.get("n_deleted", 0)) + delta
        meta["version"] = int(meta.get("version", 0)) + 1
        _write_meta_atomic(spark, f"{path}/{_META}", meta)
        if old_name and sweep_superseded:
            fs_delete_dir(f"{path}/tombstones/{old_name}", spark)
        return meta
    finally:
        if lease is not None:
            lease.close()


def vacuum_ivf_index(
    spark: SparkSession,
    path: str,
    lock: bool = True,
    sweep_superseded: bool = True,
    delete_ids: DataFrame | None = None,
    id_col: str = "vec_id",
) -> dict:
    """Physically purge tombstoned vectors AND fold append generations:
    rewrite ``assignments/`` (and the IVFPQ ``codes/`` store when
    present) — the union of the base and every append generation, minus
    the tombstone set — into a fresh ``base-gNNNNN/`` generation, switch
    the meta to it in ONE atomic publish, clear the tombstone and append
    state, then sweep the superseded dirs — the generational
    no-metaless-window discipline of ``compact_bm25_index`` (this is
    also the IVF family's compaction: run it when the append-generation
    count makes serve-time unions wide).  A crash before the publish
    leaves the pre-vacuum index serving (tombstone-filtered, still
    exact); after, the new generation is live with stale litter only.
    No-op without tombstones or appends (or a ``delete_ids`` batch).

    ``delete_ids`` (r14, VERDICT r13 #4) fuses a delete INTO the vacuum:
    the batch is subtracted in the same base rewrite instead of paying a
    tombstone-generation write + read-back count + its own meta publish
    first — one rewrite, ONE publish, for the common
    "take down, then compact" chain.  Crash-safety is the vacuum's own:
    before the publish the pre-vacuum index serves (the fused batch is
    simply not yet applied — delete+vacuum become atomic together);
    results afterwards equal ``delete_ivf_vectors`` followed by
    ``vacuum_ivf_index`` (equivalence pinned in tests/test_ivf_delete.py).
    The published ``n`` derives from an ``Observation`` riding the
    rewrite (guide §1.4), so it can never disagree with the durable rows."""
    from restructure_hdfs_topic_spark.compression import (
        fs_delete_dir,
        fs_list_dir,
        small_file_exists,
    )
    from restructure_hdfs_topic_spark.locks import artifact_mutation_lease

    lease = artifact_mutation_lease(spark, path, "ivf-mutate", lock=lock)
    try:
        meta = load_ivf_meta(spark, path)
        tomb = _ivf_tombstone_df(spark, meta, path)
        appends = list(meta.get("appends", []))
        if tomb is None and not appends and delete_ids is None:
            return meta  # nothing tombstoned, nothing to fold or delete
        extra = None
        if delete_ids is not None:
            from restructure_hdfs_topic_spark.generations import (
                broadcast_if_bounded,
            )

            _check_integral_id(delete_ids, id_col)
            extra = broadcast_if_bounded(
                delete_ids.select(F.col(id_col).alias("id")).distinct()
            )
        old_base = _ivf_base_root(meta, path)
        from pyspark.sql import Observation

        from restructure_hdfs_topic_spark.generations import next_gen

        gen, new_base = next_gen(meta, "base_gen", "base-g")
        kinds = ["assignments"]
        # The code store moves with the assignments: present when the
        # index carries a PQ meta (covers the fileless-base case where
        # only append generations hold codes) or a base codes/ dir.
        if small_file_exists(
            f"{path}/_pq_meta.json", spark=spark
        ) or small_file_exists(f"{old_base}/codes", spark=spark):
            kinds.append("codes")
        obs = Observation()

        def _rewrite(kind: str) -> None:
            spark.sparkContext.setJobDescription(f"ivf vacuum: {kind}")
            live = _read_ivf_union(spark, meta, path, kind)
            if tomb is not None:
                live = live.join(tomb, "id", "left_anti")
            if extra is not None:
                live = live.join(extra, "id", "left_anti")
            if kind == "assignments":
                live = live.observe(obs, F.count(F.lit(1)).alias("n"))
            (
                live.repartition(F.col("cluster"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("cluster")
                .parquet(f"{path}/{new_base}/{kind}")
            )

        # The per-kind rewrites (assignments, and codes on PQ-carrying
        # indexes) target disjoint dirs from independent plans — overlap
        # them (r14, guide §2.6).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(kinds)) as pool:
            for fut in [pool.submit(_rewrite, kind) for kind in kinds]:
                fut.result()
        # Survivor count from the rewrite itself: dir listing first (an
        # all-deleted corpus writes no part files and may prune the
        # metrics node — the append path's ADVICE r13 #3 discipline),
        # observation only when data exists.
        children = fs_list_dir(f"{path}/{new_base}/assignments", spark)
        if any(c.startswith("cluster=") for c in children):
            n_live = int(obs.get["n"])
        else:
            n_live = 0
        meta["base_gen"], meta["base_dir"] = gen, new_base
        meta["n"] = n_live
        meta["appends"] = []
        meta["tomb_dir"] = ""
        meta["n_deleted"] = 0
        meta["version"] = int(meta.get("version", 0)) + 1
        _write_meta_atomic(spark, f"{path}/{_META}", meta)
        # Post-publish sweep (crash here leaves stale litter only).  With
        # ``sweep_superseded=False`` the dirs stay for an age-gated
        # ``repair_ivf_index(min_age_s=...)`` pass — reader contract in
        # the module docstring.
        if sweep_superseded:
            for kind in kinds:
                fs_delete_dir(f"{old_base}/{kind}", spark)
            if old_base != path:
                fs_delete_dir(old_base, spark)
            for a in appends:
                fs_delete_dir(f"{path}/{a['name']}", spark)
            fs_delete_dir(f"{path}/tombstones", spark)
        return meta
    finally:
        if lease is not None:
            lease.close()


def repair_ivf_index(
    spark: SparkSession,
    path: str,
    lock: bool = True,
    min_age_s: float = 0.0,
) -> dict:
    """Janitor for crash litter (the ``repair_bm25_index`` analogue): a
    delete killed before its atomic publish leaves an orphan
    ``tombstones/ts-g*`` generation; a vacuum killed before its publish
    leaves an orphan ``base-g*`` generation — both unreferenced by the
    committed meta and safe to sweep under the single-writer lease.
    Raises when a REFERENCED dir is missing (damage beyond janitorial
    repair — rebuild from the corpus).  ``min_age_s`` defers the sweep
    while the committed meta is younger than that (reader grace — see
    the module docstring's reader contract); damage validation still
    runs.  Returns ``{"removed": [...]}.``"""
    from restructure_hdfs_topic_spark.compression import (
        fs_delete_dir,
        fs_list_dir,
        small_file_exists,
    )
    from restructure_hdfs_topic_spark.locks import artifact_mutation_lease

    lease = artifact_mutation_lease(spark, path, "ivf-mutate", lock=lock)
    try:
        meta = load_ivf_meta(spark, path)
        base_name = meta.get("base_dir", "")
        if not small_file_exists(
            f"{_ivf_base_root(meta, path)}/assignments", spark=spark
        ):
            raise RuntimeError(
                f"repair_ivf_index: meta references base "
                f"{base_name or '<root>'} whose assignments are missing — "
                "the index is damaged; rebuild from the corpus"
            )
        tomb_name = meta.get("tomb_dir", "")
        tombs_on_disk = set(fs_list_dir(f"{path}/tombstones", spark))
        if tomb_name and tomb_name not in tombs_on_disk:
            raise RuntimeError(
                f"repair_ivf_index: meta references tombstone dir "
                f"{tomb_name} missing on disk — the index is damaged; "
                "rebuild from the corpus"
            )
        append_names = [a["name"] for a in meta.get("appends", [])]
        missing_appends = [
            a
            for a in append_names
            if not small_file_exists(f"{path}/{a}/assignments", spark=spark)
        ]
        if missing_appends:
            raise RuntimeError(
                f"repair_ivf_index: meta references append generations "
                f"missing on disk: {missing_appends} — the index is "
                "damaged; rebuild from the corpus"
            )
        from restructure_hdfs_topic_spark.generations import (
            age_gate_deferred,
            sweep_generational_litter,
        )

        if age_gate_deferred(spark, f"{path}/{_META}", min_age_s):
            return {"removed": [], "deferred": True}
        keep = set(append_names)
        if base_name:
            keep.add(base_name)
        removed = sweep_generational_litter(
            spark,
            path,
            _META,
            keep_children=keep,
            child_prefixes=("base-g", "append-g"),
            tomb_dir=tomb_name,
            legacy_kinds=("assignments", "codes") if base_name else (),
        )
        return {"removed": removed}
    finally:
        if lease is not None:
            lease.close()


def _prune_clusters(
    df: DataFrame, probed: list[int], n_centroids: int
) -> DataFrame:
    """Literal ``cluster IN (...)`` partition pruning over a (possibly
    unioned) cluster-partitioned store; skipped when every cluster is
    probed (an IN list the size of the centroid table filters nothing)."""
    if len(probed) >= n_centroids:
        return df
    return df.filter(F.col("cluster").isin(probed))


def _empty_topk(spark: SparkSession) -> DataFrame:
    """Empty frame with the serve schema — the all-deleted index case."""
    return spark.createDataFrame(
        [], "query_id long, rank bigint, neighbor_id long, cosine double"
    )


def _ivf_base_root(meta: dict, path: str) -> str:
    """Directory holding assignments/ (and codes/): ``path`` for the
    build layout, ``path/base-gNNNNN`` after a vacuum generation."""
    base = meta.get("base_dir", "")
    return f"{path}/{base}" if base else path


def _ivf_tombstone_df(spark: SparkSession, meta: dict, path: str):
    """The committed tombstone id set (one ``id`` column), or None."""
    tomb = meta.get("tomb_dir", "")
    if not tomb:
        return None
    return spark.read.schema(_TOMB_SCHEMA).parquet(
        f"{path}/tombstones/{tomb}"
    ).select("id")


def _reject_tombstoned_appends(
    spark: SparkSession, meta: dict, path: str, batch_ids: DataFrame
) -> None:
    """An id re-appended while still tombstoned would be silently
    invisible at serve time (the anti-join matches the OLD and the NEW
    row) and would corrupt the vacuum's ``n`` accounting — fail loudly
    instead.  Recovery: ``vacuum_ivf_index`` first (purging the
    tombstone physically frees the id), or use fresh ids.  Cost: one
    batch × tombstone semi-join, only when deletions exist."""
    tomb = _ivf_tombstone_df(spark, meta, path)
    if tomb is None:
        return
    n = batch_ids.join(tomb, "id", "left_semi").count()
    if n:
        raise ValueError(
            f"append: {n} id(s) in this batch are currently tombstoned — "
            "serving would silently hide the new vectors behind the "
            "tombstone.  Run vacuum_ivf_index first (physical purge frees "
            "the ids) or append under fresh ids."
        )


def ivf_meta_exists(spark: SparkSession, path: str) -> bool:
    """Whether the index at ``path`` has a (possibly fallback-``.old``)
    published meta — the explicit existence check the streaming sink's
    bootstrap decision needs (the ``bm25_meta_exists`` twin)."""
    from restructure_hdfs_topic_spark.generations import meta_exists

    return meta_exists(spark, f"{path}/{_META}")


def ivf_artifacts_exist(spark: SparkSession, path: str) -> bool:
    """Whether any index DATA directories exist at ``path`` (assignments,
    centroids, tombstones, or a generational ``base-g*``/``append-g*``)
    — artifacts-without-meta means an interrupted build or external
    damage, never a safe bootstrap target (the ``bm25_artifacts_exist``
    twin)."""
    from restructure_hdfs_topic_spark.compression import (
        fs_list_dir,
        small_file_exists,
    )

    if any(
        small_file_exists(f"{path}/{d}", spark=spark)
        for d in ("assignments", "centroids", "tombstones")
    ):
        return True
    return any(
        c.startswith(("base-g", "append-g")) for c in fs_list_dir(path, spark)
    )


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    from restructure_hdfs_topic_spark.compression import write_small_file

    write_small_file(path, json.dumps(meta).encode("utf-8"), spark=spark)


def _write_meta_atomic(spark: SparkSession, path: str, meta: dict) -> None:
    from restructure_hdfs_topic_spark.compression import write_small_file_atomic

    write_small_file_atomic(path, json.dumps(meta).encode("utf-8"), spark=spark)


def _read_meta(spark: SparkSession, path: str) -> dict:
    # Fallback-aware: the atomic publish's object-store fallback can
    # leave the previous version at <path>.old for one instant.
    from restructure_hdfs_topic_spark.compression import read_small_file_fallback

    return json.loads(read_small_file_fallback(path, spark=spark).decode("utf-8"))
