"""Offset accounting: interval merge, seen filters, per-record offsets
(SURVEY O4/O5/O12/O16/O17/O18).

Reference semantics:
- O16 (accounting/OffsetIntervals.kt:46-199): per (topic, partition) keep a
  sorted disjoint set of [from, to] offset intervals; adding a range merges
  adjacent/overlapping intervals; ``lastProcessed`` (source-file mtime) is
  max-merged so re-uploaded files reprocess.
- O4 (worker/RadarKafkaRestructure.kt:118-122): skip source files whose full
  offset range is already contained in the committed set.
- O5 (worker/RestructureWorker.kt:126-140): skip individual records whose
  (topicPartition, offset, mtime) is committed.
- O12 (worker/RestructureWorker.kt:116-131): offset = file.offset_from +
  record index within the file.
- O17/O18: state persisted only after data is durably written
  (commit-after-store, worker/FileCache.kt:128-158).

Spark-first: the interval set is a DataFrame ``(topic, partition,
offset_from, offset_to, last_processed)``; merge is the classic
gaps-and-islands window aggregation (one shuffle on (topic, partition));
seen filters are range anti-joins that Catalyst broadcasts when the state
side is small (it always is: intervals per partition stay tiny because
merging collapses contiguous ranges).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STATE_SCHEMA = "topic string, partition int, offset_from long, offset_to long, last_processed timestamp"


def merge_offset_intervals(ranges: DataFrame) -> DataFrame:
    """O16 gaps-and-islands: merge overlapping/ADJACENT [from, to] intervals
    per (topic, partition); ``last_processed`` = max over merged members.

    Adjacency means ``next.from <= prev.to + 1`` (OffsetIntervals.kt:84-101:
    stream offsets are integers, so [0,2]+[3,4] merges).

    Input/output schema: (topic, partition, offset_from, offset_to[, last_processed]).
    """
    has_mtime = "last_processed" in ranges.columns
    w = Window.partitionBy("topic", "partition").orderBy("offset_from", "offset_to")
    # Island boundary: current interval starts after (running max of `to`) + 1.
    running_max_to = F.max("offset_to").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ranges.withColumn(
        "__new_island",
        F.when(
            running_max_to.isNull() | (F.col("offset_from") > running_max_to + 1), 1
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new_island").over(w))
    aggs = [
        F.min("offset_from").alias("offset_from"),
        F.max("offset_to").alias("offset_to"),
    ]
    if has_mtime:
        aggs.append(F.max("last_processed").alias("last_processed"))
    return (
        flagged.groupBy("topic", "partition", "__island")
        .agg(*aggs)
        .drop("__island")
    )


# Sentinel for "interval has no last_processed": far enough in the past
# that every real mtime compares newer, so the record reprocesses (unknown
# commit time must never suppress work — OffsetIntervals.kt treats a missing
# lastProcessed as "assume modified").
_MTIME_UNKNOWN_US = -(2**62)


def _covering_interval(probes: DataFrame, state: DataFrame, pos_col: str) -> DataFrame:
    """Annotate each probe row with the committed interval containing its
    position — with the engine invariant that committed intervals are
    DISJOINT per (topic, partition) (``merge_offset_intervals`` runs at
    every commit), at most one interval can contain any offset.

    Shape: the interval set is metadata-scale BY CONTRACT — the reference
    holds the entire committed ``OffsetRangeSet`` in heap memory
    (accounting/OffsetIntervals.kt keeps every interval of every partition
    in an in-memory list), and merging collapses contiguous ranges, so we
    collect it once and broadcast a per-(topic, partition) sorted-array
    index inside a vectorized Arrow-batched scalar pandas UDF:
    ``np.searchsorted`` per batch, O(log intervals) per probe, ZERO shuffle
    and no sort of the probe side.  Only the three key columns cross Arrow;
    the payload stays JVM-side.  Probe partitioning is untouched, so the
    lookup is embarrassingly parallel at any record count — this replaces
    the r4 carry-forward window, whose per-(topic, partition) total sort
    put a whole Kafka partition's records in one task (VERDICT r4 #4); the
    r3 broadcast-join-with-range-post-filter before it degenerated to a
    nested loop (152 s for 1M records × 70k intervals at sf1).

    All covering-interval fields come from the SAME interval row (the r4
    window carried ``last_processed`` independently with
    ``last(ignorenulls=True)``, which could pair a covering range with an
    EARLIER interval's mtime).  A NULL ``last_processed`` is returned as
    ``_MTIME_UNKNOWN_US`` so the mtime test fails and the row reprocesses.

    Returns the probe rows (original columns) plus ``__c_from``/``__c_to``
    (null when no interval covers the position) and, when state carries it,
    ``__c_mtime_us`` (unix micros).
    """
    import numpy as np
    import pandas as pd

    has_mtime = "last_processed" in state.columns
    sel = [
        F.col("topic"),
        F.col("partition").cast("long").alias("partition"),
        F.col("offset_from").cast("long").alias("offset_from"),
        F.col("offset_to").cast("long").alias("offset_to"),
    ]
    if has_mtime:
        sel.append(F.unix_micros("last_processed").alias("mt_us"))
    by_part: dict[tuple, list[tuple]] = {}
    for r in state.select(*sel).collect():
        by_part.setdefault((r[0], r[1]), []).append(
            (r[2], r[3], (r[4] if has_mtime else None))
        )
    index: dict[tuple, tuple] = {}
    for key, ivs in by_part.items():
        ivs.sort()
        index[key] = (
            np.array([v[0] for v in ivs], dtype=np.int64),
            np.array([v[1] for v in ivs], dtype=np.int64),
            np.array(
                [(_MTIME_UNKNOWN_US if v[2] is None else v[2]) for v in ivs],
                dtype=np.int64,
            ),
        )

    fields = "f long, t long" + (", m long" if has_mtime else "")

    # Ship the index as a SparkContext broadcast, not inside the UDF
    # closure: the closure is pickled per Python worker, so at an extreme
    # interval count every worker would hold a private copy — the broadcast
    # is fetched once per executor and shared (the handle itself is tiny).
    bc_index = probes.sparkSession.sparkContext.broadcast(index)

    @F.pandas_udf(f"struct<{fields}>")
    def lookup(topic, partition, pos):
        index = bc_index.value
        n = len(pos)
        out_f = np.full(n, np.nan)
        out_t = np.full(n, np.nan)
        out_m = np.full(n, np.nan)
        if index:
            batch = pd.DataFrame(
                {"t": topic.reset_index(drop=True),
                 "p": partition.reset_index(drop=True),
                 "pos": pos.reset_index(drop=True)}
            )
            for (tp, pt), sub in batch.dropna().groupby(["t", "p"], sort=False):
                arrs = index.get((tp, int(pt)))
                if arrs is None:
                    continue
                froms, tos, mts = arrs
                posv = sub["pos"].to_numpy(dtype=np.int64)
                ix = np.searchsorted(froms, posv, side="right") - 1
                covered = (ix >= 0) & (posv <= tos[np.maximum(ix, 0)])
                hit = sub.index.to_numpy()[covered]
                ixh = ix[covered]
                out_f[hit] = froms[ixh]
                out_t[hit] = tos[ixh]
                out_m[hit] = mts[ixh]
        cols = {"f": pd.array(out_f, dtype="Int64"), "t": pd.array(out_t, dtype="Int64")}
        if has_mtime:
            cols["m"] = pd.array(out_m, dtype="Int64")
        return pd.DataFrame(cols)

    annotated = probes.withColumn(
        "__c",
        lookup(
            F.col("topic"),
            F.col("partition").cast("long"),
            F.col(pos_col).cast("long"),
        ),
    )
    return annotated.select(
        *probes.columns,
        F.col("__c.f").alias("__c_from"),
        F.col("__c.t").alias("__c_to"),
        *([F.col("__c.m").alias("__c_mtime_us")] if has_mtime else []),
    )


def filter_unseen_files(manifest: DataFrame, state: DataFrame) -> DataFrame:
    """O4: drop manifest files whose [offset_from, offset_to] is fully
    contained in a committed interval with last_processed >= file mtime.

    ``manifest``: (topic, partition, offset_from, offset_to, mtime, ...).
    Broadcast interval-containment lookup (``_covering_interval``) — zero
    shuffle, no per-interval probing.  A NULL mtime comparison (unknown
    file mtime or uncommitted last_processed) means REPROCESS, never skip.
    """
    has_mtime = "last_processed" in state.columns and "mtime" in manifest.columns
    annotated = _covering_interval(manifest, state, "offset_from")
    seen = (
        F.col("__c_from").isNotNull()
        & (F.col("offset_to") <= F.col("__c_to"))
    )
    if has_mtime:
        seen = seen & F.coalesce(
            F.unix_micros(F.col("mtime")) <= F.col("__c_mtime_us"), F.lit(False)
        )
    return annotated.filter(~seen).select(*manifest.columns)


def filter_unseen_records(records: DataFrame, state: DataFrame) -> DataFrame:
    """O5: per-record exactly-once filter — drop records whose
    (topic, partition, offset) lies inside a committed interval (and whose
    mtime is not newer than the interval's last_processed).

    ``records`` needs (topic, partition, offset[, mtime]) columns.
    Broadcast interval-containment lookup (``_covering_interval``) — zero
    shuffle, no per-interval probing.  A NULL mtime comparison (unknown
    record mtime or uncommitted last_processed) means REPROCESS, never skip.
    """
    has_mtime = "last_processed" in state.columns and "mtime" in records.columns
    annotated = _covering_interval(records, state, "offset")
    seen = F.col("__c_from").isNotNull() & (F.col("offset") <= F.col("__c_to"))
    if has_mtime:
        seen = seen & F.coalesce(
            F.unix_micros(F.col("mtime")) <= F.col("__c_mtime_us"), F.lit(False)
        )
    return annotated.filter(~seen).select(*records.columns)


def assign_record_offsets(
    records: DataFrame,
    file_col: str = "filename",
    from_col: str = "offset_from",
    order_col: str = "__record_index",
) -> DataFrame:
    """O12: offset = offset_from + (0-based record index within the file).

    File order in the reference is Avro container order; here the caller
    supplies a deterministic ``order_col`` (e.g. monotonically increasing id
    captured at read, or a natural record key).
    """
    w = Window.partitionBy(file_col).orderBy(order_col)
    return records.withColumn(
        "offset", F.col(from_col) + F.row_number().over(w) - 1
    )


_POINTER = "offsets.CURRENT"


def _hfs(spark: SparkSession, dir_path: str):
    """(jvm, FileSystem, Path-for-dir) via the Hadoop FS API, so the state
    protocol works on whatever store ``state_dir`` names (file://, hdfs://,
    s3a://, abfss://) — same pattern as the schema sidecar writer."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _current_version(state_dir: str, spark: SparkSession | None = None) -> int | None:
    if spark is None or "://" not in state_dir:
        pointer = os.path.join(state_dir, _POINTER)
        if os.path.exists(pointer):
            with open(pointer) as fh:
                return int(fh.read().strip().lstrip("v"))
        # Same pointer-loss recovery as the remote branch (os.replace is
        # atomic, but a deleted/corrupted pointer must not read as empty).
        root = os.path.join(state_dir, "offsets")
        best = None
        if os.path.isdir(root):
            for name in os.listdir(root):
                if name.startswith("v") and name[1:].isdigit():
                    if os.path.exists(os.path.join(root, name, "_SUCCESS")):
                        v = int(name[1:])
                        if best is None or v > best:
                            best = v
        return best
    jvm, fs, _ = _hfs(spark, state_dir)
    pointer = jvm.org.apache.hadoop.fs.Path(state_dir, _POINTER)
    if not fs.exists(pointer):
        return _recover_version(jvm, fs, state_dir)
    stream = fs.open(pointer)
    try:
        data = bytes(stream.readAllBytes()).decode()
    finally:
        stream.close()
    return int(data.strip().lstrip("v"))


def _recover_version(jvm, fs, state_dir: str) -> int | None:
    """Pointer-loss recovery: a missing ``offsets.CURRENT`` must NOT read as
    empty state (that would reprocess every committed file and emit
    duplicates).  Committed versions are immutable directories, so the
    highest fully-written ``offsets/v*`` (``_SUCCESS`` present) IS the last
    commit — commit_offsets only runs after the data write succeeded, so
    adopting it is always safe."""
    root = jvm.org.apache.hadoop.fs.Path(state_dir, "offsets")
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        ok = fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS"))
        if ok and (best is None or v > best):
            best = v
    return best


def commit_offsets(
    spark: SparkSession,
    state_dir: str,
    new_ranges: DataFrame,
) -> DataFrame:
    """O17/O18: merge new ranges into persisted state and commit atomically.

    Versioned-state commit protocol (the Spark-native analogue of the
    reference's atomic move, target/LocalTargetStorage.kt:60-72):
    1. write the merged interval set to a NEW directory ``offsets/v{N+1}``;
    2. atomically swap the ``offsets.CURRENT`` pointer file (tempfile +
       rename — atomic on POSIX; on S3 a pointer-object PUT is atomic);
    3. prune versions older than N (N itself survives one commit so lazy
       DataFrames still referencing it keep resolving — crash mid-commit
       never loses state, the pointer flips or it doesn't).

    MUST be called only after the data write action has succeeded
    (commit-after-store ordering, worker/FileCache.kt:128-158).
    """
    import random
    import time as _time

    for attempt in range(64):
        # True compare-and-swap: resolve the current version EXACTLY once,
        # read the merge snapshot from that same version, and claim cur+1.
        # (Reading via read_offsets and re-resolving the pointer for nxt
        # opened a TOCTOU: a concurrent committer flipping the pointer
        # between the two resolves let this committer claim the now-free
        # higher version with a merge built on the STALE snapshot, erasing
        # the peer's intervals.)  A concurrent pointer bump now makes the
        # claim of cur+1 fail, forcing the re-read/retry path.
        cur = _current_version(state_dir, spark)
        existing = _read_state_at(spark, state_dir, cur)
        merged = merge_offset_intervals(
            existing.unionByName(new_ranges, allowMissingColumns=True)
        )
        nxt = (cur or 0) + 1
        token = _claim_version(spark, state_dir, nxt)
        if not token:
            # Another committer (a second engine instance on a different
            # topic) claimed this version: RE-READ so its freshly committed
            # intervals are included in our merge, then contend again —
            # without the claim both would write the SAME version directory
            # concurrently and the pointer swap would silently drop one
            # merge.  A claim whose owner crashed is broken after a TTL so
            # commits cannot deadlock on it.
            _break_stale_claim(spark, state_dir, nxt)
            if _claim_exists(spark, state_dir, nxt):
                # A LIVE peer holds this claim: its commit includes a
                # parquet write that can take seconds, while our retry
                # iteration is fast driver-side work — back off with
                # jitter so the 64-attempt budget spans at least one full
                # peer-commit duration instead of exhausting spuriously.
                _time.sleep(
                    min(2.0, 0.05 * (attempt + 1)) * (0.5 + random.random())
                )
            continue
        try:
            return _replace_at(spark, state_dir, merged, nxt, token)
        except ClaimLost:
            # Our claim was TTL-broken while we were writing (stall) — the
            # peer's commit is durable; retry against the fresh snapshot.
            continue
    raise RuntimeError(f"commit_offsets: version contention in {state_dir}")


class ClaimLost(RuntimeError):
    """The committer's version claim was broken (TTL-expired and taken
    over by a peer) between claiming and committing — the commit must be
    retried against a fresh snapshot."""


def _claim_version(spark: SparkSession, state_dir: str, nxt: int) -> str | None:
    """Atomically claim version ``nxt`` via create-NX of a claim marker —
    the serialization point that keeps two concurrent committers out of one
    version directory.  The marker carries an OWNER TOKEN which
    ``_replace_at`` re-verifies before making the claimed version visible:
    a committer stalled past the claim TTL whose claim was broken and
    re-claimed by a peer fails that check instead of silently overwriting
    the peer's committed state.  Returns the token, or None if the claim
    is already held.  Claim files are pruned with their versions."""
    import uuid as _uuid

    token = _uuid.uuid4().hex
    if "://" not in state_dir:
        root = os.path.join(state_dir, "offsets")
        os.makedirs(root, exist_ok=True)
        try:
            with open(os.path.join(root, f".claim.v{nxt:08d}"), "x") as fh:
                fh.write(token)
                return token
        except FileExistsError:
            return None
    jvm, fs, _ = _hfs(spark, state_dir)
    path = jvm.org.apache.hadoop.fs.Path(
        state_dir, f"offsets/.claim.v{nxt:08d}"
    )
    created = False
    try:
        stream = fs.create(path, False)
        created = True
        try:
            stream.write(bytearray(token, "utf-8"))
        finally:
            stream.close()
        return token
    except Exception:
        if created:
            # The create-NX itself succeeded; a failure writing/closing
            # would otherwise leave an ORPHANED, token-less claim that
            # stalls every committer on this version for a full claim TTL
            # (and reads as owner '').  Best-effort removal keeps the
            # failure local to this committer.
            try:
                fs.delete(path, False)
            except Exception:
                pass
        return None


def _claim_owner(spark: SparkSession, state_dir: str, nxt: int) -> str | None:
    """Owner token currently recorded in the claim marker (None if the
    marker is missing or unreadable)."""
    name = f"offsets/.claim.v{nxt:08d}"
    if "://" not in state_dir:
        try:
            with open(os.path.join(state_dir, name)) as fh:
                return fh.read().strip()
        except OSError:
            return None
    jvm, fs, _ = _hfs(spark, state_dir)
    path = jvm.org.apache.hadoop.fs.Path(state_dir, name)
    try:
        stream = fs.open(path)
        try:
            return bytes(stream.readAllBytes()).decode().strip()
        finally:
            stream.close()
    except Exception:
        return None


def _claim_exists(spark: SparkSession, state_dir: str, nxt: int) -> bool:
    """True if the claim marker for version ``nxt`` is still present (used
    after a break attempt to distinguish a live peer from a broken claim)."""
    name = f"offsets/.claim.v{nxt:08d}"
    if "://" not in state_dir:
        return os.path.exists(os.path.join(state_dir, name))
    jvm, fs, _ = _hfs(spark, state_dir)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(state_dir, name))


def replace_offsets(spark: SparkSession, state_dir: str, state: DataFrame) -> DataFrame:
    """Atomically swap the committed state to ``state`` (steps 1-3 above).
    Used by commit (merge) and by the cleaner's rollback (remove).  The
    version claim serializes the physical write; content-level conflicts
    with a concurrent commit are the caller's to minimize (the cleaner
    re-reads current state right before computing its rollback)."""
    import random
    import time as _time

    for attempt in range(64):
        nxt = (_current_version(state_dir, spark) or 0) + 1
        token = _claim_version(spark, state_dir, nxt)
        if token:
            try:
                return _replace_at(spark, state_dir, state, nxt, token)
            except ClaimLost:
                continue
        _break_stale_claim(spark, state_dir, nxt)
        if _claim_exists(spark, state_dir, nxt):
            _time.sleep(min(2.0, 0.05 * (attempt + 1)) * (0.5 + random.random()))
    raise RuntimeError(f"replace_offsets: version contention in {state_dir}")


CLAIM_TTL_S = 600.0


def _break_stale_claim(
    spark: SparkSession, state_dir: str, nxt: int, ttl_s: float = CLAIM_TTL_S
) -> None:
    """Recover from a committer that claimed version ``nxt`` and died.

    A claim older than ``ttl_s`` whose version never became CURRENT is
    broken by TOMBSTONE-RENAME (exactly one breaker's rename succeeds — a
    delete+recreate pair would let two breakers re-create the two-writer
    race the claim exists to prevent).  An orphaned ``v{nxt}`` directory,
    if any, is ADOPTED, never deleted: under the staging protocol the
    version directory only comes into existence via an atomic rename of a
    fully-written parquet dir, so its presence means the stalled
    committer's data write IS durable and only the pointer swap is
    missing — commit-after-store ordering makes completing that swap
    always safe (the same argument as ``_recover_version``).  The pre-r7
    delete here destroyed committed data when the breaker fired inside a
    >TTL-stalled peer's window between its staging rename and its pointer
    write, leaving the peer's subsequent CURRENT write dangling.  Adoption
    is also what unblocks successors: they would otherwise livelock on
    rename-refused ``ClaimLost`` retries against the orphan.  A
    >TTL-stalled committer that later wakes loses its claim, mirroring the
    lease semantics of ``locks.py``."""
    import time as _time
    import uuid as _uuid

    name = f".claim.v{nxt:08d}"
    if "://" not in state_dir:
        path = os.path.join(state_dir, "offsets", name)
        try:
            age = _time.time() - os.path.getmtime(path)
        except OSError:
            return
        if age < ttl_s or (_current_version(state_dir) or 0) >= nxt:
            return
        tomb = f"{path}.broken.{_uuid.uuid4().hex}"
        try:
            os.rename(path, tomb)
        except OSError:
            return  # another breaker won
        try:
            # Rename preserves mtime: re-check on the tombstone so a claim
            # that was broken-and-recreated FRESH between our stat and
            # rename is restored rather than destroyed (the re-claimer may
            # be mid-commit).
            if _time.time() - os.path.getmtime(tomb) < ttl_s:
                os.rename(tomb, path)
                return
            os.remove(tomb)
        except OSError:
            pass
        _adopt_orphan_version(spark, state_dir, nxt)
        return
    jvm, fs, _ = _hfs(spark, state_dir)
    path = jvm.org.apache.hadoop.fs.Path(state_dir, f"offsets/{name}")
    try:
        mtime_ms = fs.getFileStatus(path).getModificationTime()
    except Exception:
        return
    if _time.time() * 1000 - mtime_ms < ttl_s * 1000:
        return
    if (_current_version(state_dir, spark) or 0) >= nxt:
        return
    tomb = jvm.org.apache.hadoop.fs.Path(
        state_dir, f"offsets/{name}.broken.{_uuid.uuid4().hex}"
    )
    try:
        if not fs.rename(path, tomb):
            return
    except Exception:
        return
    try:
        # Rename preserves mtime: restore a claim that turned out FRESH
        # (broken and re-created between our stat and rename).
        if _time.time() * 1000 - fs.getFileStatus(tomb).getModificationTime() < ttl_s * 1000:
            fs.rename(tomb, path)
            return
    except Exception:
        pass
    fs.delete(tomb, False)
    _adopt_orphan_version(spark, state_dir, nxt)


def _adopt_orphan_version(spark: SparkSession, state_dir: str, nxt: int) -> None:
    """Finish a dead committer's commit: if a fully-written
    ``offsets/v{nxt}`` exists but the pointer still trails it, swing the
    pointer to it.  Safe by commit-after-store ordering (the data the
    version records was durably stored before its committer ever wrote
    parquet), idempotent with the stalled committer's own later pointer
    write, and required to unblock successors (see ``_break_stale_claim``).
    No-op when the version directory is absent or incomplete."""
    if "://" not in state_dir:
        vdir = os.path.join(state_dir, "offsets", f"v{nxt:08d}")
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            return
        if (_current_version(state_dir) or 0) >= nxt:
            return
        _write_pointer(spark, state_dir, nxt)
        return
    jvm, fs, _ = _hfs(spark, state_dir)
    success = jvm.org.apache.hadoop.fs.Path(
        state_dir, f"offsets/v{nxt:08d}/_SUCCESS"
    )
    try:
        if not fs.exists(success):
            return
    except Exception:
        return
    if (_current_version(state_dir, spark) or 0) >= nxt:
        return
    _write_pointer(spark, state_dir, nxt)


def _write_pointer(spark: SparkSession, state_dir: str, nxt: int) -> None:
    """Atomically swap ``offsets.CURRENT`` to version ``nxt``: tempfile +
    ``os.replace`` locally; temp object + ``FileContext`` rename with
    ``Rename.OVERWRITE`` remotely (single atomic metadata op on HDFS),
    falling back to delete+rename whose no-pointer crash window
    ``_recover_version`` closes."""
    if "://" not in state_dir:
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=state_dir, prefix=".offsets.CURRENT.")
        with os.fdopen(fd, "w") as fh:
            fh.write(f"v{nxt:08d}")
        os.replace(tmp, os.path.join(state_dir, _POINTER))
        return
    jvm, fs, _ = _hfs(spark, state_dir)
    tmp = jvm.org.apache.hadoop.fs.Path(state_dir, f".offsets.CURRENT.v{nxt:08d}")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(f"v{nxt:08d}", "utf-8"))
    finally:
        stream.close()
    pointer = jvm.org.apache.hadoop.fs.Path(state_dir, _POINTER)
    try:
        gw = spark.sparkContext._gateway
        rename_opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        rename_opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            pointer.toUri(), spark._jsc.hadoopConfiguration()
        )
        fc.rename(tmp, pointer, rename_opts)
    except Exception:
        # Store without FileContext support (some object-store connectors):
        # non-atomic fallback, recoverable via _recover_version.
        if fs.exists(pointer):
            fs.delete(pointer, False)
        fs.rename(tmp, pointer)


def _replace_at(
    spark: SparkSession, state_dir: str, state: DataFrame, nxt: int,
    token: str | None = None,
) -> DataFrame:
    """Make ``state`` visible as version ``nxt``: write to a UNIQUE staging
    directory, re-verify claim ownership, rename staging into place, swap
    the pointer, prune.

    The staging + verify + rename sequence is what makes a broken claim
    actually LOSE: a committer stalled past the claim TTL (slow parquet
    write, GC pause, suspended VM) whose claim a peer broke and re-claimed
    would otherwise wake and overwrite the peer's committed version
    directory with a merge built on a stale snapshot — erasing the peer's
    intervals AND clobbering parquet data the live pointer references.
    With staging, the stalled committer's write lands in its own scratch
    dir; the ownership check (and the rename's refusal to replace an
    existing version dir) turns the wake-up into a clean ``ClaimLost``
    retry instead of a lost update."""
    import uuid as _uuid

    suffix = token or _uuid.uuid4().hex
    staging = f"{state_dir}/offsets/.staging.v{nxt:08d}.{suffix}"
    version_dir = f"{state_dir}/offsets/v{nxt:08d}"
    state.write.mode("overwrite").parquet(staging)

    def _abort(reason: str) -> None:
        import shutil

        if "://" not in state_dir:
            shutil.rmtree(staging, ignore_errors=True)
        else:
            jvm_, fs_, _ = _hfs(spark, state_dir)
            try:
                fs_.delete(jvm_.org.apache.hadoop.fs.Path(staging), True)
            except Exception:
                pass
        # If the loss is because a fully-committed v{nxt} is sitting there
        # with a trailing pointer (its committer died between rename and
        # pointer write), finish that commit NOW — otherwise every retry
        # recomputes the same nxt and re-aborts here until a TTL elapses.
        try:
            _adopt_orphan_version(spark, state_dir, nxt)
        except Exception:
            pass
        raise ClaimLost(f"version v{nxt} claim lost ({reason}) in {state_dir}")

    if token is not None and _claim_owner(spark, state_dir, nxt) != token:
        _abort("owner token changed")
    _clear_incomplete_version(spark, state_dir, nxt)
    if "://" not in state_dir:
        import shutil

        try:
            # POSIX rename refuses to replace a non-empty directory —
            # exactly the guard we want: if a peer's committed v{nxt}
            # already exists, this committer's claim was broken.
            os.rename(staging, version_dir)
        except OSError:
            _abort("version directory already exists")
        # The rename succeeded, so v{nxt} is OURS.  If the version already
        # visible is BEYOND nxt, a TTL-breaker adopted our orphan while we
        # stalled and peers built on it — re-writing CURRENT here would
        # regress their commits.  At exactly nxt the write is idempotent
        # (and on a first commit _current_version recovers nxt from our own
        # just-renamed directory, so `<= nxt` — not `< nxt` — is what still
        # creates the pointer).
        if (_current_version(state_dir) or 0) <= nxt:
            _write_pointer(spark, state_dir, nxt)
        versions_root = os.path.join(state_dir, "offsets")
        for v in os.listdir(versions_root):
            # digit guard: a stray user entry like `v1.bak` must not crash
            # every future commit
            if v.startswith("v") and v[1:].isdigit() and int(v[1:]) < nxt - 1:
                shutil.rmtree(os.path.join(versions_root, v), ignore_errors=True)
            elif v.startswith(".claim.v") and v[8:].lstrip("v").isdigit() and int(
                v[8:].lstrip("v")
            ) < nxt - 1:
                try:
                    os.remove(os.path.join(versions_root, v))
                except OSError:
                    pass
            elif v.startswith(".staging.v") and _staging_version(v) is not None and (
                _staging_version(v) < nxt - 1
            ):
                # Scratch left by a committer that died (or lost its claim)
                # long ago — unreferenced by construction.
                shutil.rmtree(os.path.join(versions_root, v), ignore_errors=True)
        legacy = os.path.join(state_dir, "offsets.parquet")
        if os.path.exists(legacy):  # migration: drop pre-pointer layout
            shutil.rmtree(legacy, ignore_errors=True)
        return read_offsets(spark, state_dir)
    # Remote store: write temp pointer object then rename.  The swap uses
    # FileContext.rename(..., Rename.OVERWRITE) where the store supports it
    # (single atomic metadata op on HDFS); the delete+rename fallback has a
    # crash window with NO pointer, which ``_recover_version`` closes by
    # adopting the highest fully-written offsets/v* directory.
    jvm, fs, _ = _hfs(spark, state_dir)
    staging_path = jvm.org.apache.hadoop.fs.Path(staging)
    version_path = jvm.org.apache.hadoop.fs.Path(version_dir)
    # Hadoop FileSystem.rename moves src INTO an existing dst directory
    # instead of failing — check-then-rename (the residual race is the
    # rename itself; the ownership check above already shrank the window
    # from the whole parquet write to this metadata op).
    if fs.exists(version_path):
        _abort("version directory already exists")
    if not fs.rename(staging_path, version_path):
        _abort("staging rename refused")
    # Same adoption guard as the local branch: a visible version PAST nxt
    # means a TTL-breaker finished our commit and peers advanced — don't
    # regress it.  At exactly nxt (breaker-adopted, or recovered from our
    # own rename on a pointerless store) the write is idempotent/required.
    if (_current_version(state_dir, spark) or 0) <= nxt:
        _write_pointer(spark, state_dir, nxt)
    versions_root = jvm.org.apache.hadoop.fs.Path(state_dir, "offsets")
    for st in fs.listStatus(versions_root):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < nxt - 1:
            fs.delete(st.getPath(), True)
        elif name.startswith(".claim.v") and name[8:].lstrip("v").isdigit() and int(
            name[8:].lstrip("v")
        ) < nxt - 1:
            fs.delete(st.getPath(), False)
        elif name.startswith(".staging.v") and _staging_version(name) is not None and (
            _staging_version(name) < nxt - 1
        ):
            fs.delete(st.getPath(), True)
    return read_offsets(spark, state_dir)


def _clear_incomplete_version(spark: SparkSession, state_dir: str, nxt: int) -> None:
    """Claim-holder-only debris sweep: remove a ``v{nxt}`` directory that
    lacks ``_SUCCESS`` — pre-staging-protocol crash leftovers or external
    interference, never committed data (staged dirs are fully written,
    ``_SUCCESS`` included, BEFORE their atomic rename, so a committed
    version always carries the marker).  While the caller holds the claim
    no live peer may create ``v{nxt}`` (the staging rename re-verifies
    ownership first), which makes the check-then-delete race-free at the
    protocol's TTL granularity — the dangerous interleave (our claim
    broken AND a new claimant fully committed between our check and the
    delete) requires the claim TTL to elapse inside this metadata-op
    window.  Without the sweep, debris livelocks every commit that
    reaches version ``nxt``: the rename is refused, adoption no-ops on
    the incomplete dir, and the ``ClaimLost`` retry recomputes the same
    ``nxt`` forever."""
    if "://" not in state_dir:
        import shutil

        vdir = os.path.join(state_dir, "offsets", f"v{nxt:08d}")
        if os.path.isdir(vdir) and not os.path.exists(
            os.path.join(vdir, "_SUCCESS")
        ):
            shutil.rmtree(vdir, ignore_errors=True)
        return
    jvm, fs, _ = _hfs(spark, state_dir)
    vdir = jvm.org.apache.hadoop.fs.Path(state_dir, f"offsets/v{nxt:08d}")
    success = jvm.org.apache.hadoop.fs.Path(
        state_dir, f"offsets/v{nxt:08d}/_SUCCESS"
    )
    try:
        if fs.exists(vdir) and not fs.exists(success):
            fs.delete(vdir, True)
    except Exception:
        pass


def _staging_version(name: str) -> int | None:
    """Version number of a ``.staging.v{N}.{token}`` scratch dir name."""
    parts = name.split(".")
    # ["", "staging", "v{N}", "{token}"]
    if len(parts) >= 3 and parts[2].startswith("v") and parts[2][1:].isdigit():
        return int(parts[2][1:])
    return None


def read_offsets(spark: SparkSession, state_dir: str) -> DataFrame:
    """Load the committed interval state (empty DataFrame if none yet).

    Resolves the ``offsets.CURRENT`` pointer; falls back to the legacy
    single-directory layout for pre-pointer state dirs.
    """
    return _read_state_at(spark, state_dir, _current_version(state_dir, spark))


def _read_state_at(
    spark: SparkSession, state_dir: str, cur: int | None
) -> DataFrame:
    """State at an explicitly resolved version (so commit_offsets can pin
    its merge snapshot to the same version it claims against)."""
    if cur is not None:
        return spark.read.parquet(f"{state_dir}/offsets/v{cur:08d}")
    legacy = os.path.join(state_dir, "offsets.parquet")
    if "://" not in state_dir and os.path.exists(legacy):
        return spark.read.parquet(legacy)
    return spark.createDataFrame([], STATE_SCHEMA)


def remove_offsets(state: DataFrame, to_remove: DataFrame) -> DataFrame:
    """O16 ``remove`` / cleaner rollback (Accountant.kt:62-65): subtract
    [from, to] ranges from the state, splitting intervals where needed.

    Boundary-sweep implementation (correct for any number of removals
    hitting one interval): emit +1/-1 deltas at interval boundaries for
    both state and removal sets, running-sum them along the offset axis,
    keep segments covered by state and not by any removal, then island-merge
    adjacent kept segments.  One shuffle on (topic, partition).

    ``last_processed`` of a surviving slice is inherited from the state
    interval containing it (a remove never advances mtimes).
    """
    has_mtime = "last_processed" in state.columns
    st_events = state.select(
        "topic",
        "partition",
        F.explode(
            F.array(
                F.struct(F.col("offset_from").alias("pos"), F.lit(1).alias("d_state"), F.lit(0).alias("d_rm")),
                F.struct((F.col("offset_to") + 1).alias("pos"), F.lit(-1).alias("d_state"), F.lit(0).alias("d_rm")),
            )
        ).alias("e"),
    ).select("topic", "partition", "e.pos", "e.d_state", "e.d_rm")
    rm_events = to_remove.select(
        "topic",
        "partition",
        F.explode(
            F.array(
                F.struct(F.col("offset_from").alias("pos"), F.lit(0).alias("d_state"), F.lit(1).alias("d_rm")),
                F.struct((F.col("offset_to") + 1).alias("pos"), F.lit(0).alias("d_state"), F.lit(-1).alias("d_rm")),
            )
        ).alias("e"),
    ).select("topic", "partition", "e.pos", "e.d_state", "e.d_rm")
    events = st_events.unionByName(rm_events)
    w = Window.partitionBy("topic", "partition").orderBy("pos")
    segs = (
        events.groupBy("topic", "partition", "pos")
        .agg(F.sum("d_state").alias("d_state"), F.sum("d_rm").alias("d_rm"))
        .withColumn("cov_state", F.sum("d_state").over(w))
        .withColumn("cov_rm", F.sum("d_rm").over(w))
        .withColumn("next_pos", F.lead("pos").over(w))
        .filter((F.col("cov_state") > 0) & (F.col("cov_rm") == 0) & F.col("next_pos").isNotNull())
        .select(
            "topic",
            "partition",
            F.col("pos").alias("offset_from"),
            (F.col("next_pos") - 1).alias("offset_to"),
        )
    )
    kept = merge_offset_intervals(segs)
    if not has_mtime:
        return kept
    src = state.select(
        F.col("topic").alias("s_topic"),
        F.col("partition").alias("s_partition"),
        F.col("offset_from").alias("s_from"),
        F.col("offset_to").alias("s_to"),
        "last_processed",
    )
    return (
        kept.join(
            src,
            (kept["topic"] == src["s_topic"])
            & (kept["partition"] == src["s_partition"])
            & (kept["offset_from"] >= src["s_from"])
            & (kept["offset_to"] <= src["s_to"]),
            "left",
        )
        .select("topic", "partition", "offset_from", "offset_to", "last_processed")
    )
