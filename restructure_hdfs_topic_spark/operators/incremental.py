"""Incremental corpus dedup: dedup a NEW document batch against the
fingerprint state of everything already ingested (north-star extension).

A 100 TB training corpus is not built in one shot — it grows by crawl
increment, and each increment must be deduplicated against the corpus
history WITHOUT rescanning it.  This module keeps that history as a
committed set of 8-byte ``xxhash64(text)`` fingerprints (the same
exact-dedup key ``dedup_exact_docs`` shuffles on) and mirrors the offset
accounting's commit discipline (SURVEY O17/O18): filter the batch against
the state, durably write the accepted documents, THEN commit their
fingerprints — a crash between the two steps re-offers the batch instead
of losing it.

State persistence reuses the versioned-directory + pointer-swap + CAS
claim protocol from ``operators/offsets.py`` (same crash-safety and
concurrent-committer story, battle-tested there; the on-disk layout is
the shared implementation's ``offsets/v*`` naming).  Point it at its OWN
state directory, never at an offset accounting dir.

Scale shape: the novelty filter is one hash anti-join on an 8-byte key
(the within-batch keep-first window reuses the same exchange); the state
never collects; commits union-distinct two fingerprint sets — all
shuffle-partitioned, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators import offsets as _off

FP_SCHEMA = "fp long"


def document_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct 8-byte content fingerprints of a document set."""
    return docs.select(F.xxhash64(F.col(text_col)).alias("fp")).distinct()


def filter_novel_documents(
    batch: DataFrame,
    state_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents of ``batch`` whose text content is new: not fingerprinted
    in ``state_fps`` AND first (lowest ``id_col``) among in-batch copies.

    One exchange on the fingerprint serves both the keep-first window and
    the anti-join; original batch columns pass through unchanged.
    """
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        batch.withColumn("__fp", F.xxhash64(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .join(
            state_fps.select(F.col("fp").alias("__fp")), on="__fp", how="left_anti"
        )
        .select(*batch.columns)
    )


def read_fingerprints(spark: SparkSession, state_dir: str) -> DataFrame:
    """Committed fingerprint state (empty frame when none yet)."""
    cur = _off._current_version(state_dir, spark)
    if cur is None:
        return spark.createDataFrame([], FP_SCHEMA)
    return spark.read.parquet(f"{state_dir}/offsets/v{cur:08d}")


def commit_fingerprints(
    spark: SparkSession, state_dir: str, new_fps: DataFrame
) -> DataFrame:
    """Merge ``new_fps`` into the committed set and swap atomically — the
    same resolve-once CAS as ``commit_offsets`` (claim cur+1 against the
    snapshot read from cur; a concurrent pointer bump fails the claim and
    forces re-read).  Call only AFTER the accepted documents are durably
    written (commit-after-store, O18)."""
    import os as _os
    import random
    import time as _time

    if "://" not in state_dir:
        _os.makedirs(state_dir, exist_ok=True)
    for attempt in range(64):
        cur = _off._current_version(state_dir, spark)
        existing = (
            spark.read.parquet(f"{state_dir}/offsets/v{cur:08d}")
            if cur is not None
            else spark.createDataFrame([], FP_SCHEMA)
        )
        merged = existing.select("fp").unionByName(new_fps.select("fp")).distinct()
        nxt = (cur or 0) + 1
        if not _off._claim_version(spark, state_dir, nxt):
            _off._break_stale_claim(spark, state_dir, nxt)
            if _off._claim_exists(spark, state_dir, nxt):
                _time.sleep(
                    min(2.0, 0.05 * (attempt + 1)) * (0.5 + random.random())
                )
            continue
        return _off._replace_at(spark, state_dir, merged, nxt)
    raise RuntimeError(f"commit_fingerprints: version contention in {state_dir}")


def ingest_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    write_accepted,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """One increment, commit-after-store: filter the batch to novel
    documents, hand them to ``write_accepted(accepted_df)`` (the caller's
    durable write — its return is ignored), then commit their
    fingerprints.  Returns counters.  A crash before the commit re-offers
    the whole batch next run; the filter makes the rerun a no-op for
    already-ingested content, so the protocol is idempotent."""
    state = read_fingerprints(spark, state_dir)
    accepted = filter_novel_documents(batch, state, id_col, text_col)
    # Persist across the caller's write action and our fingerprint commit
    # (two evaluations of the filtered plan otherwise).
    from pyspark import StorageLevel

    accepted = accepted.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_accepted = accepted.count()
        write_accepted(accepted)
        if n_accepted:
            commit_fingerprints(
                spark, state_dir, document_fingerprints(accepted, text_col)
            )
        return {
            "batch_rows": batch.count(),
            "accepted_rows": n_accepted,
        }
    finally:
        accepted.unpersist()
