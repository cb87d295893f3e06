"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Query set: the core restructure pipeline operators plus the scale-path
north-star extensions (LSH dedup/ANN rather than the O(n²) baselines,
which exist only as small-SF correctness oracles).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Reference time of the calibration workload (4e9-row range -> xxhash64
# -> bit_xor noop write on local[32]) measured on an UNLOADED host phase,
# r11.  Normalized per-query time = raw / (calibration_s / this).
CALIBRATION_REF_S = 0.87

BENCH_QUERIES = [
    "restructure_flagship",
    "event_time_extraction",
    "time_binning",
    "sanitize_ids",
    "filename_parse",
    "offset_assign",
    "dedup_keep_last",
    "dedup_distinct_fields",
    "dedup_exact",
    "offset_interval_merge",
    "offset_interval_remove",
    "seen_file_filter",
    "seen_record_filter",
    "cleaner_verify",
    "path_template",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "text_token_count",
    "text_quality",
    "gopher_quality",
    "text_lang_id",
    "text_fingerprint",
    "corpus_filter",
    "vocab_topk",
    "redact_pii",
    "stratified_sample",
    "mixture_sample",
    "chunk_documents",
    "text_repetition",
    "contamination_check",
    "tfidf_top_terms",
    "bm25_topk",
    "bm25_index_query",
    "bm25_segment_query",
    "bm25_tombstone_query",
    "ivf_tombstone_query",
    # r13: replay-safe append witness, the full mutation chain, and the
    # composed takedown lifecycle — each rebuilds its artifacts per call
    # BY DESIGN (the emitted counters describe that run), so these rows
    # price the whole lifecycle, not a warm serve.
    "ivf_append_replay",
    "ivf_lifecycle_chain",
    "corpus_forget",
    "unimax_sample",
    "grouped_holdout",
    "split_churn",
    "pinned_resplit",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "substring_dedup",
    "sequence_packing",
    "lm_perplexity",
    "curation_pipeline",
    "curation_soft_dedup",
    "train_data_job",
    "html_ingest_pipeline",
    "warc_ingest",
    "crawl_health",
    "c4_clean",
    "gopher_repetition",
    "dsir_select",
    "best_fit_pack",
    "benchmark_leak_report",
    "quality_signals",
    "duplication_weights",
    "epoch_upsample",
    "ann_pq_topk",
    "ann_pq_recall",
    "ivfpq_index_query",
    "incremental_dedup",
    "bloom_incremental_dedup",
    "line_corrections",
    "langid_trigram",
    "lm_bigram",
    "text_normalize",
    "line_dedup",
    "bpe_encode",
    "corpus_profile",
    "token_budget_sample",
    "feature_hash_embed",
    "html_extract",
    "semdedup_kmeans",
    "embedding_pca",
    "ann_pca_ivf_topk",
    "prototype_prune",
    "pack_materialize",
    "lm_curriculum",
    "temperature_sample",
    "epoch_shuffle",
    "perplexity_filter",
    "paragraph_dedup",
    "decontaminate_spans",
    "holdout_split",
    "unit_span_dedup",
    "quality_classifier",
    "url_dedup",
    "ivf_index_query",
    "simhash",
    "simhash_near_dup",
    "near_dup_groups",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_lsh",
    "embedding_near_dup_groups",
    "csv_flatten",
    "record_membership",
    "events_rollup",
    "user_sessions",
    "asof_join",
    "time_window_join",
    "approx_distinct_users",
    "approx_quantiles",
    "regex_token_count",
    # embedding_near_dup / embedding_cosine_topk / ngram_jaccard_pairs are
    # O(n²) exact baselines: oracle-checked at sf0.01, excluded from the
    # timed bench (their scale paths ann_lsh_topk / minhash_lsh_pairs run).
    "multimodal_features",
]


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("bench")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(2 * int(CPUS) if CPUS.isdigit() else 64))
        .config("spark.sql.adaptive.enabled", "true")
        # 32g heap + G1 (round-6 A/B, VERDICT r5 #2): at sf0.1 with a
        # 3-iteration warm variance guard, G1 beat the r5 ParallelGC tuning
        # on every axis — 54.4 vs 61.7 s cold, 37.4 vs 39.8 s warm over the
        # same 54 queries, median warm spread 10.6% vs 13.3%, and the ANN
        # queries specifically 1.8 vs 2.1-3.2 s medians.  Measured GC time
        # is negligible under both (<0.2 s total), so the r5 "G1 stalls"
        # were host-phase noise, not collector choice; G1 is the JVM
        # default and the better fit for many small queries.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseG1GC"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    # Untimed warmup: first parquet scan, whole-stage codegen, shuffle
    # machinery, and the Python/Arrow worker pool all pay one-time session
    # costs (~5-8 s) that would otherwise bill to whichever query runs
    # first — steady-state per-query numbers are what a long-running
    # cluster job sees.
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    warm = load_table(spark, SF_DIR, "events").limit(1000)
    warm.groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    warm.mapInPandas(lambda it: it, schema=warm.schema).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warm the remaining heavy operator shapes (grouped applyInPandas,
    # window, distinct) on 100 rows: their generated code compiles once per
    # session, and with a single pass per query that compile would bill to
    # whichever query first uses the shape.
    from pyspark.sql import Window as _W

    tiny = warm.limit(100).select(F.col("user_id").alias("g"), F.col("value").alias("v"))
    tiny.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), schema="g long, v double"
    ).write.format("noop").mode("overwrite").save()
    tiny.distinct().withColumn(
        "r", F.row_number().over(_W.partitionBy("g").orderBy("v"))
    ).write.format("noop").mode("overwrite").save()

    import gc

    def run_once(fn) -> int:
        # Materialize EVERY row and column cluster-side: a noop-format write
        # evaluates the full un-pruned plan (the observed count prevents any
        # count-only shortcut) without serializing results through the
        # driver — round 1's toLocalIterator drain billed driver transfer
        # of 100k-row results to the query.
        obs = Observation()
        df = fn(spark, SF_DIR)
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format("noop").mode(
            "overwrite"
        ).save()
        return int(obs.get["rows"])

    def hygiene() -> None:
        # Untimed inter-query hygiene: operators persist/localCheckpoint
        # intermediates inside their returned plans (LSH shingle tables,
        # CC edge checkpoints).  Those blocks are only reclaimed by the
        # ContextCleaner after the PYTHON plan objects are collected —
        # forcing a gc here keeps block-manager / storage-memory pressure
        # from one query bleeding into the next (measured: repeated heavy
        # queries slowed 2-3x within a session).  Toggle with
        # SPARK_GRAFT_HYGIENE=0 for back-to-back warm comparisons.
        gc.collect()
        spark.catalog.clearCache()

    do_hygiene = os.environ.get("SPARK_GRAFT_HYGIENE", "1") != "0"
    warm_pass = os.environ.get("SPARK_GRAFT_WARM_PASS", "1") != "0"
    # Variance guard (VERDICT r5 #1): one warm sample per query cannot
    # distinguish a plan regression from a GC pause or host-contention
    # blip (r5's official bench recorded a 5.7x single-query swing that
    # the solo bench could not reproduce).  Run >=3 warm iterations and
    # report median + min/max spread, plus per-query driver-JVM GC time so
    # a pause is attributable.
    warm_iters = max(1, int(os.environ.get("SPARK_GRAFT_WARM_ITERS", "3")))

    gc_beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms() -> int:
        # Cumulative stop-the-world GC milliseconds across all collectors of
        # the driver JVM (== the whole cluster in local mode).
        return sum(b.getCollectionTime() for b in gc_beans)

    # Fixed per-query harness cost (Observation setup, noop-write job
    # launch, gc + clearCache): median of 5 no-op queries measured with the
    # exact same code path as a real query — reported separately so
    # round-over-round per-query deltas aren't confounded by harness
    # changes.
    noop = lambda s, _d: s.range(1)  # noqa: E731
    overhead_samples = []
    for _ in range(5):
        t0 = time.time()
        run_once(noop)
        if do_hygiene:
            hygiene()
        overhead_samples.append(time.time() - t0)
    harness_overhead = round(sorted(overhead_samples)[len(overhead_samples) // 2], 3)

    # Calibration anchor (VERDICT r10 #5): a fixed pure-JVM,
    # data-independent workload (~0.9 s on an unloaded host) measured at
    # the start AND end of the run.  The bench host has multi-hour slow
    # phases that inflate every query uniformly (r10 recorded 77->100 s
    # warm totals on identical code); normalizing by
    # calibration_s / CALIBRATION_REF_S separates host drift from plan
    # regressions instead of leaving the judge to eyeball sibling runs.
    def calibrate(samples: int = 4) -> list[float]:
        out = []
        for _ in range(samples):
            t0 = time.time()
            spark.range(0, 4_000_000_000, 1, 64).select(
                F.bit_xor(F.xxhash64("id")).alias("x")
            ).write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
        return out

    cal_pre = calibrate()[1:]  # drop the first sample (codegen/JIT warm-up)

    # VERDICT r11 #6: the start/end anchor missed MID-RUN interference
    # (drift_factor 1.045 while untouched queries doubled).  Interleave a
    # 1-sample probe every CAL_EVERY queries so each query can be
    # normalized by the probe NEAREST to when it actually ran.
    CAL_EVERY = max(1, int(os.environ.get("SPARK_GRAFT_CAL_EVERY", "15")))
    cal_probes: list[tuple[int, float]] = [(0, sorted(cal_pre)[len(cal_pre) // 2])]

    # extra_queries() is the bench/test-only surface: rows-only approximate
    # paths kept out of the driver-facing registry (50-entry harness cap).
    # Memo-hit accounting (VERDICT r13 #3): operators that memoize
    # RESULTS (groups closures, IVF routes, artifact templates) report
    # hits/misses to memostats; snapshotting around each timed iteration
    # records which numbers are memo-assisted, so a warm median on a
    # memoized row is never mistaken for the cost of the closure itself.
    from restructure_hdfs_topic_spark import memostats

    qs = {**entry.queries(), **entry.extra_queries()}
    timings: dict[str, float] = {}
    timings_warm: dict[str, float] = {}
    warm_stats: dict[str, dict] = {}
    gc_cold_ms: dict[str, int] = {}
    memo_cold: dict[str, dict] = {}
    memo_warm: dict[str, dict] = {}
    query_pos: dict[str, int] = {}
    for qi, name in enumerate(BENCH_QUERIES):
        query_pos[name] = qi
        if qi and qi % CAL_EVERY == 0:
            cal_probes.append((qi, calibrate(samples=1)[0]))
        fn = qs.get(name)
        if fn is None:
            # Fail loudly: a silently skipped (renamed/removed) query would
            # shrink the total and make round-over-round numbers
            # incomparable with no signal.
            raise KeyError(
                f"bench query {name!r} missing from queries()/extra_queries()"
            )
        g0 = gc_ms()
        m0 = memostats.snapshot()
        t0 = time.time()
        rows = run_once(fn)
        timings[name] = round(time.time() - t0, 3)
        gc_cold_ms[name] = gc_ms() - g0
        d = memostats.delta(m0)
        if d:
            memo_cold[name] = d
        if warm_pass:
            # Immediate re-runs with all session state warm (JIT, shuffle
            # files, page cache) — the steady-state number a long-running
            # job sees.  Median over >=3 iterations so one GC pause or
            # host blip cannot masquerade as a plan regression.
            samples: list[float] = []
            gcs: list[int] = []
            m0 = memostats.snapshot()
            for _ in range(warm_iters):
                g0 = gc_ms()
                t0 = time.time()
                run_once(fn)
                samples.append(time.time() - t0)
                gcs.append(gc_ms() - g0)
            d = memostats.delta(m0)
            if d:
                memo_warm[name] = d
            srt = sorted(samples)
            med = srt[len(srt) // 2]
            timings_warm[name] = round(med, 3)
            warm_stats[name] = {
                "median": round(med, 3),
                "min": round(srt[0], 3),
                "max": round(srt[-1], 3),
                "spread_pct": round(100.0 * (srt[-1] - srt[0]) / med, 1)
                if med > 0
                else 0.0,
                "iters": warm_iters,
                "gc_ms_median": sorted(gcs)[len(gcs) // 2],
            }
        print(
            f"# {name}: cold {timings[name]}s (gc {gc_cold_ms[name]}ms)"
            + (
                f" / warm med {timings_warm[name]}s"
                f" [{warm_stats[name]['min']}-{warm_stats[name]['max']},"
                f" gc {warm_stats[name]['gc_ms_median']}ms]"
                if name in timings_warm
                else ""
            )
            + f" ({rows} rows)",
            file=sys.stderr,
        )
        if do_hygiene:
            hygiene()

    cal_post = calibrate()
    cal_probes.append((len(BENCH_QUERIES), sorted(cal_post)[len(cal_post) // 2]))
    cal_all = sorted(cal_pre + cal_post)
    calibration_s = round(cal_all[len(cal_all) // 2], 3)
    drift = round(calibration_s / CALIBRATION_REF_S, 3)

    def drift_at(pos: int) -> float:
        # Per-query drift from the probe nearest to when the query ran —
        # a mid-run slow phase normalizes the queries it actually hit.
        _idx, cal = min(cal_probes, key=lambda p: abs(p[0] - pos))
        return max(cal / CALIBRATION_REF_S, 1e-9)

    recalls = measure_recall(spark)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall": recalls,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "harness_overhead_s": harness_overhead,
        # Host-drift anchor: raw samples + the median and the factor vs
        # the pinned reference, so every per-query number can be read as
        # raw AND normalized (time / drift_factor).
        "calibration_samples_s": [round(x, 3) for x in cal_pre + cal_post],
        "calibration_s": calibration_s,
        "calibration_ref_s": CALIBRATION_REF_S,
        "drift_factor": drift,
        # The interleaved probes (VERDICT r11 #6): (query index, seconds)
        # — mid-run interference shows HERE even when start/end look calm.
        "calibration_probes": [
            {"at_query": i, "s": round(s, 3)} for i, s in cal_probes
        ],
    }
    result["queries_gc_ms"] = gc_cold_ms
    # Which rows were memo-assisted, and when (VERDICT r13 #3): [hits,
    # misses] per memo per query — a row present in queries_memo_warm got
    # at least one result-memo/template hit during its warm iterations,
    # so its warm median prices a fingerprint check, not the full
    # closure; the cold column (one entry per process) is the honest
    # closure-cost cite.
    if memo_cold:
        result["queries_memo_cold"] = memo_cold
    if memo_warm:
        result["queries_memo_warm"] = memo_warm
    if warm_pass:
        result["queries_warm"] = timings_warm
        result["total_warm_s"] = round(sum(timings_warm.values()), 3)
        result["total_warm_norm_s"] = round(sum(timings_warm.values()) / drift, 3)
        # Normalized by the NEAREST interleaved probe, not the run-global
        # factor — the r11 failure mode was exactly a mid-run slow phase
        # the endpoint anchors averaged away.
        result["queries_warm_norm"] = {
            k: round(v / drift_at(query_pos[k]), 3) for k, v in timings_warm.items()
        }
        result["queries_warm_stats"] = warm_stats
        result["warm_iters"] = warm_iters
    # Headline = per-query MEDIAN across the final N solo runs (VERDICT
    # r11 #6): the bench host has multi-hour slow phases a single run
    # cannot separate from regressions.  Prior runs come from
    # BENCH_RUNS.jsonl; only runs with the SAME query set and sf are
    # comparable (a changed set would skew the totals silently).
    runs_path = os.environ.get(
        "SPARK_GRAFT_BENCH_RUNS",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS.jsonl"
        ),
    )
    median_runs = max(1, int(os.environ.get("SPARK_GRAFT_MEDIAN_RUNS", "3")))
    try:
        prior = []
        with open(runs_path) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if (
                    r.get("sf") == result["sf"]
                    and set(r.get("queries", {})) == set(timings)
                    and (not warm_pass or set(r.get("queries_warm", {})) == set(timings))
                ):
                    prior.append(r)
        window = (prior + [result])[-median_runs:]

        def med(vals: list[float]) -> float:
            s = sorted(vals)
            return round(s[len(s) // 2], 3)

        result["median_of_runs_n"] = len(window)
        result["queries_median_of_runs"] = {
            q: med([r["queries"][q] for r in window]) for q in timings
        }
        result["total_median_of_runs_s"] = round(
            sum(result["queries_median_of_runs"].values()), 3
        )
        if warm_pass:
            result["queries_warm_median_of_runs"] = {
                q: med([r["queries_warm"][q] for r in window]) for q in timings_warm
            }
            result["total_warm_median_of_runs_s"] = round(
                sum(result["queries_warm_median_of_runs"].values()), 3
            )
    except OSError:
        # No runs file yet (fresh checkout): the headline degrades to
        # this run's own numbers, explicitly marked n=1.
        result["median_of_runs_n"] = 1
        result["queries_median_of_runs"] = dict(timings)
        result["total_median_of_runs_s"] = total
        if warm_pass:
            result["queries_warm_median_of_runs"] = dict(timings_warm)
            result["total_warm_median_of_runs_s"] = round(
                sum(timings_warm.values()), 3
            )

    # The driver's log capture can truncate the stderr per-query lines
    # (VERDICT r4 #5), so also persist the full parsed JSON as a sibling
    # artifact committed with the round — readable without log archaeology.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# could not write {out_path}: {exc}", file=sys.stderr)
    # EVERY solo run also appends one line here (VERDICT r9 stretch #9):
    # the bench host has multi-hour slow phases, so a single recorded run
    # cannot distinguish drift from regression — the judge reads all of a
    # round's runs side by side instead of re-running.  The cross-run
    # median keys are stripped from the line (each line is ONE run; the
    # medians belong to BENCH_LOCAL.json / stdout).
    run_line = {
        k: v
        for k, v in result.items()
        if not k.endswith("_of_runs") and not k.endswith("_of_runs_s") and k != "median_of_runs_n"
    }
    try:
        with open(runs_path, "a") as fh:
            fh.write(json.dumps({"ts": time.time(), **run_line}) + "\n")
    except OSError as exc:
        print(f"# could not append {runs_path}: {exc}", file=sys.stderr)
    # The stdout line is the driver contract — and its capture TRUNCATED
    # r12's record once the line carried six 111-entry dicts
    # (BENCH_r12.json parsed: null ⇒ PERF r13 had no round-over-round
    # data; VERDICT r13 #2).  Keep stdout to the contract keys + the cold
    # / warm / warm-median-of-runs dicts and the drift scalars; every
    # other dict (gc, spreads, normalized, probes, memo hits) stays in
    # BENCH_LOCAL.json and BENCH_RUNS.jsonl, committed with the round.
    slim_keys = (
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "recall",
        "harness_overhead_s",
        "calibration_s",
        "calibration_ref_s",
        "drift_factor",
        "warm_iters",
        "queries_warm",
        "total_warm_s",
        "total_warm_norm_s",
        "median_of_runs_n",
        "total_median_of_runs_s",
        "queries_warm_median_of_runs",
        "total_warm_median_of_runs_s",
    )
    print(json.dumps({k: result[k] for k in slim_keys if k in result}))


def measure_recall(spark) -> dict:
    """Recall of the approximate scale paths vs their exact baselines,
    measured on bounded samples (untimed — quality metric, not benchmark):
    - ann_lsh_topk: fraction of a 200-query exact cosine top-5 recovered;
    - minhash_lsh_pairs: fraction of exact Jaccard≥0.2 pairs (500-doc
      sample, all-pairs ground truth) recovered by the LSH pipeline.
    """
    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.operators.dedup import (
        lsh_near_dup_pairs,
        ngram_jaccard_pairs,
    )
    from restructure_hdfs_topic_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        lsh_ann_topk,
    )
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    out: dict = {}
    configure(spark)
    exact = denom = None
    try:
        emb = load_table(spark, SF_DIR, "embeddings")
        sample = emb.orderBy("vec_id").limit(200)
        # ONE exact-cosine baseline, persisted and shared by the LSH and
        # IVF blocks — recomputing it per block doubled the recall pass's
        # dominant cost.
        exact = cosine_topk(emb, k=5, queries=sample).persist()
        denom = exact.count()
        approx = lsh_ann_topk(emb, k=5)
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        out["ann_lsh_topk@5"] = round(hits / denom, 4) if denom else None
    except Exception as exc:  # pragma: no cover - recall is best-effort
        out["ann_lsh_topk@5"] = f"error: {exc}"
    try:
        if exact is None or not denom:
            raise RuntimeError("no exact baseline")
        emb = load_table(spark, SF_DIR, "embeddings")
        approx = ivf_ann_topk(emb, k=5)
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        out["ann_ivf_topk@5"] = round(hits / denom, 4) if denom else None
    except Exception as exc:  # pragma: no cover
        out["ann_ivf_topk@5"] = f"error: {exc}"
    try:
        if exact is None or not denom:
            raise RuntimeError("no exact baseline")
        from restructure_hdfs_topic_spark.operators.pq import pq_adc_topk

        emb = load_table(spark, SF_DIR, "embeddings")
        sample = emb.orderBy("vec_id").limit(200)
        approx = pq_adc_topk(emb, sample, k=5, m=16, rerank_factor=4)
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        out["ann_pq_topk@5"] = round(hits / denom, 4) if denom else None
    except Exception as exc:  # pragma: no cover
        out["ann_pq_topk@5"] = f"error: {exc}"
    finally:
        if exact is not None:
            exact.unpersist()
    try:
        from restructure_hdfs_topic_spark.operators.similarity import (
            cosine_near_dup_pairs,
            lsh_cosine_near_dup_pairs,
        )

        emb = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id").limit(1000)
        exact_nd = cosine_near_dup_pairs(emb, threshold=0.35)
        lsh_nd = lsh_cosine_near_dup_pairs(emb, threshold=0.35)
        hits = exact_nd.join(lsh_nd, ["id_a", "id_b"], "left_semi").count()
        denom = exact_nd.count()
        out["embedding_near_dup_lsh@0.35"] = round(hits / denom, 4) if denom else None
    except Exception as exc:  # pragma: no cover
        out["embedding_near_dup_lsh@0.35"] = f"error: {exc}"
    try:
        docs = load_table(spark, SF_DIR, "documents").orderBy("doc_id").limit(500)
        exact_pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
        lsh_pairs = lsh_near_dup_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=16, rows_per_band=2,
            threshold=0.2,
        )
        hits = exact_pairs.join(lsh_pairs, ["id_a", "id_b"], "left_semi").count()
        denom = exact_pairs.count()
        out["minhash_lsh_pairs@0.2"] = round(hits / denom, 4) if denom else None
    except Exception as exc:  # pragma: no cover
        out["minhash_lsh_pairs@0.2"] = f"error: {exc}"
    try:
        ev = load_table(spark, SF_DIR, "events")
        agg = ev.groupBy("event_type").agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
            F.countDistinct("user_id").alias("e"),
        ).collect()
        max_rel = max(abs(r["a"] - r["e"]) / r["e"] for r in agg if r["e"])
        out["approx_distinct_max_rel_err"] = round(max_rel, 4)
        q = ev.groupBy("event_type").agg(
            F.percentile_approx("value", 0.95, 10000).alias("a"),
            F.expr("percentile(value, 0.95)").alias("e"),
        ).collect()
        max_rel = max(abs(r["a"] - r["e"]) / abs(r["e"]) for r in q if r["e"])
        out["approx_p95_max_rel_err"] = round(max_rel, 4)
    except Exception as exc:  # pragma: no cover
        out["approx_sketch_err"] = f"error: {exc}"
    return out


if __name__ == "__main__":
    main()
