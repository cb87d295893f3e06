"""Plan-shape regression guards: the 100 TB design claims that SCALE.md
makes about key queries, asserted mechanically against the optimized
physical plans (no job execution — `.explain` only).

Guards:
- no CartesianProduct / BroadcastNestedLoopJoin outside the documented
  exact-baseline queries;
- parquet scans carry PushedFilters / pruned ReadSchema where the query
  filters or projects;
- no row-at-a-time Python UDF (BatchEvalPython) anywhere — every Python
  crossing must be Arrow (ArrowEvalPython / mapInPandas / applyInPandas);
- WholeStageCodegen present in every batch query plan.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"

# Exact-baseline queries documented as quadratic oracles — the only ones
# allowed a nested-loop/cartesian shape.
EXACT_BASELINES = {
    "embedding_cosine_topk",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "contamination_check",
}


def _plan(spark, name):
    import __spark_entry__ as e

    qs = {**e.queries(), **e.extra_queries()}
    df = qs[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


REPRESENTATIVE = [
    # core restructure
    "restructure_flagship",
    "seen_record_filter",
    "csv_flatten",
    "dedup_keep_last",
    # text/curation
    "corpus_filter",
    "gopher_quality",
    "line_dedup",
    "substring_dedup",
    "paragraph_dedup",
    "decontaminate_spans",
    "unit_span_dedup",
    "url_dedup",
    # sampling/ordering
    "stratified_sample",
    "temperature_sample",
    "holdout_split",
    "epoch_shuffle",
    # similarity
    "simhash",
    "minhash_lsh_pairs",
    # LM
    "lm_perplexity",
    "perplexity_filter",
    # retrieval (r10 continuation; fully lazy plan)
    "bm25_topk",
]

# r10-continuation queries whose CONSTRUCTION runs bounded driver work
# (per-stratum count collects, PCA/k-means fits) before the lazy plan
# exists — kept out of REPRESENTATIVE so the module's "explain-only"
# contract stays true there, but still guarded: the same assertions run
# on the post-construction plan.  bm25_index_query is excluded entirely
# (it materializes a /tmp index artifact; its plan-shape assertions —
# PartitionFilters/PushedFilters — live in tests/test_bm25_index.py).
EAGER_REPRESENTATIVE = [
    "unimax_sample",
    "embedding_pca",
    "prototype_prune",
    # r11: both build near_dup_groups at construction (eager CC closure,
    # memoized); the returned join+CASE plans are what's guarded here.
    # train_data_job / bm25_segment_query / bm25_tombstone_query /
    # ivf_tombstone_query are excluded like bm25_index_query (they
    # materialize disk artifacts; their shape assertions live in their
    # own test files — the tombstone serve paths in
    # tests/test_bm25_delete.py and tests/test_ivf_delete.py), and
    # ann_pca_ivf_topk
    # contains the SCOPED exact-cosine baseline (bounded 100-query side)
    # like ann_ivf_recall.
    "grouped_holdout",
    "split_churn",
    # r12: pinned re-split — two closures at construction, then joins +
    # the pin-resolution aggregate + the full-outer churn diff.
    "pinned_resplit",
]


# Queries whose plan broadcasts a ONE-ROW aggregate (the token-stream
# total) via crossJoin — Spark renders that scalar-broadcast pattern as a
# BroadcastNestedLoopJoin, which is fine when the build side is a single
# row by construction (see lm.unigram_logprobs).
SCALAR_BROADCAST_OK = {
    "lm_perplexity",
    "perplexity_filter",
    # bm25_topk crossJoins the one-row (N, avgdl) corpus-stats aggregate
    # onto the tiny query-term table (see retrieval.bm25_topk).
    "bm25_topk",
}


@pytest.mark.parametrize("name", REPRESENTATIVE + EAGER_REPRESENTATIVE)
def test_no_cartesian_or_python_row_udf(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    # Row-at-a-time Python UDFs are the forbidden slow path; Arrow
    # evaluation (ArrowEvalPython / FlatMapsInPandas / etc.) is fine.
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    # Codegen spans render as "*(n)" prefixes; an AQE-wrapped plan prints
    # its INITIAL plan without those markers before first execution, so
    # the presence of AdaptiveSparkPlan is itself the accepted witness
    # (AQE re-plans into codegen stages at runtime).
    assert "*(" in plan or "AdaptiveSparkPlan" in plan, (
        f"{name}: no whole-stage-codegen span"
    )


def test_pushdown_reaches_the_scan(spark):
    """A filtered, projected table query pushes both the predicate and the
    column pruning into the parquet scan."""
    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    df = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters", 1)[1][:200]
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "text" not in read_schema, "projection pruning lost: text read for a 2-col query"


def test_exact_baselines_are_the_only_quadratic_plans(spark):
    """The documented exact baselines MAY be quadratic — everything else is
    covered by the parametrized guard above; here we just pin that the
    baseline list actually exists on the registry (so a rename cannot
    silently retire the exception list)."""
    import __spark_entry__ as e

    qs = {**e.queries(), **e.extra_queries()}
    missing = EXACT_BASELINES - set(qs)
    assert not missing, f"exception list names unknown queries: {missing}"
