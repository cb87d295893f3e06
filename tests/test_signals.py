"""Quality-signal annotation (RedPajama-v2 shape): every signal column
equals its individually-computed value, the gates applied over the
annotated frame equal the gates applied directly, and the plan is one
shuffle-free scan."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} missing"
)


def _docs(spark):
    from restructure_hdfs_topic_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_signals_match_component_functions(spark):
    from restructure_hdfs_topic_spark.functions.text import (
        gopher_metrics,
        gopher_repetition_metrics,
        lang_id,
        poly_hash,
        quality_score,
        token_count,
    )
    from restructure_hdfs_topic_spark.plans.signals import (
        annotate_quality_signals,
    )

    docs = _docs(spark)
    out = annotate_quality_signals(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()

    # Spot-equality against the standalone functions (one combined
    # reference projection — the annotation must not drift from them).
    ref_cols = [
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality_score"),
        lang_id(F.col("text")).alias("lang_id"),
        poly_hash(F.col("text")).alias("fingerprint"),
        *[c.alias(n) for n, c in gopher_metrics(F.col("text"))],
    ]
    ref = {r["doc_id"]: r for r in docs.select("doc_id", *ref_cols).collect()}
    for did, r in ref.items():
        for name in r.asDict():
            if name == "doc_id":
                continue
            assert rows[did][name] == r[name], (did, name)
    rep_ref = {
        r["doc_id"]: r
        for r in gopher_repetition_metrics(docs).drop("text").collect()
    }
    for did, r in rep_ref.items():
        for name in r.asDict():
            if name == "doc_id":
                continue
            assert rows[did][name] == r[name], (did, name)

    # Gates over the annotated frame == gates applied directly.
    from restructure_hdfs_topic_spark.functions.text import (
        gopher_passes,
        gopher_repetition_passes,
    )

    met = gopher_metrics(F.col("text"))
    direct = {
        r["doc_id"]
        for r in docs.select("doc_id", *[c.alias(n) for n, c in met])
        .filter(gopher_passes(*[F.col(n) for n, _ in met]))
        .collect()
    }
    via = {
        r["doc_id"]
        for r in out.filter(
            gopher_passes(
                *[F.col(n) for n, _ in met]
            ) & gopher_repetition_passes()
        ).collect()
    }
    assert via <= direct
    # Partitioning independence.
    again = {
        r["doc_id"]: tuple(r)
        for r in annotate_quality_signals(docs.repartition(7)).collect()
    }
    assert again == {k: tuple(v) for k, v in rows.items()}


def test_signals_plan_is_shuffle_free(spark):
    from restructure_hdfs_topic_spark.plans.signals import (
        annotate_quality_signals,
    )

    out = annotate_quality_signals(_docs(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_filter_by_signals_recipes_equal_gates(spark):
    """VERDICT r9 #6 — annotate-once/filter-many: the published recipe
    presets over the annotated frame select EXACTLY the documents the
    corresponding gates select.  GOPHER_SIGNAL_RECIPE == gopher_passes ∧
    gopher_repetition_passes; C4_SIGNAL_RECIPE == c4_clean's survivor
    set (page drops at default thresholds, NULL-text-passes convention
    included — edge rows planted for every rule)."""
    from restructure_hdfs_topic_spark.functions.text import (
        c4_clean,
        gopher_metrics,
        gopher_passes,
        gopher_repetition_metrics,
        gopher_repetition_passes,
    )
    from restructure_hdfs_topic_spark.plans.signals import (
        C4_SIGNAL_RECIPE,
        GOPHER_SIGNAL_RECIPE,
        annotate_quality_signals,
        filter_by_signals,
    )

    edge = spark.createDataFrame(
        [
            (10_000_001, None),  # NULL text: C4 keeps, Gopher drops
            (10_000_002, ""),
            (10_000_003, "Lorem ipsum dolor sit amet filler. " * 12),
            (10_000_004, "Braces { appear } in prose sentences here. " * 12),
            (10_000_005, "One. Two. Three. Four."),  # <5 kept sentences
            (10_000_006, "no terminal punctuation on this line " * 12),
            # Multi-line pages exposing the F.filter(col, c4_line_keep)
            # index-as-min_words bug in BOTH directions: 2-word/2-sentence
            # fragments would be kept at low indices (bare binding uses
            # the line number as min_words) and push the page over 5
            # sentences; a 4-word line at index 7 (and 5-word lines
            # after) would wrongly FAIL and drop the page.
            (10_000_007, "Hi. Yo.\n" * 6),
            (
                10_000_008,
                ("x.\n" * 7)
                + "Four words right here.\n"
                + "Five more words land here.\n" * 5,
            ),
        ],
        "doc_id long, text string",
    )
    docs = _docs(spark).union(edge)
    annotated = annotate_quality_signals(docs)

    # Gopher (both table-A1 halves).
    met = gopher_metrics(F.col("text"))
    want_gopher = {
        r["doc_id"]
        for r in gopher_repetition_metrics(
            docs.select("doc_id", "text", *[c.alias(n) for n, c in met])
        )
        .filter(
            gopher_passes(*[F.col(n) for n, _ in met])
            & gopher_repetition_passes()
        )
        .collect()
    }
    got_gopher = {
        r["doc_id"]
        for r in filter_by_signals(annotated, GOPHER_SIGNAL_RECIPE).collect()
    }
    assert got_gopher == want_gopher and want_gopher

    # C4 page drops (the line-level rewrite is a transformation, so the
    # witness compares SURVIVOR ID SETS, which the page rules decide).
    want_c4 = {r["doc_id"] for r in c4_clean(docs).collect()}
    got_c4 = {
        r["doc_id"]
        for r in filter_by_signals(annotated, C4_SIGNAL_RECIPE).collect()
    }
    assert got_c4 == want_c4 and want_c4
    # The planted edges land on the intended sides.
    assert 10_000_001 in got_c4 and 10_000_001 not in got_gopher
    assert {10_000_003, 10_000_004, 10_000_005, 10_000_006} & got_c4 == set()
    assert 10_000_007 not in got_c4  # index-as-min_words would keep it
    assert 10_000_008 in got_c4  # index-as-min_words would drop it
