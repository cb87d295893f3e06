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
