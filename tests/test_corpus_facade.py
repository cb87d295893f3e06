"""Corpus facade: each chainable step delegates to its tested operator —
verify the chain composes lazily and matches calling the operators
directly."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.corpus import Corpus


def _docs(spark):
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    return load_table(spark, "/root/testdata/sf0.01", "documents")


def test_chain_matches_direct_operators(spark):
    docs = _docs(spark)
    chained = (
        Corpus(docs)
        .normalize()
        .strip_duplicated_lines()
        .near_dup_drop(threshold=0.5)
        .df
    )
    from restructure_hdfs_topic_spark.functions.text import normalize_text
    from restructure_hdfs_topic_spark.operators.dedup import (
        lsh_near_dup_pairs,
        strip_duplicated_lines,
    )

    direct = docs.withColumn("text", normalize_text(F.col("text")))
    direct = strip_duplicated_lines(direct, "doc_id", "text", 2)
    pairs = lsh_near_dup_pairs(direct, "doc_id", "text", threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    direct = direct.join(losers, on="doc_id", how="left_anti")
    a = sorted((r["doc_id"], r["text"]) for r in chained.collect())
    b = sorted((r["doc_id"], r["text"]) for r in direct.collect())
    assert a == b


def test_exact_dedup_and_terminals(spark):
    rows = [(1, "s", "same text"), (2, "s", "same text"), (3, "t", "other words")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    c = Corpus(df).exact_dedup()
    assert sorted(r["doc_id"] for r in c.df.collect()) == [1, 3]
    prof = {r["source"]: r["n_docs"] for r in c.profile().collect()}
    assert prof == {"s": 1, "t": 1}
    emb = c.embed(dim=8).collect()
    assert len(emb) == 2 and all(len(r["vec"]) == 8 for r in emb)
    manifest = c.pack(budget=4).collect()
    assert {r[0] for r in manifest} == {1, 3}


def test_token_budget_and_mixture(spark):
    rows = [(i, f"s{i % 2}", f"w{i} " * 5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    tb = Corpus(df).token_budget_sample({"s0": 50, "s1": 10_000}).df
    assert "__n_tokens" not in tb.columns
    n0 = tb.filter(F.col("source") == "s0").count()
    assert 0 < n0 < 50  # 50-token budget over 5-token docs ~ 10 docs
    assert tb.filter(F.col("source") == "s1").count() == 50
    mx = Corpus(df).mixture_sample({"s0": 1, "s1": 1}).df
    assert mx.count() > 0


def test_r7_methods_match_direct_operators(spark):
    """temperature_sample / perplexity_gate / strip_repeated_paragraphs /
    decontaminate / epoch_shuffle delegate verbatim."""
    docs = _docs(spark)
    from restructure_hdfs_topic_spark.functions.text import tokens
    from restructure_hdfs_topic_spark.operators.dedup import (
        decontaminate_spans,
        strip_repeated_paragraphs,
    )
    from restructure_hdfs_topic_spark.operators.lm import perplexity_filter
    from restructure_hdfs_topic_spark.operators.packing import epoch_shuffle
    from restructure_hdfs_topic_spark.operators.sampling import temperature_sample

    c = Corpus(docs)

    a = sorted(r["doc_id"] for r in c.temperature_sample(alpha=0.3).df.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(docs, "doc_id", "source", 0.3).collect()
    )
    assert a == b and a

    a = sorted(
        (r["doc_id"], r["bits_per_token"])
        for r in c.perplexity_gate(max_bits=4.91).df.collect()
    )
    b = sorted(
        (r["doc_id"], r["bits_per_token"])
        for r in perplexity_filter(
            docs, tokens(F.col("text")), "doc_id", max_bits=4.91
        ).collect()
    )
    assert a == b and a

    a = sorted(
        (r["doc_id"], r["text"])
        for r in c.strip_repeated_paragraphs().df.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in strip_repeated_paragraphs(docs, "doc_id", "text").collect()
    )
    assert a == b

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    a = sorted(
        (r["doc_id"], r["text"])
        for r in c.decontaminate(bench, n=5).df.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in decontaminate_spans(docs, bench, "doc_id", "text", 5).collect()
    )
    assert a == b

    a = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in c.epoch_shuffle(n_shards=4, seed=1).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_shuffle(docs, "doc_id", 4, 1).collect()
    )
    assert a == b


def test_unit_span_and_classifier_methods_delegate(spark):
    from restructure_hdfs_topic_spark.operators.classifier import (
        quality_classifier_gate,
        train_quality_classifier,
    )
    from restructure_hdfs_topic_spark.operators.dedup import (
        strip_duplicated_unit_spans,
    )

    docs = _docs(spark).withColumn(
        "text", F.regexp_replace("text", " ", "\n")
    ).select("doc_id", "source", "text")
    a = sorted(
        (r["doc_id"], r["text"])
        for r in Corpus(docs).strip_duplicated_unit_spans(sep="\n", k=3).df.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in strip_duplicated_unit_spans(docs, "doc_id", "text", "\n", 3).collect()
    )
    assert a == b

    labeled = _docs(spark).withColumn(
        "label", (F.col("lang") == "en").cast("int")
    ).select("doc_id", "text", "label")
    model = train_quality_classifier(labeled, dim=64, max_iter=8)
    plain = _docs(spark)
    a = sorted(
        (r["doc_id"], r["score"])
        for r in Corpus(plain).quality_classifier_gate(model, 0.5).df.collect()
    )
    b = sorted(
        (r["doc_id"], r["score"])
        for r in quality_classifier_gate(plain, model, 0.5).collect()
    )
    assert a == b


def test_bm25_methods_delegate(spark, tmp_path):
    docs = _docs(spark)
    from restructure_hdfs_topic_spark.operators.bm25_index import query_bm25_index
    from restructure_hdfs_topic_spark.operators.retrieval import (
        bm25_topk,
        corpus_queries,
    )

    qs = corpus_queries(docs, sample_mod=101)
    direct = sorted(map(tuple, bm25_topk(docs, qs, k=3).collect()))
    via_facade = sorted(map(tuple, Corpus(docs).bm25_search(qs, k=3).collect()))
    assert via_facade == direct and direct

    path = str(tmp_path / "bm25idx")
    meta = Corpus(docs).build_bm25_index(path, n_buckets=8)
    assert meta["n_docs"] > 0
    served = sorted(map(tuple, query_bm25_index(spark, path, qs, k=3).collect()))
    assert served == direct

    # Facade append delegates: after appending a disjoint batch, serving
    # equals the direct path over the concatenated corpus.
    extra = spark.createDataFrame(
        [(1_000_001, "alpha zulu zulu"), (1_000_002, "zulu beta")],
        "doc_id long, text string",
    )
    meta2 = Corpus(extra).append_bm25_segment(path)
    assert meta2["version"] == 1 and len(meta2["segments"]) == 1
    both = docs.select("doc_id", "text").unionByName(extra)
    direct2 = sorted(map(tuple, bm25_topk(both, qs, k=3).collect()))
    served2 = sorted(map(tuple, query_bm25_index(spark, path, qs, k=3).collect()))
    assert served2 == direct2


def test_profile_prune_unimax_composed_e2e(spark):
    """VERDICT r10 stretch #8: the facade's newest methods in one
    composed pipeline — profile the corpus, D4-prune the most
    prototypical quarter per cluster, UniMax-realize half the surviving
    token mass with a 2-epoch cap — with delegation equality for the
    prune step and the UniMax budget/cap invariants on the output."""
    from restructure_hdfs_topic_spark.functions.text import token_count
    from restructure_hdfs_topic_spark.operators.similarity import prototype_prune

    docs = _docs(spark)
    corpus = Corpus(docs)

    # 1. Profile: one row per source, token totals the budget derives from.
    prof = {r["source"]: r for r in corpus.profile().collect()}
    assert prof and all(r["n_docs"] > 0 for r in prof.values())

    # 2. Prune (facade) == prune (direct operators), row-identical.
    pruned = corpus.prototype_prune(drop_frac=0.25, n_clusters=8)
    got_ids = {r["doc_id"] for r in pruned.df.select("doc_id").collect()}
    emb = corpus.embed(dim=64)
    flags = prototype_prune(emb, drop_frac=0.25, n_clusters=8,
                            id_col="id", vec_col="vec")
    want_ids = {r["id"] for r in flags.filter(F.col("kept")).collect()}
    n_input = docs.count()
    assert got_ids == want_ids
    assert 0 < len(got_ids) < n_input

    # 3. UniMax over the survivors: half their token mass, <=2 epochs.
    counted = pruned.df.withColumn("n_tokens", token_count(F.col("text")))
    total = counted.agg(F.sum("n_tokens")).collect()[0][0]
    out = Corpus(counted).unimax_sample(int(total) // 2, max_epochs=2)
    rows = out.collect()
    assert rows
    assert {r["doc_id"] for r in rows} <= got_ids
    assert all(r["epoch"] <= 2 for r in rows)
    # Realized mass stays at or under budget + one boundary doc per
    # stratum (the prefix-realization contract).
    realized = sum(r["n_tokens"] for r in rows)
    max_doc = counted.agg(F.max("n_tokens")).collect()[0][0]
    assert realized <= int(total) // 2 + len(prof) * int(max_doc)
