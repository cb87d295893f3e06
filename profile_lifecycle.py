"""Step-level profiler for the r13 lifecycle bench rows: times each
operator call inside q_ivf_append_replay / q_ivf_lifecycle_chain /
q_corpus_forget so optimization targets the step that actually costs,
not the row total.  Ad-hoc tool (not part of the driver contract)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_t0 = [time.time()]


def tick(label: str) -> None:
    now = time.time()
    print(f"  {now - _t0[0]:7.3f}s  {label}", flush=True)
    _t0[0] = now


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("profile_lifecycle")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    warm = load_table(spark, SF_DIR, "events").limit(1000)
    warm.groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    warm.mapInPandas(lambda it: it, schema=warm.schema).write.format("noop").mode(
        "overwrite"
    ).save()
    entry._conf(spark)
    _t0[0] = time.time()

    which = set(sys.argv[1:]) or {"replay", "chain", "forget"}

    emb = entry._t(spark, SF_DIR, "embeddings")
    sf_tag = os.path.basename(os.path.normpath(SF_DIR))

    if "replay" in which:
        print("== ivf_append_replay steps ==", flush=True)
        from restructure_hdfs_topic_spark.operators import ivf_index as _ivx
        from restructure_hdfs_topic_spark.operators.ivf_index import (
            append_to_ivf_index,
            build_ivf_index,
            load_ivf_meta,
            query_ivf_index,
        )

        tmpl = f"/tmp/spark_graft_ivf_replay_{sf_tag}_tmpl"
        crashy = f"/tmp/spark_graft_ivf_replay_{sf_tag}_crashy"
        clean = f"/tmp/spark_graft_ivf_replay_{sf_tag}_clean"
        base = emb.filter(F.col("vec_id") % 3 != 0)
        extra = emb.filter(F.col("vec_id") % 3 == 0)
        _t0[0] = time.time()
        entry._artifact_template(
            spark,
            tmpl,
            {"kind": "ivf_replay_base", "n": int(base.count())},
            lambda: build_ivf_index(base, f"{tmpl}/idx", lloyd_iters=1),
        )
        tick("template check/build (incl. base.count)")
        for p in (crashy, clean):
            entry._copy_artifact(f"{tmpl}/idx", p)
        tick("copy 2 artifacts")

        real_publish = _ivx._write_meta_atomic

        def _boom(*_a, **_k):
            raise RuntimeError("simulated crash before publish")

        _ivx._write_meta_atomic = _boom
        try:
            append_to_ivf_index(extra, crashy)
        except RuntimeError:
            pass
        finally:
            _ivx._write_meta_atomic = real_publish
        tick("crashy append (crash before publish)")
        orphan_unreferenced = int(
            load_ivf_meta(spark, crashy).get("appends", []) == []
        )
        tick("load meta")
        meta = append_to_ivf_index(extra, crashy)
        tick("replay append")
        append_to_ivf_index(extra, clean)
        tick("clean append")
        union = _ivx._read_ivf_union(spark, meta, crashy, "assignments")
        n_union = union.count()
        tick("union count")
        n_dup = union.groupBy("id").count().filter(F.col("count") > 1).count()
        tick("dup count")
        queries = emb.filter(F.col("vec_id") % 20 == 0)
        got = sorted(
            map(
                tuple,
                query_ivf_index(spark, crashy, queries, k=5, nprobe=10).collect(),
            )
        )
        tick("query crashy")
        want = sorted(
            map(
                tuple,
                query_ivf_index(spark, clean, queries, k=5, nprobe=10).collect(),
            )
        )
        tick("query clean")

    if "chain" in which:
        print("== ivf_lifecycle_chain steps ==", flush=True)
        from restructure_hdfs_topic_spark.operators.ivf_index import (
            append_to_ivf_index,
            build_ivf_index,
            delete_ivf_vectors,
            query_ivf_index,
            vacuum_ivf_index,
        )

        tmpl = f"/tmp/spark_graft_ivf_chain_{sf_tag}_tmpl"
        path = f"/tmp/spark_graft_ivf_chain_{sf_tag}_run"
        _t0[0] = time.time()
        entry._artifact_template(
            spark,
            tmpl,
            {"kind": "ivf_chain_base", "n": int(emb.count())},
            lambda: build_ivf_index(emb, f"{tmpl}/idx", lloyd_iters=1),
        )
        tick("template check/build (incl. emb.count)")
        entry._copy_artifact(f"{tmpl}/idx", path)
        tick("copy artifact")
        delete_ivf_vectors(
            spark, path, emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
        )
        tick("delete #1")
        vacuum_ivf_index(spark, path)
        tick("vacuum")
        append_to_ivf_index(emb.filter(F.col("vec_id") % 7 == 3), path)
        tick("append")
        delete_ivf_vectors(
            spark, path, emb.filter(F.col("vec_id") % 5 == 1).select("vec_id")
        )
        tick("delete #2")
        queries = emb.filter(F.col("vec_id") % 20 == 0)
        query_ivf_index(spark, path, queries, k=5, nprobe=10).write.format(
            "noop"
        ).mode("overwrite").save()
        tick("serve (noop)")

    if "forget" in which:
        print("== corpus_forget steps ==", flush=True)
        from restructure_hdfs_topic_spark.corpus import Corpus
        from restructure_hdfs_topic_spark.operators.bm25_index import (
            build_bm25_index,
            corpus_fingerprint,
            query_bm25_index,
        )
        from restructure_hdfs_topic_spark.operators.incremental import ingest_batch
        from restructure_hdfs_topic_spark.operators.ivf_index import (
            build_ivf_index,
            query_ivf_index,
        )
        from restructure_hdfs_topic_spark.operators.retrieval import corpus_queries

        docs = entry._t(spark, SF_DIR, "documents").select("doc_id", "text")
        tmpl = f"/tmp/spark_graft_forget_{sf_tag}_tmpl"
        root = f"/tmp/spark_graft_forget_{sf_tag}_run"

        def _build_all():
            build_bm25_index(docs, f"{tmpl}/bm25", n_buckets=64)
            build_ivf_index(emb, f"{tmpl}/ivf", lloyd_iters=1)
            ingest_batch(
                spark,
                f"{tmpl}/state",
                docs,
                lambda accepted: accepted.write.mode("overwrite").parquet(
                    f"{tmpl}/accepted"
                ),
            )

        _t0[0] = time.time()
        fp = corpus_fingerprint(docs)
        tick("corpus_fingerprint(docs)")
        n_emb = int(emb.count())
        tick("emb.count()")
        entry._artifact_template(
            spark,
            tmpl,
            {"kind": "forget_base", **fp, "n_emb": n_emb},
            _build_all,
        )
        tick("template check/build")
        entry._copy_artifact(tmpl, root)
        tick("copytree")
        bm25_path, ivf_path = f"{root}/bm25", f"{root}/ivf"
        state, sink = f"{root}/state", f"{root}/accepted"

        kill_docs = docs.filter(F.col("doc_id") % 13 == 5)
        kill_vecs = emb.filter(F.col("vec_id") % 13 == 5)
        report = Corpus(kill_docs, id_col="doc_id").forget(
            bm25_path=bm25_path, state_dir=state
        )
        tick("forget bm25+state")
        report_ivf = Corpus(kill_vecs.select("vec_id"), id_col="vec_id").forget(
            ivf_path=ivf_path
        )
        tick("forget ivf")

        killed = kill_docs.select(F.col("doc_id").alias("__kill"))
        served_bm25 = query_bm25_index(
            spark,
            bm25_path,
            corpus_queries(docs.filter(F.col("doc_id") % 17 == 1)),
            k=10,
        )
        bm25_leaks = served_bm25.join(
            killed, served_bm25["doc_id"] == killed["__kill"]
        ).count()
        tick("bm25 serve + leak count")
        served_ivf = query_ivf_index(
            spark, ivf_path, emb.filter(F.col("vec_id") % 17 == 1), k=5, nprobe=10
        )
        ivf_leaks = served_ivf.join(
            killed, served_ivf["neighbor_id"] == killed["__kill"]
        ).count()
        tick("ivf serve + leak count")
        resub = kill_docs.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), F.col("text")
        )
        out = ingest_batch(
            spark,
            state,
            resub,
            lambda accepted: accepted.write.mode("append").parquet(sink),
        )
        tick("resub ingest_batch")
        n_kill = kill_docs.count()
        tick("kill count")


if __name__ == "__main__":
    main()
