"""Focused profiler: time build_bm25_index / append_bm25_segment /
delete_bm25_docs at sf0.1 with per-call Spark job counts (statusTracker).

Usage: python profile_bm25_build.py [reps]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.appName("profile_bm25_build")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table
    from restructure_hdfs_topic_spark.operators.bm25_index import (
        append_bm25_segment,
        build_bm25_index,
        delete_bm25_docs,
    )

    configure(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()  # warm scan
    st = spark.sparkContext.statusTracker()

    def jobs() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    base = "/tmp/profile_bm25_build"
    for i in range(reps):
        path = f"{base}/idx{i}"
        shutil.rmtree(path, ignore_errors=True)
        j0, t0 = jobs(), time.time()
        build_bm25_index(docs, path, n_buckets=16)
        t1, j1 = time.time(), jobs()
        append_bm25_segment(
            docs.withColumn("doc_id", F.col("doc_id") + 1000000), path
        )
        t2, j2 = time.time(), jobs()
        delete_bm25_docs(spark, path, docs.select("doc_id").limit(50))
        t3, j3 = time.time(), jobs()
        print(
            f"rep{i}: build {t1-t0:.2f}s ({j1-j0} jobs)  "
            f"append {t2-t1:.2f}s ({j2-j1} jobs)  "
            f"delete {t3-t2:.2f}s ({j3-j2} jobs)",
            flush=True,
        )


if __name__ == "__main__":
    main()
