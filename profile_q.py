"""Ad-hoc per-query profiler: times one query N times, prints the plan."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    names = sys.argv[1:]
    explain = os.environ.get("EXPLAIN", "0") == "1"
    spark = (
        SparkSession.builder.appName("profile")
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

    qs = {**entry.queries(), **entry.extra_queries()}
    for name in names:
        fn = qs[name]
        if explain:
            fn(spark, SF_DIR).explain("formatted")
        for i in range(3):
            t0 = time.time()
            obs = Observation()
            df = fn(spark, SF_DIR)
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
                "noop"
            ).mode("overwrite").save()
            rows = int(obs.get["rows"])
            print(f"{name} run{i}: {time.time()-t0:.3f}s rows={rows}", flush=True)


if __name__ == "__main__":
    main()
