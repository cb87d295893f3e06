"""Ad-hoc core-count A/B profiler (r14, VERDICT r13 #1): times the named
queries at master local[$SPARK_GRAFT_CPUS] with the bench's confs and
prints one JSON line {query: [cold, warm...]} — run it twice (CPUS=32,
CPUS=8) back-to-back on a quiet host to read the scaling ratio without a
full 111-row bench.  Not driver contract."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARM = int(os.environ.get("SPARK_GRAFT_WARM_ITERS", "2"))


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    names = sys.argv[1:]
    spark = (
        SparkSession.builder.appName("profile_scale")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(2 * int(CPUS)))
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

    import gc

    qs = {**entry.queries(), **entry.extra_queries()}
    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(1 + WARM):
            obs = Observation()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
                "noop"
            ).mode("overwrite").save()
            _ = int(obs.get["rows"])
            samples.append(round(time.time() - t0, 3))
            gc.collect()
            spark.catalog.clearCache()
        out[name] = samples
        print(f"# {name} @ {CPUS} cpus: {samples}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": int(CPUS), "queries": out}))


if __name__ == "__main__":
    main()
