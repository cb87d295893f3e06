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

BENCH_QUERIES = [
    "restructure_flagship",
    "event_time_extraction",
    "time_binning",
    "sanitize_ids",
    "filename_parse",
    "offset_assign",
    "dedup_keep_last",
    "dedup_exact",
    "offset_interval_merge",
    "offset_interval_remove",
    "seen_file_filter",
    "seen_record_filter",
    "cleaner_verify",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "text_token_count",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "simhash",
    "ann_lsh_topk",
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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
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
        rows = int(obs.get["rows"])
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({rows} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
