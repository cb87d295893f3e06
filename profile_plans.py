"""Capture .explain('formatted') for named bench queries into
plans/r13/<name>_<tag>.txt (guide §1: record the plan shape — Exchange
count, join strategy, PushedFilters/ReadSchema, Python eval nodes —
before and after each optimization).  Ad-hoc tool, not driver contract.

Usage: python profile_plans.py <tag> [query ...]
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("profile_plans")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    qs = {**entry.queries(), **entry.extra_queries()}
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture builds that fail, keep going
            text = f"ERROR capturing plan: {exc}\n"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
