"""End-to-end "crawl in, training shards out" trace (VERDICT r6 #4).

The product story in one test: raw HTML documents → ``strip_html`` →
quality gate → span scrub → near-dup drop → token counts → hash-sharded
JSONL export with manifest — then the shards are read BACK from disk and
compared byte-for-byte against the curated frame, and the manifest's
row/token totals are re-derived from the on-disk bytes.  The reference
analogue is the full ``restructure`` trace (SURVEY §3.1): source records
in, partitioned tree + accounting out, verified by re-reading the tree.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} missing"
)


def _html_corpus(spark):
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    docs = load_table(spark, SF_DIR, "documents")
    # Wrap every document in realistic HTML: boilerplate script, heading,
    # paragraph structure, named + numeric + author-escaped entities.
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("<html><head><script>var x='</p>';</script></head><body>"),
            F.lit("<h1>"), F.col("source"), F.lit("</h1><p>"),
            F.col("text"),
            F.lit(" &#8212; footer &amp;copy; &#x24;5</p></body></html>"),
        ).alias("text"),
    )


def test_html_to_shards_round_trip(spark, tmp_path):
    from restructure_hdfs_topic_spark.corpus import Corpus
    from restructure_hdfs_topic_spark.functions.text import token_count

    curated = (
        Corpus(_html_corpus(spark))
        .strip_html()
        .gopher_gate()
        .strip_duplicated_spans(k=8)
        .near_dup_drop(threshold=0.5)
    )
    out = str(tmp_path / "shards")
    n_shards = 5
    manifest = Corpus(curated.df).export_shards(out, n_shards=n_shards)

    # --- curated frame (ground truth for the round trip) ---
    want = {r["doc_id"]: r["text"] for r in curated.df.collect()}
    assert want, "pipeline must keep at least one document"
    # HTML really was stripped and entities decoded
    sample = next(iter(want.values()))
    assert "<" not in sample and "&#8212;" not in sample
    assert "— footer &copy; $5" in sample

    # --- manifest invariants ---
    mrows = manifest.collect()
    assert [r["shard"] for r in mrows] == sorted(r["shard"] for r in mrows)
    assert {r["shard"] for r in mrows} <= set(range(n_shards))
    assert sum(r["n_rows"] for r in mrows) == len(want)

    # --- on-disk shard bytes round-trip ---
    back = spark.read.json(f"{out}/data")
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == want

    # Each shard directory holds exactly one data file (one task per shard)
    for r in mrows:
        d = os.path.join(out, "data", f"shard={r['shard']}")
        files = [n for n in os.listdir(d) if n.startswith("part-")]
        assert len(files) == 1

    # Manifest token totals re-derive from the on-disk bytes.
    disk_tokens = {
        r["shard"]: r["t"]
        for r in back.groupBy("shard")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    for r in mrows:
        assert disk_tokens.get(int(r["shard"]), 0) == r["n_tokens"]

    # The manifest on disk matches the returned manifest.
    mdisk = spark.read.json(f"{out}/manifest")
    disk = {(r["shard"], r["n_rows"], r["n_tokens"]) for r in mdisk.collect()}
    assert disk == {(r["shard"], r["n_rows"], r["n_tokens"]) for r in mrows}
