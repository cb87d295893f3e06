"""RefinedWeb line-wise corrections: rule semantics, byte-exact line
rebuild, the whole-document drop rule, and a DuckDB cross-check that
re-derives the full operator independently."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} missing"
)


def test_line_rules_semantics(spark):
    from restructure_hdfs_topic_spark.functions.text import line_corrections

    body = "this line is perfectly ordinary prose kept as is"
    cases = [
        # (line, should_be_removed)
        ("HOME | ABOUT | CONTACT US", True),       # mainly uppercase
        ("42", True),                               # only numerical
        ("3 likes", True),                          # counter
        ("17 Comments", True),                      # counter, case-insensitive
        ("Login", True),                            # single word
        ("", False),                                # empty lines keep spacing
        (body, False),
        ("Read more about the topic here", False),  # multiword prose survives
        ("version 2.0 of the spec", False),         # digits inside prose
    ]
    # One document per case: body padding keeps every doc under the 5%
    # removal cap so the DOC survives and we observe the LINE effect.
    pad = "\n".join([body] * 400)
    df = spark.createDataFrame(
        [(i, f"{line}\n{pad}") for i, (line, _) in enumerate(cases)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in line_corrections(df).collect()}
    for i, (line, removed) in enumerate(cases):
        got = out[i]
        if removed:
            assert not got.startswith(line + "\n"), (i, line)
            assert got == pad, (i, line)
        else:
            assert got == f"{line}\n{pad}", (i, line)


def test_document_drop_rule(spark):
    from restructure_hdfs_topic_spark.functions.text import line_corrections

    good = "a sentence of regular prose that carries the page"
    heavy = "\n".join(["NAVIGATION MENU"] * 10 + [good])      # mostly removed
    light = "\n".join([good] * 50 + ["NAVIGATION MENU"])       # < 5% removed
    df = spark.createDataFrame(
        [(1, heavy), (2, light), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in line_corrections(df).collect()}
    assert 1 not in out  # removal ratio far above the cap → dropped
    assert 2 in out and "NAVIGATION MENU" not in out[2]  # line stripped, doc kept
    assert out[2].count(good) == 50  # prose lines byte-exact
    assert out[3] == ""  # empty text survives untouched
    assert 4 in out  # NULL text must not crash or drop the row


def test_line_corrections_duckdb_cross_check(spark):
    """The full operator (line strip + doc drop) equals an independent
    DuckDB re-derivation over synthetic boilerplate-injected documents."""
    from restructure_hdfs_topic_spark.functions.text import line_corrections
    from restructure_hdfs_topic_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0, F.lit("MENU | HOME")).otherwise(
                F.lit("a first line of fine prose")
            ),
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("12 likes")).otherwise(
                F.lit("closing line of fine prose")
            ),
        ).alias("text"),
    )
    got = {
        (r["doc_id"], r["text"]) for r in line_corrections(docs).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = set(
        map(
            tuple,
            con.execute(
                r"""
WITH built AS (
    SELECT doc_id,
           concat_ws(chr(10),
               CASE WHEN doc_id % 3 = 0 THEN 'MENU | HOME'
                    ELSE 'a first line of fine prose' END,
               text,
               CASE WHEN doc_id % 5 = 0 THEN '12 likes'
                    ELSE 'closing line of fine prose' END) AS text
    FROM documents
), lines AS (
    SELECT doc_id, string_split(text, chr(10)) AS ls FROM built
), flagged AS (
    SELECT doc_id, ls,
           list_transform(ls, l -> (
               ((length(l) - length(regexp_replace(l, '[A-Za-z]', '', 'g'))) >= 1
                AND 2 * (length(l) - length(regexp_replace(l, '[A-Z]', '', 'g')))
                    > (length(l) - length(regexp_replace(l, '[A-Za-z]', '', 'g'))))
               OR ((length(l) - length(regexp_replace(l, '[A-Za-z]', '', 'g'))) = 0
                   AND regexp_matches(trim(l), '^[0-9][0-9 .,:%/\-]*$'))
               OR regexp_matches(lower(trim(l)),
                   '^[0-9]+ (likes?|comments?|shares?|views?|points?|votes?|upvotes?|replies|retweets?)$')
               OR (length(trim(l)) > 0 AND NOT regexp_matches(trim(l), '\s'))
           )) AS fl
    FROM lines
), agg AS (
    SELECT doc_id,
           array_to_string(
               [ls[i] FOR i IN generate_series(1, len(ls)) IF NOT fl[i]],
               chr(10)) AS cleaned,
           coalesce(list_sum([length(ls[i]) FOR i IN generate_series(1, len(ls)) IF fl[i]]), 0) AS removed,
           coalesce(list_sum(list_transform(ls, l -> length(l))), 0) AS total
    FROM flagged
)
SELECT doc_id, cleaned AS text
FROM agg
WHERE total = 0 OR removed <= 0.05 * total
"""
            ).fetchall(),
        )
    )
    assert got == want and got


def test_facade_and_curation_wiring(spark):
    from restructure_hdfs_topic_spark.corpus import Corpus
    from restructure_hdfs_topic_spark.functions.text import line_corrections
    from restructure_hdfs_topic_spark.plans.curation import curate_corpus
    from restructure_hdfs_topic_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200).withColumn(
        "text", F.concat(F.lit("SITE NAV BAR\n"), F.col("text"))
    )
    direct = {r["doc_id"] for r in line_corrections(docs).collect()}
    chained = {r["doc_id"] for r in Corpus(docs).line_corrections().df.collect()}
    assert direct == chained

    # curate_corpus stage 0: with the flag, the boilerplate line is gone
    # before the gates; manifest still forms.
    manifest = curate_corpus(docs, line_corrections_ratio=0.5)
    assert manifest.count() > 0
