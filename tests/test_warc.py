"""WARC source tests: spec round-trips for all three compression layouts,
per-record quarantine of hostile bytes, the charset cascade, and the full
crawl-in/shards-out trace where the original `documents` table is the
exact oracle for what comes back out of the WARC → strip_html chain.
"""

import gzip
import io
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} missing"
)


def _mk(records, **kw):
    from restructure_hdfs_topic_spark.sources.warc import warc_bytes

    return warc_bytes(records, **kw)


def test_parse_round_trip_all_layouts():
    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    recs = [
        {"uri": "https://a.com/1", "body": "<html>one</html>"},
        {"uri": "https://a.com/2", "body": "<html>two &amp; more</html>"},
        {"uri": "https://a.com/3", "body": b"\x00\x01", "content_type": "image/png"},
    ]
    member_gz = _mk(recs, gzip_per_record=True)
    plain = _mk(recs, gzip_per_record=False)
    whole_gz = io.BytesIO()
    with gzip.GzipFile(fileobj=whole_gz, mode="wb") as g:
        g.write(plain)

    for payload in (member_gz, plain, whole_gz.getvalue()):
        rows = list(parse_warc_records(payload))
        assert [r["decode_status"] for r in rows] == ["ok", "ok", "ok"]
        assert [r["target_uri"] for r in rows] == [
            "https://a.com/1",
            "https://a.com/2",
            "https://a.com/3",
        ]
        assert rows[0]["text"] == "<html>one</html>"
        assert rows[1]["text"] == "<html>two &amp; more</html>"
        assert rows[0]["http_status"] == 200
        assert rows[0]["payload"] is None  # textual: bytes ship once, as text
        # Binary payload ships as bytes with NULL text.
        assert rows[2]["text"] is None and rows[2]["payload"] == b"\x00\x01"
        assert rows[2]["content_type"] == "image/png"
        assert all(r["record_id"] for r in rows)
        assert all(r["warc_date"] == "2024-01-01T00:00:00Z" for r in rows)


def test_parse_quarantines_malformed_and_resyncs():
    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    good = _mk([{"uri": "https://a.com/ok", "body": "fine"}], gzip_per_record=False)
    # Record with an unparseable Content-Length, then a good record.
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: NaN\r\n\r\n"
        + good
    )
    rows = list(parse_warc_records(bad))
    assert [r["decode_status"] for r in rows] == ["bad_content_length", "ok"]
    assert rows[1]["target_uri"] == "https://a.com/ok"

    # Truncated body: one quarantine row, no crash.
    trunc = _mk([{"uri": "https://a.com/t", "body": "0123456789"}], gzip_per_record=False)
    rows = list(parse_warc_records(trunc[: len(trunc) - 16]))
    assert rows[-1]["decode_status"] == "truncated_body"

    # Pure garbage: one quarantine row.
    rows = list(parse_warc_records(b"this is not a warc file at all"))
    assert [r["decode_status"] for r in rows] == ["no_warc_records"]

    # Corrupt gzip: one quarantine row.
    rows = list(parse_warc_records(b"\x1f\x8b\x00\x00garbage"))
    assert [r["decode_status"] for r in rows] == ["bad_gzip"]


def test_charset_cascade():
    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    latin = "café ñandú".encode("latin-1")
    meta = '<meta charset="latin-1"><p>café</p>'.encode("latin-1")
    records = [
        # Charset from the HTTP header.
        {
            "uri": "https://a.com/h",
            "body": latin,
            "content_type": "text/html; charset=latin-1",
        },
        # No header charset: the <meta> probe decides.
        {"uri": "https://a.com/m", "body": meta, "content_type": "text/html"},
        # Lying header + invalid bytes: utf-8 replacement, never a crash.
        {
            "uri": "https://a.com/bad",
            "body": b"\xff\xfe broken",
            "content_type": "text/html; charset=utf-8",
        },
        # Unknown charset name falls through to utf-8.
        {
            "uri": "https://a.com/unk",
            "body": "plain".encode(),
            "content_type": "text/html; charset=no-such-enc",
        },
    ]
    rows = list(parse_warc_records(_mk(records)))
    assert rows[0]["text"] == "café ñandú"
    assert rows[1]["text"] == '<meta charset="latin-1"><p>café</p>'
    assert "broken" in rows[2]["text"] and "�" in rows[2]["text"]
    assert rows[3]["text"] == "plain"


def test_read_warc_distributed(spark, tmp_path):
    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    for k in range(3):
        recs = [
            {
                "uri": f"https://site{k}.com/p{i}",
                "body": f"<html><p>doc {k}-{i}</p></html>",
                "date": "2024-03-05T06:07:08Z",
            }
            for i in range(4)
        ]
        # One 404 and one non-response record that must be filtered out
        # by warc_responses_as_documents but visible in read_warc.
        recs.append(
            {"uri": f"https://site{k}.com/gone", "body": "nope", "status": 404}
        )
        recs.append(
            {
                "uri": f"https://site{k}.com/req",
                "body": "GET / HTTP/1.1",
                "warc_type": "request",
                "content_type": "text/plain",
            }
        )
        (d / f"part-{k}.warc.gz").write_bytes(_mk(recs))

    records = read_warc(spark, str(d))
    assert records.count() == 18
    by_status = {
        r["decode_status"]: r["cnt"]
        for r in records.groupBy("decode_status").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_status == {"ok": 18}

    docs = warc_responses_as_documents(records)
    rows = docs.collect()
    assert len(rows) == 12  # 404s and request records filtered
    assert all(r["doc_id"] is not None for r in rows)
    assert len({r["doc_id"] for r in rows}) == 12
    assert all(r["text"].startswith("<html>") for r in rows)
    assert all(str(r["fetched_at"]).startswith("2024-03-05") for r in rows)

    # Plan shape: the scan is binaryFile + ONE ArrowEvalPython-free
    # mapInPandas (no shuffle before the projection).
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_warc_to_shards_e2e(spark, tmp_path):
    """Crawl in, training shards out, with the ORIGINAL documents table as
    the oracle: wrap sf0.001 documents in HTML, serialize them as
    .warc.gz, run read_warc → warc_responses_as_documents → strip_html,
    and require the recovered text to equal strip_html applied directly
    to the same HTML (byte-for-byte) — then export shards and re-read."""
    import json

    from restructure_hdfs_topic_spark.corpus import Corpus
    from restructure_hdfs_topic_spark.functions.text import strip_html
    from restructure_hdfs_topic_spark.plans.export import export_jsonl_shards
    from restructure_hdfs_topic_spark.sources.tables import configure, load_table
    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    configure(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    base = {
        r["doc_id"]: f"<html><body><h1>t</h1><p>{r['text']}</p></body></html>"
        for r in docs.collect()
    }
    recs = [
        {"uri": f"https://corpus.test/doc/{i}", "body": html}
        for i, html in sorted(base.items())
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    half = len(recs) // 2
    (d / "a.warc.gz").write_bytes(_mk(recs[:half]))
    (d / "b.warc.gz").write_bytes(_mk(recs[half:]))

    ingested = warc_responses_as_documents(read_warc(spark, str(d)))
    got = {
        r["url"]: r["clean"]
        for r in ingested.select(
            "url", strip_html(F.col("text")).alias("clean")
        ).collect()
    }
    want = {
        f"https://corpus.test/doc/{i}": row
        for (i, html) in sorted(base.items())
        for row in [None]
    }
    # Oracle: strip_html over the identical HTML, straight from the table.
    direct = {
        f"https://corpus.test/doc/{r['doc_id']}": r["clean"]
        for r in spark.createDataFrame(
            [(i, h) for i, h in sorted(base.items())], "doc_id long, html string"
        )
        .select("doc_id", strip_html(F.col("html")).alias("clean"))
        .collect()
    }
    assert set(got) == set(direct) == set(want)
    assert got == direct

    # Chain into the curation facade and export loader shards.
    curated = Corpus(
        ingested.select(F.xxhash64("url").alias("doc_id"), "text"), text_col="text"
    ).strip_html()
    out = str(tmp_path / "shards")
    manifest = export_jsonl_shards(curated.df, out, n_shards=3)
    assert manifest.count() == 3
    back = []
    data = os.path.join(out, "data")
    for sh in sorted(s for s in os.listdir(data) if s.startswith("shard=")):
        for f in os.listdir(os.path.join(data, sh)):
            if f.startswith("part-"):
                with open(os.path.join(data, sh, f)) as fh:
                    back.extend(json.loads(ln) for ln in fh if ln.strip())
    assert len(back) == len(recs)
    assert {b["text"] for b in back} == set(direct.values())


def test_corpus_from_warc_facade(spark, tmp_path):
    from restructure_hdfs_topic_spark.corpus import Corpus

    d = tmp_path / "c"
    d.mkdir()
    (d / "x.warc.gz").write_bytes(
        _mk(
            [
                {"uri": "https://f.com/a", "body": "<html><p>alpha beta</p></html>"},
                {"uri": "https://f.com/b", "body": "<html><p>gamma</p></html>"},
            ]
        )
    )
    c = Corpus.from_warc(spark, str(d)).strip_html()
    rows = {r["url"]: r["text"] for r in c.df.collect()}
    assert rows == {"https://f.com/a": "alpha beta", "https://f.com/b": "gamma"}


def test_streaming_warc_curation(spark, tmp_path):
    """Live crawl path: .warc.gz files stream in (binaryFile source), each
    micro-batch runs strip_html → Gopher gate → incremental dedup vs the
    committed fingerprint store → parquet append.  A second crawl file
    re-serving the same pages must contribute nothing (cross-batch
    suppression), while its genuinely new page lands."""
    import time

    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc_stream,
        warc_responses_as_documents,
    )
    from restructure_hdfs_topic_spark.streaming.stateful import (
        streaming_curation_sink,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    body = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through fields of green grass while the sun shines brightly over "
        "the quiet valley where many small animals make their homes today. "
    ) * 3
    pages = [
        {"uri": f"https://s.test/p{i}", "body": f"<html><p>{body} page {i}</p></html>"}
        for i in range(4)
    ]
    (crawl / "batch1.warc.gz").write_bytes(_mk(pages))

    state = str(tmp_path / "state")
    out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = warc_responses_as_documents(
            read_warc_stream(spark, str(crawl), max_files_per_trigger=1)
        ).withColumn("doc_id", F.xxhash64("url"))
        q = (
            stream.writeStream.foreachBatch(
                streaming_curation_sink(state, out, use_bloom=True)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 == 4
    assert set(first.columns) >= {"doc_id", "url", "text"}
    # HTML is stripped in the sink.
    assert all("<p>" not in r["text"] for r in first.collect())

    # Second crawl file: three re-served pages + one new one.
    (crawl / "batch2.warc.gz").write_bytes(
        _mk(pages[:3] + [{"uri": "https://s.test/new", "body": f"<html><p>{body} brand new page</p></html>"}])
    )
    run_available()
    again = spark.read.parquet(out)
    assert again.count() == 5
    urls = {r["url"] for r in again.collect()}
    assert "https://s.test/new" in urls


def test_gzip_tail_damage_degrades_per_record():
    """A corrupt member or trailing garbage in a .warc.gz must not discard
    the records already decoded (review r8: whole-file quarantine broke
    the per-record degradation contract)."""
    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    two = _mk(
        [
            {"uri": "https://a.com/1", "body": "first page"},
            {"uri": "https://a.com/2", "body": "second page"},
        ],
        gzip_per_record=True,
    )
    # Trailing garbage after the last member.
    rows = list(parse_warc_records(two + b"\x00garbage-not-gzip\xff"))
    assert [r["target_uri"] for r in rows if r["decode_status"] == "ok"] == [
        "https://a.com/1",
        "https://a.com/2",
    ]
    # Corrupt middle member: the leading member's record survives.
    one = _mk([{"uri": "https://a.com/1", "body": "first page"}])
    corrupt = b"\x1f\x8b\x08\x00" + b"\x13" * 30
    rows = list(parse_warc_records(one + corrupt + one))
    ok = [r["target_uri"] for r in rows if r["decode_status"] == "ok"]
    assert ok and ok[0] == "https://a.com/1"


def test_missing_record_id_gets_distinct_doc_ids(spark, tmp_path):
    """Records without WARC-Record-ID must not collapse onto one doc_id
    (review r8: xxhash64('') was shared by every id-less page)."""
    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    def record_no_id(uri, body):
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body.encode()
        hdr = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return hdr + http + b"\r\n\r\n"

    raw = record_no_id("https://x.test/a", "<p>alpha</p>") + record_no_id(
        "https://x.test/b", "<p>beta</p>"
    )
    d = tmp_path / "noid"
    d.mkdir()
    (d / "f.warc").write_bytes(raw)
    docs = warc_responses_as_documents(read_warc(spark, str(d))).collect()
    assert len(docs) == 2
    assert len({r["doc_id"] for r in docs}) == 2


def test_same_basename_different_dirs_distinct_ids(spark, tmp_path):
    """Review r8 #2: crawl layouts reuse basenames across directories —
    id-less captures in crawl-01/part-0.warc.gz and
    crawl-02/part-0.warc.gz must not share a doc_id."""
    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    def record_no_id(uri, body):
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body.encode()
        hdr = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return hdr + http + b"\r\n\r\n"

    # SAME uri, SAME record index, SAME file basename — only the
    # directory differs (a re-crawl of one seed page).
    raw = record_no_id("https://seed.test/", "<p>capture</p>")
    for sub in ("crawl-01", "crawl-02"):
        d = tmp_path / sub
        d.mkdir()
        (d / "part-0.warc").write_bytes(raw)
    docs = warc_responses_as_documents(
        read_warc(spark, [str(tmp_path / "crawl-01"), str(tmp_path / "crawl-02")])
    ).collect()
    assert len(docs) == 2
    assert len({r["doc_id"] for r in docs}) == 2


def test_empty_valid_gzip_is_not_corruption():
    """Review r8 #8: a legitimately empty .warc.gz (valid gzip member,
    zero bytes) yields NO rows — not a spurious bad_gzip quarantine."""
    import gzip as _gzip
    import io as _io

    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    buf = _io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb") as g:
        g.write(b"")
    assert list(parse_warc_records(buf.getvalue())) == []
    # Corruption still quarantines.
    assert [r["decode_status"] for r in parse_warc_records(b"\x1f\x8b\x00\x00junk")] == ["bad_gzip"]


def test_read_warc_oversize_file_quarantined(spark, tmp_path):
    """VERDICT r8 missing-#2: a file over the binaryFile byte cap must
    surface as ONE loud `file_too_large` row (listing-side, bytes never
    read) instead of an opaque task failure.  Exercised via a lowered
    `max_bytes` (a real 2 GiB fixture is not writable here)."""
    from restructure_hdfs_topic_spark.sources.warc import read_warc, warc_bytes

    small = warc_bytes([{"uri": "https://a.com/ok", "body": "fine"}])
    fat = warc_bytes(
        [{"uri": "https://a.com/fat", "body": "x" * 4096}], gzip_per_record=False
    )
    (tmp_path / "small.warc.gz").write_bytes(small)
    (tmp_path / "fat.warc").write_bytes(fat)
    assert len(fat) > 600 >= len(small)

    rows = read_warc(spark, str(tmp_path), max_bytes=600).collect()
    by_status = {r["decode_status"]: r for r in rows}
    assert set(by_status) == {"ok", "file_too_large"}
    big = by_status["file_too_large"]
    assert big["file"].endswith("fat.warc") and big["record_ix"] == 0
    assert big["text"] is None and big["payload"] is None
    # Default cap: both files parse normally.
    assert {
        r["decode_status"] for r in read_warc(spark, str(tmp_path)).collect()
    } == {"ok"}


def test_warc_crawl_health_complement(spark, tmp_path):
    """warc_noncontent_records is the exact complement of
    warc_responses_as_documents, and warc_crawl_health rolls it up by
    (warc_type, status_class, decode_status)."""
    from restructure_hdfs_topic_spark.sources.warc import (
        read_warc,
        warc_crawl_health,
        warc_noncontent_records,
        warc_responses_as_documents,
        warc_bytes,
    )

    payload = warc_bytes(
        [
            {"uri": "https://a.com/ok", "body": "<html>keep</html>"},
            {"uri": "https://a.com/moved", "body": "", "status": 301},
            {"uri": "https://a.com/gone", "body": "nope", "status": 404},
            {"uri": "https://a.com/seen", "body": "", "warc_type": "revisit"},
            {
                "uri": "https://a.com/img",
                "body": b"\x89PNG",
                "content_type": "image/png",
            },
        ]
    )
    bad = gzip.compress(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\n"
    )
    (tmp_path / "crawl.warc.gz").write_bytes(payload + bad)

    records = read_warc(spark, str(tmp_path))
    total = records.count()
    docs = warc_responses_as_documents(records)
    dropped = warc_noncontent_records(records)
    assert docs.count() + dropped.count() == total == 6
    assert [r["url"] for r in docs.collect()] == ["https://a.com/ok"]

    health = {
        (r["warc_type"], r["status_class"], r["decode_status"]): (
            r["n_records"],
            r["n_urls"],
        )
        for r in warc_crawl_health(records).collect()
    }
    assert health[("response", "3xx", "ok")] == (1, 1)
    assert health[("response", "4xx", "ok")] == (1, 1)
    assert health[("revisit", "2xx", "ok")] == (1, 1)
    assert health[("response", "2xx", "ok")] == (1, 1)  # the binary 200
    assert health[(None, None, "bad_content_length")] == (1, 0)


def test_corpus_crawl_health_facade(spark, tmp_path):
    from restructure_hdfs_topic_spark.corpus import Corpus
    from restructure_hdfs_topic_spark.sources.warc import warc_bytes

    (tmp_path / "c.warc.gz").write_bytes(
        warc_bytes(
            [
                {"uri": "https://a.com/ok", "body": "keep"},
                {"uri": "https://a.com/moved", "body": "", "status": 302},
            ]
        )
    )
    rows = Corpus.crawl_health(spark, str(tmp_path)).collect()
    assert {(r["status_class"], r["n_records"]) for r in rows} == {("3xx", 1)}


def test_warc_resync_ignores_quoted_magic_in_body(tmp_path):
    """Review r9: the malformed-record resync must only adopt a 'WARC/'
    magic at a record boundary (payload start or after CRLF CRLF) — a
    truncated record whose partial body QUOTES a WARC header mid-line
    (page text about the format, WARC-in-WARC) must not become a phantom
    'ok' document."""
    from restructure_hdfs_topic_spark.sources.warc import parse_warc_records

    quoted = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"see WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        b"https://evil.test/phantom\r\nContent-Length: 2\r\n\r\nhi"
    )
    trunc = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:t>\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 999999\r\n\r\n" + quoted
    )
    rows = list(parse_warc_records(trunc))
    assert [r["decode_status"] for r in rows] == ["truncated_body"]
    assert all(r["target_uri"] != "https://evil.test/phantom" for r in rows)


def test_warc_parser_terminates_on_arbitrary_bytes():
    """Property fuzz (after ADVICE r8 #1's infinite loop): the parser
    must TERMINATE on arbitrary bytes, yield a bounded number of rows
    (each consumes input or ends the scan), and never raise."""
    from hypothesis import given, settings, strategies as st

    from restructure_hdfs_topic_spark.sources.warc import (
        parse_warc_records,
        warc_bytes,
    )

    good = warc_bytes(
        [{"uri": "https://a.com/x", "body": "ok body here"}],
        gzip_per_record=False,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.binary(max_size=400),
        st.integers(0, len(good)),
        st.integers(0, len(good)),
    )
    def fuzz(noise, cut_a, cut_b):
        lo, hi = sorted((cut_a, cut_b))
        # Interleave garbage with real record fragments — worst case for
        # the resync scanner.
        payload = good[:lo] + noise + good[lo:hi] + noise + good[hi:]
        rows = list(parse_warc_records(payload))
        # Bounded: each yielded row consumes at least the 'WARC/' magic.
        assert len(rows) <= payload.count(b"WARC/") + 1
        for r in rows:
            assert r["decode_status"] is not None

    fuzz()
