"""Incremental corpus dedup: novelty filter semantics (DuckDB
cross-check), commit-after-store ingest protocol, idempotent reruns,
state round-trips, partitioning independence."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.operators.incremental import (
    commit_fingerprints,
    document_fingerprints,
    filter_novel_documents,
    ingest_batch,
    read_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_filter_novel_semantics(spark):
    """Keep-first within the batch; drop anything the state already
    fingerprints; pass original columns through."""
    corpus = _docs(spark, [(1, "alpha"), (2, "beta")])
    state = document_fingerprints(corpus)
    batch = _docs(
        spark,
        [
            (10, "alpha"),   # dup of corpus -> dropped
            (11, "gamma"),   # novel
            (12, "gamma"),   # in-batch dup -> dropped (11 wins)
            (13, "delta"),   # novel
        ],
    )
    got = sorted(r["doc_id"] for r in filter_novel_documents(batch, state).collect())
    assert got == [11, 13]


def test_filter_novel_duckdb_cross_check(spark):
    """Over the real documents table: fingerprint novelty == DuckDB's
    text-level anti-join + keep-min evaluation of the same split."""
    import duckdb

    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    sf_dir = "/root/testdata/sf0.01"
    configure(spark)
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    seen = docs.filter(F.col("doc_id") % 10 >= 4)
    batch = docs.filter(F.col("doc_id") % 10 < 4)
    got = sorted(
        r["doc_id"]
        for r in filter_novel_documents(
            batch, document_fingerprints(seen)
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [
        r[0]
        for r in con.execute(
            """
            WITH seen AS (SELECT text FROM documents WHERE doc_id % 10 >= 4),
                 batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 4)
            SELECT doc_id FROM batch b
            WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.text = b.text)
              AND doc_id = (SELECT min(doc_id) FROM batch b2 WHERE b2.text = b.text)
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want and got


def test_state_roundtrip_and_merge(spark, tmp_path):
    state_dir = str(tmp_path / "fps")
    assert read_fingerprints(spark, state_dir).count() == 0
    commit_fingerprints(
        spark, state_dir, document_fingerprints(_docs(spark, [(1, "a"), (2, "b")]))
    )
    assert read_fingerprints(spark, state_dir).count() == 2
    # Merge is union-distinct: overlapping recommit adds only the new one.
    commit_fingerprints(
        spark, state_dir, document_fingerprints(_docs(spark, [(3, "b"), (4, "c")]))
    )
    assert read_fingerprints(spark, state_dir).count() == 3


def test_ingest_batch_commit_after_store_and_idempotent(spark, tmp_path):
    state_dir = str(tmp_path / "fps")
    written: list[list] = []

    def write(df):
        written.append(sorted(r["doc_id"] for r in df.collect()))

    b1 = _docs(spark, [(1, "a"), (2, "b"), (3, "a")])
    stats = ingest_batch(spark, state_dir, b1, write)
    assert stats == {"batch_rows": 3, "accepted_rows": 2}
    assert written[-1] == [1, 2]

    # Re-offering the same batch (crash-before-commit replay) is a no-op.
    stats = ingest_batch(spark, state_dir, b1, write)
    assert stats["accepted_rows"] == 0 and written[-1] == []

    # Next increment: only genuinely new content survives.
    b2 = _docs(spark, [(10, "b"), (11, "c")])
    stats = ingest_batch(spark, state_dir, b2, write)
    assert stats["accepted_rows"] == 1 and written[-1] == [11]
    assert read_fingerprints(spark, state_dir).count() == 3

    # A write failure leaves the state uncommitted -> batch re-offers.
    b3 = _docs(spark, [(20, "d")])
    with pytest.raises(RuntimeError, match="sink down"):
        ingest_batch(
            spark, state_dir, b3, lambda df: (_ for _ in ()).throw(RuntimeError("sink down"))
        )
    assert read_fingerprints(spark, state_dir).count() == 3
    stats = ingest_batch(spark, state_dir, b3, write)
    assert stats["accepted_rows"] == 1


def test_filter_novel_partitioning_independent(spark):
    from pyspark.sql import functions as F

    from restructure_hdfs_topic_spark.sources.tables import configure, load_table

    configure(spark)
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    seen = docs.filter(F.col("doc_id") % 10 >= 4)
    batch = docs.filter(F.col("doc_id") % 10 < 4)
    a = sorted(
        r["doc_id"]
        for r in filter_novel_documents(batch, document_fingerprints(seen)).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in filter_novel_documents(
            batch.repartition(7), document_fingerprints(seen.repartition(3))
        ).collect()
    )
    assert a == b and a


def test_streaming_dedup_documents(spark, tmp_path):
    """Streaming flavor: each distinct text emitted at most once across
    micro-batches (cross-batch via checkpointed fingerprint state,
    in-batch via the kernel's running set)."""
    from restructure_hdfs_topic_spark.streaming.stateful import (
        streaming_dedup_documents,
    )

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    b1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]          # in-batch dup
    b2 = [(10, "beta"), (11, "gamma")]                      # cross-batch dup
    b3 = [(20, "alpha"), (21, "gamma"), (22, "delta")]      # replays + new
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/f{i}", mode="overwrite"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = (
        streaming_dedup_documents(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("doc_dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT doc_id, text FROM doc_dedup_out").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha", "beta", "delta", "gamma"]
    # First-delivery wins: the surviving ids are from each text's first batch.
    by_text = {r["text"]: r["doc_id"] for r in rows}
    assert by_text["alpha"] in (1, 3)  # batch-1 delivery (in-batch keep-first
    # is per-chunk order; both batch-1 ids are acceptable, batch-3's 20 is not)
    assert by_text["beta"] == 2 and by_text["gamma"] == 11 and by_text["delta"] == 22


def test_fingerprint_kernel_cross_chunk(spark):
    """Kernel-level: a fingerprint repeated across two Arrow chunks of the
    SAME micro-batch group is emitted once."""
    import pandas as pd

    from restructure_hdfs_topic_spark.streaming.stateful import (
        make_fingerprint_dedup_kernel,
    )

    class _State:
        def __init__(self):
            self._v = None
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v

    kernel = make_fingerprint_dedup_kernel("__fp")
    st = _State()
    chunks = [
        pd.DataFrame({"doc_id": [1, 2], "__fp": [100, 200]}),
        pd.DataFrame({"doc_id": [3, 4], "__fp": [100, 300]}),
    ]
    out = list(kernel(None, iter(chunks), st))
    ids = sorted(i for pdf in out for i in pdf["doc_id"])
    assert ids == [1, 2, 4]
    assert st.get == ([100, 200, 300],)
    # Second batch: state now filters everything seen.
    out2 = list(kernel(None, iter([pd.DataFrame({"doc_id": [9], "__fp": [200]})]), st))
    assert out2 == []


def test_near_dup_novelty_filter(spark, tmp_path):
    """Near-dup incremental path: batch docs near-duplicating the corpus
    (or a kept lower-id batch doc) are dropped; novel docs survive;
    signature state round-trips through the CAS store."""
    from restructure_hdfs_topic_spark.operators.incremental import (
        batch_minhash_signatures,
        commit_signatures,
        filter_novel_near_dup,
        read_signatures,
    )

    base = " ".join(f"tok{i}" for i in range(30)) + " the quick brown fox jumps over the lazy dog"
    corpus = _docs(spark, [(1, base), (2, "completely different content about spark plans and shuffles here")])
    state_dir = str(tmp_path / "nd")
    commit_signatures(spark, state_dir, batch_minhash_signatures(corpus))
    assert read_signatures(spark, state_dir).count() == 2

    near = base.replace("lazy", "sleepy")          # near-dup of corpus doc 1
    novel = "entirely new text with its own vocabulary and no overlap at all whatsoever"
    batch = _docs(
        spark,
        [
            (10, base),     # exact dup of corpus -> dropped (estimate 1.0)
            (11, near),     # near-dup of corpus -> dropped
            (12, novel),    # novel -> kept
            (13, novel),    # within-batch dup of 12 -> dropped (keep-first)
        ],
    )
    state = read_signatures(spark, state_dir)
    kept = sorted(
        r["doc_id"]
        for r in filter_novel_near_dup(batch, state, threshold=0.5).collect()
    )
    assert kept == [12]

    # Commit the survivor; re-offering the batch is then a no-op.
    survivors = batch.filter(batch.doc_id == 12)
    commit_signatures(spark, state_dir, batch_minhash_signatures(survivors))
    state = read_signatures(spark, state_dir)
    assert state.count() == 3
    kept2 = sorted(
        r["doc_id"]
        for r in filter_novel_near_dup(batch, state, threshold=0.5).collect()
    )
    assert kept2 == []


def test_streaming_near_dup_suppression(spark, tmp_path):
    """VERDICT r6 #8 (stretch): cross-batch NEAR-dup suppression on the
    streaming path — a later micro-batch's near-duplicate of an earlier
    batch's document is dropped, novel documents pass, and the signature
    state lives in the shared versioned store (not the checkpoint)."""
    from restructure_hdfs_topic_spark.streaming.stateful import (
        streaming_near_dup_sink,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "accepted")
    state = str(tmp_path / "sigstate")
    schema = "doc_id long, text string"

    base = " ".join(f"w{i} token{i} common{i}" for i in range(20))
    near = base + " tail"  # one appended word: shingle Jaccard ~ 0.95
    novel = "completely different content about spark streaming state stores"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        q = (
            stream.writeStream.foreachBatch(
                streaming_near_dup_sink(state, out, threshold=0.5)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame([(1, base)], schema).coalesce(1).write.parquet(f"{src}/f0")
    run_once()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}

    # Batch 2: a near-dup of doc 1 plus a genuinely novel doc.
    spark.createDataFrame(
        [(2, near), (3, novel)], schema
    ).coalesce(1).write.parquet(f"{src}/f1")
    run_once()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}  # near-dup 2 suppressed ACROSS batches

    # Replay safety: a fresh query over a WIPED checkpoint re-offers both
    # files; the shared signature store still filters everything out.
    import shutil

    shutil.rmtree(ckpt)
    run_once()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3]  # no duplicates appended on full replay


def test_streaming_curation_sink_e2e(spark, tmp_path):
    """The full streaming product path: HTML micro-batches in → stripped,
    Gopher-gated, cross-batch-deduped rows out, fingerprint state in the
    shared versioned store (wiped-checkpoint replay appends nothing)."""
    from restructure_hdfs_topic_spark.streaming.stateful import (
        streaming_curation_sink,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "accepted")
    state = str(tmp_path / "fpstate")
    schema = "doc_id long, text string"

    good_body = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field while morning light settles on the farm "
        "buildings and the river bends away toward the distant hills again "
        "with steady water and soft wind that carries the smell of rain "
        "while a small boat drifts past the old stone bridge and children "
        "wave from the bank as the ferryman turns slowly toward the dock"
    )
    good = f"<html><script>var x=1;</script><p>{good_body}</p></html>"
    junk = "<html><p>$$$ ### !!!</p></html>"  # fails the Gopher gate

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        q = (
            stream.writeStream.foreachBatch(
                streaming_curation_sink(state, out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame([(1, good), (2, junk)], schema).coalesce(1).write.parquet(
        f"{src}/f0"
    )
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in rows} == {1}  # junk gated out
    # HTML stripped by the sink: tags/script gone, body text intact.
    assert rows[0]["text"] == good_body

    # Batch 2: an exact duplicate of doc 1's html (new id) + a novel doc.
    good2_body = good_body.replace("fox", "hare").replace("river", "valley")
    spark.createDataFrame(
        [(3, good), (4, f"<html><p>{good2_body}</p></html>")], schema
    ).coalesce(1).write.parquet(f"{src}/f1")
    run_once()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 4}  # duplicate 3 suppressed ACROSS batches

    # Wiped checkpoint: the shared fingerprint store still filters all.
    import shutil

    shutil.rmtree(ckpt)
    run_once()
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 4]
