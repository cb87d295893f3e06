"""Sequence packing: assign documents to fixed-token-budget training
sequences (GPT-style concat-and-chunk batch prep).

A training pipeline tokenizes documents, concatenates them in a
deterministic order, and slices the stream into fixed-length sequences
("packs"); every document therefore has a start offset in the stream and a
first pack, and may span several packs.  A global concatenation order would
need a total sort, so documents are first hash-routed into buckets (Knuth
multiplicative hash — the same engine-reproducible scheme as
operators/sampling.py) and each bucket is packed independently:

  bucket    = (id * 2654435761) mod 2^32 mod n_buckets
  start_off = exclusive running sum of n_tokens within the bucket,
              ordered by (hash, id)
  pack      = start_off div budget           (within the bucket)

Scale shape: ONE hash shuffle on ``bucket``; each bucket is an independent
window cumsum (Spark external-sorts a bucket's rows inside its task).
``n_buckets`` should scale with the cluster — at 100 TB pick
total_tokens / (budget * packs_per_task) so a bucket's sort fits a task;
hash routing makes bucket skew statistically impossible.  All arithmetic is
int64-exact, so results are engine- and partitioning-independent (no
floating point anywhere).

The hash is ``operators.sampling.hash_bucket`` — the overflow-safe 16-bit
split form, bit-identical to ``id * KNUTH mod 2^32`` in unbounded
arithmetic, so the DuckDB oracle can use the plain multiplicative
expression for any id domain DuckDB's int64 covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.operators.sampling import KNUTH, hash_bucket

M32 = 2**32


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 16,
    carry_cols: tuple = (),
) -> DataFrame:
    """Per-document pack assignment: ``(id, [carry_cols...], bucket,
    start_off, pack_id, n_tokens, n_packs_spanned)``.

    ``pack_id`` is globalized as ``bucket * 2^31 + pack-within-bucket``;
    ``n_packs_spanned`` counts the fixed-size sequences the document's
    tokens cross (a zero-token document occupies its start pack).  Rows
    with NULL token counts are treated as zero-token documents.
    ``carry_cols`` ride through the window untouched — callers that need
    extra columns in the manifest avoid a join back (which would need a
    collision-free key) — and participate as window ORDER tie-breakers,
    so a surrogate ``id_col`` that collides (e.g. an xxhash64 of real
    keys) still yields a total, partitioning-independent order as long
    as (id_col, *carry_cols) is unique."""
    h = hash_bucket(id_col).cast("bigint")
    n_tok = F.coalesce(F.col(n_tokens_col).cast("bigint"), F.lit(0))
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", id_col, *carry_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        docs.withColumn("__h", h)
        .withColumn("bucket", (F.col("__h") % F.lit(n_buckets)).cast("bigint"))
        .withColumn("__n", n_tok)
        .withColumn("start_off", (F.sum("__n").over(w) - F.col("__n")).cast("bigint"))
    )
    first = F.expr(f"start_off div {budget}")
    last = F.expr(f"(start_off + greatest(__n, 1L) - 1L) div {budget}")
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("bucket"),
        F.col("start_off"),
        (F.col("bucket") * F.lit(2**31) + first).cast("bigint").alias("pack_id"),
        F.col("__n").alias("n_tokens"),
        (last - first + F.lit(1)).cast("bigint").alias("n_packs_spanned"),
    )


def materialize_packs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 16,
    eos_token: str | None = None,
) -> DataFrame:
    """Materialize the packed sequences themselves: concatenate each
    bucket's token stream (order = the ``pack_sequences`` assignment) and
    slice it into fixed-``budget`` sequences, documents SPLITTING across
    pack boundaries exactly as a GPT-style loader consumes them.

    Output: ``(pack_id, tokens array<string>, n_tokens)`` — every pack is
    exactly ``budget`` tokens except possibly each bucket's last.

    Plan shape: per (doc, spanned-pack) slice bounds are pure int64
    arithmetic off the ``pack_sequences`` columns; the doc's token array
    slices JVM-side (``F.slice`` — no Python crossing), one row per
    (doc, pack) via ``explode(sequence(first, last))``; assembly is ONE
    groupBy on ``pack_id`` with an order-insensitive ``sort_array`` over
    (start_off, slice) structs + ``flatten`` — deterministic under any
    partitioning.  Token arrays shuffle once, keyed by pack.

    ``eos_token`` (the GPT-loader convention): append a document
    separator to every non-empty document's token stream before packing,
    so a model can learn document boundaries and a loader can split
    packs back into documents.  Offsets/pack ids account for the extra
    token exactly (it goes through the same ``n_tokens`` arithmetic).
    """
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    # Project the split ONCE, then derive the (optional) eos-extended
    # stream and its size off the column reference — inlining `toks` into
    # both the array and the size would re-split the text per reference.
    counted = docs.select(F.col(id_col), toks.alias("__toks"))
    if eos_token is not None:
        counted = counted.withColumn(
            "__toks",
            F.when(
                F.size("__toks") > 0,
                F.concat("__toks", F.array(F.lit(str(eos_token)))),
            ).otherwise(F.col("__toks")),
        )
    counted = counted.withColumn(
        "n_tokens", F.size("__toks").cast("bigint")
    )
    # Assignment sees ONLY (id, n_tokens): its per-bucket cumsum sorts and
    # shuffles 16-byte rows, never the token arrays (dragging __toks
    # through that window shuffled the whole corpus twice).  The arrays
    # join back on the id afterwards.
    assign = pack_sequences(
        counted.select(id_col, "n_tokens"), id_col=id_col,
        n_tokens_col="n_tokens", budget=budget, n_buckets=n_buckets,
    )
    joined = counted.join(assign, on=id_col)
    first = F.col("pack_id")
    parts = joined.select(
        F.col(id_col),
        "__toks",
        "start_off",
        F.explode(
            F.sequence(first, first + F.col("n_packs_spanned") - 1)
        ).alias("pack_id"),
    ).filter(F.size("__toks") > 0)
    # Token range of this doc that lands in this pack (0-based within doc):
    # pack p covers stream offsets [p%2^31 … +budget); doc occupies
    # [start_off, start_off + n).  F.slice is 1-based.
    pack_start = (F.col("pack_id") % F.lit(2**31)) * F.lit(budget)
    lo = F.greatest(pack_start - F.col("start_off"), F.lit(0))
    hi_excl = F.least(
        pack_start + F.lit(budget) - F.col("start_off"),
        F.size("__toks").cast("bigint"),
    )
    sliced = parts.select(
        "pack_id",
        "start_off",
        F.slice(
            "__toks", (lo + 1).cast("int"), (hi_excl - lo).cast("int")
        ).alias("__part"),
    )
    return (
        sliced.groupBy("pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_off", "__part"))
                    ),
                    lambda s: s["__part"],
                )
            ).alias("tokens")
        )
        .select(
            "pack_id", "tokens", F.size("tokens").cast("bigint").alias("n_tokens")
        )
    )


def best_fit_pack(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 16,
) -> DataFrame:
    """NO-SPLIT sequence packing — Best-Fit-Decreasing (Ding et al. 2024,
    "Fewer Truncations Improve Language Modeling", ICML — public paper):
    documents are packed WHOLE into fixed-``budget`` bins; only documents
    longer than the budget are split, into ``ceil(n/budget)`` chunks
    (every chunk but the last exactly ``budget`` tokens), so a truncation
    can never cut a short document mid-thought the way concat-and-chunk
    (``pack_sequences``) does.

    Output: one row per (document, chunk):
    ``(id, chunk, bucket, pack_id, offset_in_pack, n_tokens)`` —
    ``chunk`` is the 0-based split index (0 for every doc ≤ budget),
    ``pack_id`` globalizes as ``bucket·2^31 + bin-within-bucket``, and
    ``offset_in_pack`` is the chunk's token start inside its bin.  A
    zero/NULL-token document occupies one zero-length chunk (the manifest
    stays complete — same convention as ``pack_sequences``).

    Algorithm (per bucket, deterministic): chunks sort by
    ``(-n_tokens, id, chunk)`` and each goes to the bin with the SMALLEST
    remaining capacity that fits (ties → lowest bin index), opening a new
    bin when none fits — classic BFD, within 11/9·OPT + 1 bins of
    optimal, and in practice ≥99% fill at web-corpus length
    distributions (the paper's result).

    Scale shape: bin packing is inherently sequential, so this is the
    documented custom-operator path (b): documents hash-route into
    ``n_buckets`` independent groups (ONE shuffle of 16-byte
    ``(id, n_tokens)`` rows — token arrays never move) and each bucket
    runs one Arrow-batched kernel.  The kernel's sorted-capacity bisect
    makes a bucket O(n·log bins + moves); pick ``n_buckets`` as
    total_docs / docs_per_task exactly like ``pack_sequences``.  The
    global pack ids and offsets are pure functions of the bucket's
    member set, so results are partitioning-independent by construction
    (witness: tests/test_bestfit.py)."""
    import pandas as pd

    id_field = docs.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, chunk int, "
        "bucket bigint, pack_id bigint, offset_in_pack bigint, "
        "n_tokens bigint"
    )
    lim = int(budget)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from bisect import bisect_left, insort

        bucket = int(pdf["__bucket"].iloc[0])
        # Split oversize docs into budget-sized chunks.
        chunks = []  # (size, id, chunk_idx)
        for did, n in zip(pdf[id_col], pdf["__n"]):
            n = int(n)
            if n <= lim:
                chunks.append((n, did, 0))
            else:
                full, rem = divmod(n, lim)
                for c in range(full):
                    chunks.append((lim, did, c))
                if rem:
                    chunks.append((rem, did, full))
        chunks.sort(key=lambda t: (-t[0], t[1], t[2]))
        bins: list[int] = []  # fill level per bin index
        # Sorted (remaining, bin_idx) pairs: bisect finds the smallest
        # remaining >= size; equal remainders tie to the lowest index.
        free: list[tuple[int, int]] = []
        out = []
        for size, did, ci in chunks:
            j = bisect_left(free, (size, -1))
            if j < len(free):
                rem, b = free.pop(j)
                off = lim - rem
                bins[b] = off + size
                if rem - size:
                    insort(free, (rem - size, b))
            else:
                b = len(bins)
                off = 0
                bins.append(size)
                if lim - size:
                    insort(free, (lim - size, b))
            out.append((did, ci, bucket, (bucket << 31) + b, off, size))
        return pd.DataFrame(
            out,
            columns=[
                id_col, "chunk", "bucket", "pack_id", "offset_in_pack",
                "n_tokens",
            ],
        )

    # Bucket on the polynomial STRING hash (functions.text.poly_hash),
    # not hash_bucket: the latter casts ids to long, which NULLs string
    # ids; the char-fold works for any id type and stays
    # Python-replicable for the witness model.
    from restructure_hdfs_topic_spark.functions.text import poly_hash

    staged = docs.select(
        F.col(id_col),
        # Clamp negatives (a bad upstream count) as well as NULLs: a
        # negative chunk size would corrupt bin accounting (remaining
        # capacity above budget, overlapping offsets) — and the exact
        # Python witness model clamps the same way.
        F.greatest(
            F.coalesce(F.col(n_tokens_col).cast("bigint"), F.lit(0)),
            F.lit(0),
        ).alias("__n"),
    ).withColumn(
        "__bucket",
        # Fail FAST and loud on a NULL id (the engine's convention):
        # poly_hash(NULL) is NULL, which would otherwise surface as an
        # opaque TypeError inside the Arrow worker (NULL bucket /
        # None-vs-str tuple sort).
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"best_fit_pack: NULL {id_col} — ids must be non-NULL "
                    "(filter or quarantine NULL-id rows upstream)"
                )
            ).cast("bigint"),
        ).otherwise(
            F.pmod(
                poly_hash(F.col(id_col).cast("string")),
                F.lit(int(n_buckets)),
            ).cast("bigint")
        ),
    )
    return staged.groupBy("__bucket").applyInPandas(kernel, out_schema)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    ``(shard, pos)`` training position for one epoch — the "shuffle the
    corpus differently per epoch, reproducibly" step every large-scale
    loader needs (a non-deterministic ``ORDER BY rand()`` cannot be
    resumed after a preemption or compared across reruns).

    order key = ``hash_bucket(id XOR seed)`` — the engine-portable Knuth
    hash over the seed-perturbed id, so each ``seed`` yields a different
    but fully reproducible permutation, and any engine can re-derive the
    order (the DuckDB cross-check reproduces it verbatim).

        shard = key mod n_shards
        pos   = dense 0-based rank within the shard, ordered by (key, id)

    Scale shape: a global total sort would funnel 100 TB through one
    task chain; instead ONE hash shuffle routes rows to ``n_shards``
    independent groups and each shard sorts locally (the window's
    partition — Spark external-sorts a shard inside its task).  Pick
    ``n_shards`` so a shard matches a loader file (total_rows /
    rows_per_file), exactly like ``pack_sequences``' bucket sizing; hash
    routing makes shard skew statistically impossible.  Readers stream
    shards in any order — the permutation quality comes from the hash,
    not from shard order.
    """
    key = hash_bucket(F.col(id_col).bitwiseXOR(F.lit(int(seed))))
    tagged = df.withColumn("__key", key)
    w = Window.partitionBy(F.pmod(F.col("__key"), F.lit(int(n_shards)))).orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        tagged.withColumn(
            "shard", F.pmod(F.col("__key"), F.lit(int(n_shards))).cast("bigint")
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__key")
    )
