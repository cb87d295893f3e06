"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS — public paper): pick raw-corpus examples that LOOK LIKE a
target corpus, using hashed n-gram bag models.

The published recipe, re-expressed as lazy DataFrame algebra:

1. **Features** — every document is a bag of hashed unigram+bigram
   counts over ``n_buckets`` buckets (the paper uses 10k).  Unigrams
   hash with the repo-standard polynomial fingerprint
   (``functions.text.poly_hash``); bigrams combine the two token hashes
   arithmetically (see ``dsir_ngram_counts``) — engine-portable
   integers throughout.
2. **Fit** — smoothed bucket unigram models ``p_target`` / ``p_raw``
   from global bucket counts (two map-side-combined aggregations of at
   most ``n_buckets`` rows each — bounded regardless of corpus size).
3. **Weigh** — per-document log importance
   ``log w_i = Σ_b c_ib · (log p_target[b] − log p_raw[b])``:
   the per-doc counts broadcast-join the ≤10k-row ratio table, then one
   map-side-combined sum per document.
4. **Resample** — Gumbel top-k (sampling without replacement ∝ w):
   ``key_i = log w_i + g_i`` with ``g_i = −log(−log(u_i))``.  The
   uniform is the row's own hash bucket (``(hash_bucket(id)+0.5)/2^32``)
   — DETERMINISTIC, so selection is reproducible across runs, engines,
   and partitionings (the same property every sampler in
   ``operators/sampling.py`` has), while still being a faithful Gumbel
   draw over ids.

Scale shape: feature counting is ONE Arrow kernel emitting
``(id, bucket, cnt)`` directly — no explode, no corpus-sized shuffle
(each id's counts are born in one partition, so every downstream
``groupBy`` map-side combines to one row per key before its exchange);
the final top-k is Spark's TakeOrdered partial top-k — no global sort
materializes.  The ratio table and totals are bounded broadcast sides.
No driver collects beyond the bounded fits.

Exact pure-Python re-derivation: tests/test_dsir.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.text import poly_hash


#: Bigram combiner multiplier (any odd constant < sqrt(HASH_MOD) works;
#: mirrored by the exact-Python witness model).
BIGRAM_MULT = 8191


def dsir_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """``(id, bucket, cnt)`` hashed unigram+bigram counts per document —
    ONE Arrow ``mapInPandas`` kernel, batch-vectorized ACROSS documents,
    NO explode and NO shuffle (VERDICT r9: the former
    explode → ``groupBy(id, bucket)`` shuffle of ~2 rows per word was
    the whole cost of ``dsir_select``).

    Hash identity is unchanged and mirrored by the exact-Python witness
    (tests/test_dsir.py): unigrams use the repo-standard polynomial
    char-fold (``functions.text.poly_hash`` over ``tokens()``'s
    trim-spaces/lower/ASCII-``\\s`` tokens), bigrams combine adjacent
    TOKEN hashes arithmetically (``(h1·8191 + h2) mod p`` — never a
    char-fold over a joined string), buckets are ``hash mod n_buckets``.

    Kernel shape (the ``_ngram_repetition_kernel`` pattern): token
    hashes compute once per DISTINCT token (Zipf cache, per batch),
    bigram combination and bucketing are whole-batch numpy ops over the
    concatenated token stream (pairs crossing a document boundary masked
    out), and per-(doc, bucket) counts come from one ``np.unique`` over
    a packed ``doc·n_buckets + bucket`` int64 key.  A document's rows
    all come from its own input batch, so each id's counts live in one
    partition — downstream ``groupBy`` aggregations map-side combine to
    one row per key before any shuffle.  Per-row pure function ⇒
    partitioning-independent.  Documents with no tokens emit no rows
    (``dsir_importance`` coalesces their score to 0)."""
    id_field = docs.schema[id_col]
    nb = int(n_buckets)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from restructure_hdfs_topic_spark.functions.text import (
            HASH_MOD,
            _mirror_token_hashes,
        )

        for pdf in batches:
            n_docs = len(pdf)
            if not n_docs:
                continue
            # Tokenize + hash via the shared exact mirror of the JVM
            # tokens()/poly_hash pair (one definition with the
            # repetition kernel — they cannot drift).
            counts, H, _ = _mirror_token_hashes(pdf[text_col])
            doc = np.repeat(np.arange(n_docs), counts)
            if len(H) >= 2:
                bi = (H[:-1] * BIGRAM_MULT + H[1:]) % HASH_MOD
                valid = doc[:-1] == doc[1:]
                bi_doc = doc[:-1][valid]
                bi_b = bi[valid] % nb
            else:
                bi_doc = np.empty(0, np.int64)
                bi_b = bi_doc
            all_doc = np.concatenate([doc, bi_doc])
            all_b = np.concatenate([H % nb, bi_b])
            packed = all_doc * np.int64(nb) + all_b
            uniq, cnts = np.unique(packed, return_counts=True)
            ids = pdf["__id"].to_numpy()
            yield pd.DataFrame(
                {
                    "__id": ids[uniq // nb],
                    "bucket": uniq % nb,
                    "cnt": cnts,
                }
            )

    # Ids transit the kernel as STRINGS: an Arrow int64 column containing
    # any NULL arrives in pandas as float64, which NaN-corrupts the NULL
    # doc's rows and silently rounds co-batched ids above 2^53 — a string
    # column keeps NULLs as None and round-trips every id exactly (the
    # old explode path carried NULL-id docs' counts into the p_raw fit;
    # this preserves that).
    staged = docs.select(
        F.col(id_col).cast("string").alias("__id"), F.col(text_col)
    )
    counts = staged.mapInPandas(
        kernel, "__id string, bucket bigint, cnt bigint"
    )
    return counts.select(
        F.col("__id").cast(id_field.dataType).alias(id_col), "bucket", "cnt"
    )


def dsir_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """``(bucket, log_ratio)`` — smoothed
    ``log p_target[b] − log p_raw[b]`` from per-doc count frames
    (``dsir_ngram_counts`` output).  At most ``n_buckets`` rows; all
    aggregates bounded; totals ride in as broadcast 1-row frames so the
    plan stays lazy."""
    a = float(smoothing)
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("__ct"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("__cr"))
    tot_t = t.agg(F.sum("__ct").alias("__T"))
    tot_r = r.agg(F.sum("__cr").alias("__R"))
    joined = (
        t.join(r, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
    )
    ct = F.coalesce(F.col("__ct"), F.lit(0)).cast("double")
    cr = F.coalesce(F.col("__cr"), F.lit(0)).cast("double")
    denom_t = F.col("__T").cast("double") + F.lit(a * n_buckets)
    denom_r = F.col("__R").cast("double") + F.lit(a * n_buckets)
    return joined.select(
        "bucket",
        (
            F.log((ct + F.lit(a)) / denom_t) - F.log((cr + F.lit(a)) / denom_r)
        ).alias("log_ratio"),
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """``(id, log_importance)`` for every raw document (6-decimal
    rounding — the cross-engine float convention).  Documents with NO
    features (empty/NULL text) score 0.

    The raw count frame is consumed TWICE (fitting ``p_raw`` and
    scoring) — scope-persisted so the explode+count pipeline runs once
    (MEMORY_AND_DISK: spills instead of OOMing at corpus scale)."""
    from restructure_hdfs_topic_spark.caching import scoped_persist

    raw_counts = scoped_persist(
        dsir_ngram_counts(raw, id_col, text_col, n_buckets),
        scope="dsir.raw_counts",
    )
    target_counts = dsir_ngram_counts(target, id_col, text_col, n_buckets)
    ratios = dsir_log_ratios(target_counts, raw_counts, n_buckets, smoothing)
    scored = (
        raw_counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias(
                "log_importance"
            )
        )
    )
    # Featureless docs (empty text) keep a 0 score instead of vanishing.
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("log_importance", F.lit(0.0)).alias("log_importance"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Gumbel top-``k`` importance resampling: the ``k`` raw documents
    sampled without replacement with probability ∝ their importance
    weight — raw's columns plus ``log_importance`` and the
    ``gumbel_key`` that ranked them.  Deterministic: the Gumbel uniform
    is the row's own polynomial STRING hash (``poly_hash`` — NOT
    ``hash_bucket``, which casts ids to long and would NULL every
    string/UUID id, silently degenerating selection to the k smallest
    ids); ties (already measure-zero) break by id.  The selected id set
    is k rows — AQE broadcasts the join back to raw's columns while
    small and shuffles at scale."""
    from restructure_hdfs_topic_spark.functions.text import HASH_MOD

    if k <= 0:
        raise ValueError("k must be positive")
    scored = dsir_importance(
        raw, target, id_col, text_col, n_buckets, smoothing
    )
    u = (poly_hash(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(
        float(HASH_MOD)
    )
    key = F.round(F.col("log_importance") - F.log(-F.log(u)), 6)
    picked = (
        scored.select(id_col, "log_importance", key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(int(k))
    )
    return raw.join(picked, id_col).select(
        *raw.columns, "log_importance", "gumbel_key"
    )
