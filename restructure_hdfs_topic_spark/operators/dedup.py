"""Deduplication operators (SURVEY O14/O15 + north-star scale dedup).

Reference semantics:
- O14 CSV dedup (format/CsvAvroConverterFactory.kt:22-56): key = all columns,
  or a ``distinctFields`` subset, or all minus ``ignoreFields``; KEEP THE
  LAST occurrence (by file order); per-topic config overrides
  (config/RestructureConfig.kt:233-265).
- O15 generic dedup (format/RecordConverterFactory.kt:62-84): exact
  distinct on the serialized line.

Spark-first: keep-last is a window ``row_number() == 1`` ordered by the
order column DESC; exact distinct is ``dropDuplicates``/``distinct`` —
both shuffle once on the key and scale linearly.  The north-star variants
(MinHash+LSH, SimHash, n-gram Jaccard) find NEAR-duplicates at 100 TB
without an O(n²) cross join: candidate generation is hash-bucketing
(shuffle on band/bucket key), verification joins only within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.text import HASH_MOD, poly_hash


def keep_last_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    ignore_cols: list[str] | None = None,
) -> DataFrame:
    """O14: keep the LAST occurrence per key, by ``order_col``.

    ``key_cols=[]`` means "all columns except order/ignored" (the
    reference's default full-row key, format/CsvAvroConverterFactory.kt:158-171).
    One shuffle on the key; no driver-side state.
    """
    if not key_cols:
        excluded = set(ignore_cols or []) | {order_col}
        key_cols = [c for c in df.columns if c not in excluded]
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """O15: exact distinct (full row or key subset, keeping first arbitrary row)."""
    return df.dropDuplicates(key_cols) if key_cols else df.distinct()


# ---------------------------------------------------------------------------
# North-star near-duplicate detection.  All hash arithmetic is deterministic
# integer math on int64 (no JVM hash functions) so results are reproducible
# across engines and cluster sizes.
# ---------------------------------------------------------------------------


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingle array from a text column (lowercased, whitespace
    tokenized).  Built-ins only: split + transform over a sequence."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    k = F.size(tokens) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]),
    )
    # sequence(0, k-1) would generate a DESCENDING range when k <= 0 —
    # guard short documents to an empty shingle set instead.
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: h_i(S) = min over shingles s of
    (a_i * poly(s) + b_i) mod p, with a fixed affine family (a_i, b_i).

    Returns (id, sig: array<long> length ``num_hashes``).  All distributed,
    one narrow projection — no shuffle until LSH banding.
    """
    def affine(i: int):
        # Closure factory: default-arg lambdas break PySpark's higher-order
        # lambda arity introspection (second param would bind the index).
        return lambda h: (h * F.lit(2 * i + 1) + F.lit(7919 * (i + 1))) % F.lit(HASH_MOD)

    # Materialize the per-shingle hash as its OWN projection: referencing it
    # ``num_hashes`` times inline would make Catalyst re-inline (and
    # re-evaluate) the whole polynomial char fold per hash function —
    # CollapseProject keeps a multi-referenced non-cheap alias un-inlined.
    hashed_df = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.array_distinct(shingles(text_col, n)), poly_hash).alias("hashed"),
    )
    sigs = F.array(
        *[F.array_min(F.transform(F.col("hashed"), affine(i))) for i in range(num_hashes)]
    )
    return hashed_df.select("id", sigs.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: documents agreeing on ALL rows of any band become a
    candidate pair.  Shuffle key = (band index, band slice) — this is the
    scale path: no O(n²) compare, bucket sizes bounded by collision rate.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice("sig", b * rows_per_band + 1, rows_per_band).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", F.col("bk.key").cast("array<long>").alias("key"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    With ``candidates`` (e.g. from LSH) this verifies only candidate pairs —
    the 100 TB path.  Without, it does the O(n²) self-join — correct
    baseline for oracle checks at small SF.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    docs = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(text_col, n)).alias("sh"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    if candidates is not None:
        pairs = (
            candidates.join(a, candidates.id_a == F.col("a.id"))
            .join(b, candidates.id_b == F.col("b.id"))
            .select("a.id", "a.sh", F.col("b.id").alias("id_b2"), F.col("b.sh").alias("sh_b"))
            .toDF("id_a", "sh_a", "id_b", "sh_b")
        )
    else:
        pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
            F.col("a.id").alias("id_a"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.id").alias("id_b"),
            F.col("b.sh").alias("sh_b"),
        )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token hash, bit b contributes +1/-1; the
    fingerprint sets bit b iff the sum is positive.  Near-dups share most
    bits → group by fingerprint (or banded substrings) at scale.

    Returns (id, simhash: long).  Deterministic polynomial token hash.
    """
    def vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    # Materialized projection: see minhash_signatures — ``bits`` references
    # to an inline hash expression would re-evaluate the char fold per bit.
    tokens = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    hashed_df = df.select(
        F.col(id_col).alias("id"), F.transform(tokens, poly_hash).alias("hashed")
    )
    bit_votes = [
        F.aggregate(F.col("hashed"), F.lit(0).cast("long"), vote(b)) for b in range(bits)
    ]
    fingerprint = None
    for b, vote_col in enumerate(bit_votes):
        term = F.when(vote_col > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return hashed_df.select("id", fingerprint.alias("simhash"))
