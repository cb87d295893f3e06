"""BM25 ranked retrieval over the document corpus (north-star extension).

The reference engine has no search capability at all; this is the
training-data-pipeline primitive for corpus inspection, decontamination
triage ("which training docs would this benchmark question retrieve?"),
and hard-negative mining.  Okapi BM25 in the Lucene formulation
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework"):

    idf(t)     = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))      # >= 0
    score(q,d) = sum_t idf(t) * tf(t,d)*(k1+1)
                          / (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))

Spark-first shape (one corpus scan before any shuffle):

- The query-term set is tiny and BROADCAST onto the exploded token
  stream, so the map-side join filters the corpus down to candidate
  (doc, term) rows before the first Exchange — tf, df, and the final
  per-(query, doc) sum all aggregate the already-filtered stream.
- Document length and the corpus stats (N, avgdl) come from a pure
  projection (``token_count``) — no second explode; N/avgdl ride as a
  1-row broadcast inside the plan (no eager ``.count()``).
- df(t) is derived FROM the tf table (#(doc,term) rows per term), so the
  matched stream aggregates once; tf is persisted for its two consumers.

Cross-engine float determinism: every per-term score is rounded to 6 dp
BEFORE the per-query sum, and the sum is rounded again — the addends are
values on the 1e-6 grid, so addition-order ulps (DuckDB vs Spark, any
partitioning) stay far below the grid and the (rounded score, doc_id)
ranking is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.text import token_count, tokens


def corpus_queries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_mod: int = 101,
    positions: tuple[int, ...] = (1, 8, 15),
    min_token_len: int = 4,
) -> DataFrame:
    """Deterministic data-driven query set: every ``sample_mod``-th
    document contributes its tokens (length >= ``min_token_len``) at the
    fixed 1-based ``positions`` of the filtered token stream, distinct.

    Returns ``(query_id, term)`` where ``query_id`` is the sampled
    document's id — self-retrieval (the query doc ranking for its own
    terms) is the built-in sanity witness.  Position indexing (not "top
    terms" or "first distinct") keeps the set order-independent of any
    engine's distinct/ordering semantics.

    ``id_col % sample_mod`` is an integer contract: a string id would
    make the modulo NULL and the query set silently EMPTY (zero-row
    results with no error), so non-integral ids are rejected loudly —
    map string ids through ``xxhash64`` first (same discipline as
    ``holdout_split``).
    """
    from restructure_hdfs_topic_spark.operators.sampling import (
        _require_integral,
    )

    _require_integral(docs, id_col, "corpus_queries id_col")
    filtered = F.filter(
        tokens(F.col(text_col)), lambda t: F.length(t) >= min_token_len
    )
    sampled = docs.filter(
        (F.col(id_col) % sample_mod == 0) & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col).alias("query_id"), filtered.alias("__toks"))
    terms = sampled.select(
        "query_id",
        F.explode(
            F.array(*[F.try_element_at(F.col("__toks"), F.lit(p)) for p in positions])
        ).alias("term"),
    ).filter(F.col("term").isNotNull())
    return terms.distinct()


def bm25_idf(n_docs_col, df_col):
    """Lucene-form idf — shared by the direct path and the on-disk index
    so the two can never drift (their outputs are asserted EQUAL in
    tests/test_bm25_index.py)."""
    return F.log(
        F.lit(1.0) + (n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_term_score(tf_col, dl_col, idf_col, avgdl_col, k1: float, b: float):
    """Per-(query-term, doc) BM25 contribution, rounded to the 1e-6 grid
    BEFORE the per-query sum (see module docstring) — shared by both
    retrieval paths."""
    return F.round(
        idf_col
        * (tf_col * (k1 + 1.0))
        / (tf_col + k1 * (1.0 - b + b * dl_col / avgdl_col)),
        6,
    )


def bm25_rank_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Reduce a ``(query_id, __id, __term_score)`` stream to the ranked
    top-``k`` table ``(query_id, rank, id_col, n_terms_matched, score)``
    — shared by both retrieval paths."""
    agg = scored.groupBy("query_id", "__id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum("__term_score"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("__id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("__id").alias(id_col),
            "n_terms_matched",
            "score",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25 — ``(query_id, rank, doc_id,
    n_terms_matched, score)``.

    ``queries`` is a small ``(query_id, term)`` table (it is broadcast
    twice: raw terms onto the token stream, idf-weighted terms onto tf).
    Documents matching no query term never leave the map side; empty/
    whitespace-only documents are excluded from the corpus statistics
    (consistent with ``tfidf_top_terms``).

    100 TB shape: ONE corpus scan for the token stream with the
    broadcast term filter applied before the first shuffle; the only
    corpus-sized Exchange is the slim ``(doc, dl)`` projection joining
    onto the matched tf rows.  A stopword query term degrades the match
    set toward corpus size — that is inherent to exact BM25, and the
    match-set aggregations stay 16-byte rows.
    """
    from restructure_hdfs_topic_spark.caching import scoped_persist

    base = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    )
    # Per-doc lengths persisted (narrow id+int rows): the corpus stats
    # and the scoring join BOTH consume them, so the text tokenizes once
    # for lengths instead of twice (r13 — this was a third full corpus
    # tokenize pass alongside the token-stream explode).
    dl = scoped_persist(
        base.select("__id", token_count(F.col("__text")).alias("__dl")),
        scope="retrieval.bm25_topk.dl",
    )
    # avgdl as exact-int sum / count (ONE double division) rather than
    # F.avg — both engines then compute the identical IEEE value.
    # Derived from `dl` (same rows, same integer sum) — bit-identical to
    # aggregating token_count over the corpus directly.
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
    )
    raw_terms = queries.select(F.col("term").alias("token")).distinct()

    tok = base.select(
        "__id", F.explode(tokens(F.col("__text"))).alias("token")
    )
    matched = tok.join(F.broadcast(raw_terms), "token")
    tf = scoped_persist(
        matched.groupBy("__id", "token").agg(F.count(F.lit(1)).alias("__tf")),
        scope="retrieval.bm25_topk.tf",
    )
    # df(t) = number of (doc, term) rows in tf — no second corpus pass.
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    qterms = (
        queries.select("query_id", F.col("term").alias("token"))
        .distinct()
        .join(df_, "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("__idf", bm25_idf(F.col("__n_docs"), F.col("__df")))
        .select("query_id", "token", "__idf", "__avgdl")
    )

    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "__id")
        .withColumn(
            "__term_score",
            bm25_term_score(
                F.col("__tf"),
                F.col("__dl"),
                F.col("__idf"),
                F.col("__avgdl"),
                k1,
                b,
            ),
        )
    )
    return bm25_rank_topk(scored, k, id_col)
