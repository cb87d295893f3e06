"""Corpus-trained unigram language-model scoring (CCNet-style quality
signal; Wenzek et al. 2020 score documents with a pretrained LM and keep
the low-perplexity tail — here the model is the corpus's own unigram
distribution, so the whole operator is expressible as relational algebra
and needs no external model artifact).

Two aggregation passes over the exploded token stream:

  1. counts:  token -> occurrences (map-side-combined groupBy)
  2. scoring: re-explode, join each token to its corpus log-probability,
              average per document

Per-token log p(t) = log2 cnt(t) - log2 N; a document's score is the mean
negative log-probability, i.e. its cross-entropy under the unigram model in
bits per token (2^score would be the perplexity).  Low = typical text,
high = rare/garbled text — threshold downstream like any quality gate.

Scale shape: pass 1 is a partial-aggregated shuffle on token; the 1-row
total rides a broadcast; pass 2 is a join on token (Catalyst broadcasts
the count table while it fits, degrades to a hash join at vocabulary
scale) followed by one groupBy on the document id.  The token explode is
evaluated twice rather than persisted — recomputing a projection is far
cheaper than caching an exploded 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unigram_logprobs(tokens_df: DataFrame, token_col: str = "token") -> DataFrame:
    """``(token, cnt, logp)`` — corpus log2-probability per distinct token."""
    counts = tokens_df.groupBy(token_col).agg(F.count(F.lit(1)).alias("cnt"))
    # The normalizer is just the token-stream length: a count-star over the
    # un-aggregated stream (partial counts, no shuffle payload) — NOT a
    # second groupBy-then-sum over the vocabulary.
    total = tokens_df.agg(F.count(F.lit(1)).alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        token_col,
        "cnt",
        (F.log2(F.col("cnt")) - F.log2(F.col("__total"))).alias("logp"),
    )


def lm_cross_entropy(
    docs: DataFrame,
    tokens_expr: Column,
    id_col: str = "doc_id",
    round_digits: int = 4,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram cross-entropy: ``(id, n_tokens,
    bits_per_token)``.  ``tokens_expr`` is the tokenizer column (an
    array<string>), shared with the rest of the text stack so the DuckDB
    oracle can reproduce it exactly; documents with no tokens drop out
    (their explode is empty — no 0/0 average).  ``bits_per_token`` is
    rounded so the last-ulp float wobble of cross-engine log2/summation
    order cannot flip a value hash.

    ``broadcast_vocab`` (default on) pins the count table as the join's
    build side: a natural-language unigram vocabulary is bounded (millions
    of rows ≈ tens of MB) while the token stream is corpus-sized, and
    Catalyst's file-size estimate would otherwise pick the WRONG side on a
    small sample (observed: it broadcast the exploded corpus).  Pass False
    for open-ended token domains to let the join fall back to shuffle."""
    tok = docs.select(F.col(id_col), F.explode(tokens_expr).alias("token"))
    probs = unigram_logprobs(tok).drop("cnt")
    if broadcast_vocab:
        probs = F.broadcast(probs)
    return (
        tok.join(probs, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("logp"), round_digits).alias("bits_per_token"),
        )
    )


BOS = "<s>"


def lm_bigram_cross_entropy(
    docs: DataFrame,
    tokens_expr: Column,
    id_col: str = "doc_id",
    lam: float = 0.7,
    round_digits: int = 4,
) -> DataFrame:
    """Interpolated BIGRAM cross-entropy per document: ``(id, n_tokens,
    bits_per_token)`` under

        p(t_i | t_{i-1}) = lam * cnt(t_{i-1}, t_i) / cnt_left(t_{i-1})
                         + (1 - lam) * p_unigram(t_i)

    with a ``<s>`` sentinel as every document's first left context — the
    next step up the CCNet ladder from ``lm_cross_entropy`` (Wenzek et
    al. 2020 score with a KenLM n-gram model; the interpolation makes
    unseen bigrams fall back to the unigram floor instead of -inf, the
    textbook Jelinek-Mercer smoothing).

    Plan shape: the (prev, cur) pair stream is built JVM-side from the
    token array (shifted-array ``zip_with`` — no positional self-join)
    and exploded ONCE; three aggregations over it (bigram counts, left-
    context counts, unigram counts) are ordinary partial-aggregated
    shuffles; scoring is joins on the pair stream.  Unlike the unigram
    vocabulary the bigram table is NOT force-broadcast — it grows with
    corpus diversity, so the join side is left to Catalyst/AQE (shuffle
    join at 100 TB, broadcast while small).
    """
    toks = tokens_expr
    prevs = F.concat(
        F.array(F.lit(BOS)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    pairs = F.zip_with(
        prevs,
        toks,
        lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
    )
    bi = (
        docs.select(F.col(id_col), F.explode(pairs).alias("pc"))
        .select(F.col(id_col), F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur"))
        # zip_with pads the longer side with NULL: an empty document
        # contributes a (<s>, NULL) pair — not a token, drop it.
        .filter(F.col("cur").isNotNull())
    )
    bi_counts = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cnt_bi"))
    left_counts = bi.groupBy("prev").agg(F.count(F.lit(1)).alias("cnt_left"))
    uni_counts = bi.groupBy("cur").agg(F.count(F.lit(1)).alias("cnt_uni"))
    total = bi.agg(F.count(F.lit(1)).alias("__total"))
    p_bi = F.col("cnt_bi") / F.col("cnt_left")
    p_uni = F.col("cnt_uni") / F.col("__total")
    p = F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    return (
        bi.join(bi_counts, ["prev", "cur"])
        .join(left_counts, "prev")
        .join(uni_counts, "cur")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.log2(p)), round_digits).alias("bits_per_token"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    tokens_expr: Column,
    id_col: str = "doc_id",
    max_bits: float | None = None,
    min_bits: float | None = None,
    model: str = "unigram",
    lam: float = 0.7,
) -> DataFrame:
    """LM-perplexity quality gate (CCNet, Wenzek et al. 2020 §4.3: score
    documents with an LM and keep the low-perplexity side): keep documents
    whose cross-entropy in bits/token lies in ``[min_bits, max_bits]``
    (either bound may be None).  A ``min_bits`` floor is how CCNet-style
    pipelines drop boilerplate/duplicated-token pages, which score
    unnaturally LOW.  Returns the surviving documents with their
    ``bits_per_token`` attached (the score is what downstream mixing /
    curriculum steps consume).  Documents with no tokens have no score and
    drop — an empty document carries no training signal either way.

    ``model``: "unigram" (one broadcast-vocab join) or "bigram"
    (Jelinek-Mercer interpolated, see ``lm_bigram_cross_entropy``).

    Scale shape: the scoring pass's own plan (partial-aggregated token
    shuffles) plus ONE equi-join of the (id, score) frame back to the
    corpus on its id — AQE broadcasts the score side while it fits and
    degrades to a shuffle join at corpus scale; no new shuffle of document
    text beyond the join itself."""
    if max_bits is None and min_bits is None:
        raise ValueError("at least one of max_bits / min_bits is required")
    if model == "unigram":
        scored = lm_cross_entropy(docs, tokens_expr, id_col)
    elif model == "bigram":
        scored = lm_bigram_cross_entropy(docs, tokens_expr, id_col, lam=lam)
    else:
        raise ValueError(f"unknown model {model!r}")
    cond = F.lit(True)
    if max_bits is not None:
        cond = cond & (F.col("bits_per_token") <= F.lit(float(max_bits)))
    if min_bits is not None:
        cond = cond & (F.col("bits_per_token") >= F.lit(float(min_bits)))
    keep = scored.filter(cond).select(id_col, "bits_per_token")
    return docs.join(keep, id_col)


def perplexity_band(
    docs: DataFrame,
    tokens_expr: Column,
    id_col: str = "doc_id",
    lo_q: float = 0.0,
    hi_q: float = 1 / 3,
    strata_col: str | None = None,
    model: str = "unigram",
    lam: float = 0.7,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quantile-band perplexity gate — CCNet's actual head/middle/tail
    split (Wenzek et al. 2020 §4.3 keep the "head" = lowest-perplexity
    third PER LANGUAGE): keep documents whose bits/token falls inside the
    ``[lo_q, hi_q]`` quantile band of the score distribution, computed per
    ``strata_col`` group when given (global otherwise).  The default keeps
    the head third.  Returns survivors with ``bits_per_token`` attached.

    Scale shape: scoring as in ``perplexity_filter``; band boundaries come
    from ONE constant-memory grouped ``percentile_approx`` aggregate
    (Greenwald-Khanna sketch, |strata| result rows — the bounded
    metadata-collect contract of ``curriculum_bins``/``mixture_sample``),
    applied as a broadcast CASE filter — no total sort, no second scan of
    document text."""
    if not (0.0 <= lo_q < hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q < hi_q <= 1")
    if model == "unigram":
        scored = lm_cross_entropy(docs, tokens_expr, id_col)
    elif model == "bigram":
        scored = lm_bigram_cross_entropy(docs, tokens_expr, id_col, lam=lam)
    else:
        raise ValueError(f"unknown model {model!r}")
    scored = scored.select(id_col, "bits_per_token")
    # Persisted: the percentile collect below EXECUTES the full scoring
    # pipeline (token explode + vocab joins + per-doc aggregate), and the
    # returned filter would otherwise re-run that whole lineage when the
    # caller acts on it — the docstring's "no second scan" depends on
    # this cache (same scoped-persist contract as curation's stages).
    from restructure_hdfs_topic_spark.caching import scoped_persist

    joined = scoped_persist(
        docs.join(scored, id_col), scope="lm.perplexity_band.scored"
    )
    qs = [float(lo_q), float(hi_q)]
    if strata_col is None:
        row = joined.agg(
            F.percentile_approx("bits_per_token", qs, accuracy).alias("b")
        ).collect()[0]["b"]
        lo_b, hi_b = float(row[0]), float(row[1])
        cond = (F.col("bits_per_token") >= F.lit(lo_b)) & (
            F.col("bits_per_token") <= F.lit(hi_b)
        )
        return joined.filter(cond)
    bounds = {
        r["__s"]: (float(r["b"][0]), float(r["b"][1]))
        for r in joined.groupBy(F.col(strata_col).alias("__s"))
        .agg(F.percentile_approx("bits_per_token", qs, accuracy).alias("b"))
        .collect()
    }
    lo_expr = F.lit(None).cast("double")
    hi_expr = F.lit(None).cast("double")
    for s, (lo_b, hi_b) in sorted(bounds.items(), key=lambda kv: str(kv[0])):
        # eqNullSafe: a NULL stratum gets its own computed band too — a
        # plain == is never true for NULL, which would silently drop
        # every stratum-less document regardless of score.
        cond = F.col(strata_col).eqNullSafe(F.lit(s))
        lo_expr = F.when(cond, F.lit(lo_b)).otherwise(lo_expr)
        hi_expr = F.when(cond, F.lit(hi_b)).otherwise(hi_expr)
    return joined.filter(
        (F.col("bits_per_token") >= lo_expr) & (F.col("bits_per_token") <= hi_expr)
    )


def curriculum_bins(
    scored: DataFrame,
    score_col: str = "bits_per_token",
    n_bins: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """Assign each document a difficulty bin (0 = easiest) by quantiles of
    a quality/perplexity score — the data-ordering step of curriculum
    training.

    Scale shape: a global ``ntile`` would total-sort the corpus; instead
    the n_bins-1 boundaries come from one constant-memory
    ``percentile_approx`` aggregate (Greenwald-Khanna, driver gets a
    single tiny row) and binning is a shuffle-free comparison chain over
    the broadcast boundaries.  Bin populations are equal up to sketch
    accuracy (1/accuracy relative rank error); determinism follows from
    the sketch's determinism on the same data.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = scored.agg(
        F.percentile_approx(score_col, qs, accuracy).alias("b")
    ).collect()[0]["b"]
    bin_expr = F.lit(0)
    for b in bounds:
        bin_expr = bin_expr + (F.col(score_col) > F.lit(float(b))).cast("int")
    return scored.withColumn("curriculum_bin", bin_expr.cast("bigint"))
