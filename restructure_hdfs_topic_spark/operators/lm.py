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
