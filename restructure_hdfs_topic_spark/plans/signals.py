"""Quality-signal ANNOTATION — the RedPajama-v2 product shape (Weber et
al. 2024, NeurIPS D&B — public): instead of baking one filtering recipe
into the corpus, ship EVERY per-document quality signal as columns and
let each training run choose its own thresholds.  One wide pass
composes the engine's individually-tested signal families:

- Gopher word-level quality metrics (``gopher_metrics``) and the 13
  repetition fractions (``gopher_repetition_metrics``) — Rae et al.
  2021 table A1, both halves;
- C4 page flags (``has_curly_brace``, ``has_lorem_ipsum``,
  ``has_javascript`` — Raffel et al. 2020 §2.2's page-level drops,
  surfaced as booleans rather than applied);
- basic text statistics (token/BPE-token counts, punctuation and
  stopword ratios, the composite ``quality_score``);
- the marker-argmax ``lang_id`` heuristic and the Rabin-Karp document
  ``fingerprint``.

Scale shape: every signal is a JVM codegen projection over shared
staged splits (token array projected ONCE — the engine's measured
CollapseProject discipline); no shuffle, no Python, so annotation cost
is one scan regardless of how many signals ride along.  Gate-equality
witness + partitioning independence: tests/test_signals.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.text import (
    bpe_token_count,
    gopher_metrics,
    gopher_repetition_metrics,
    lang_id,
    poly_hash,
    punct_ratio,
    quality_score_from,
    stopword_ratio,
    token_count,
)


def annotate_quality_signals(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Input columns + every per-document quality signal the engine
    implements, as one lazy single-scan plan.  Filtering stays the
    caller's policy: ``df.filter(gopher_passes(...))`` /
    ``gopher_repetition_passes()`` / any custom threshold over the
    signal columns."""
    base = docs.columns
    t = F.col(text_col)
    low = F.lower(t)
    n_tokens = token_count(t)
    punct = punct_ratio(t)
    stop = stopword_ratio(t)
    flat = [
        ("n_tokens", n_tokens),
        ("n_bpe_tokens", bpe_token_count(t)),
        ("punct_ratio", punct),
        ("stopword_ratio", stop),
        ("quality_score", quality_score_from(n_tokens, punct, stop)),
        ("lang_id", lang_id(t)),
        ("fingerprint", poly_hash(t)),
        ("has_curly_brace", low.contains("{") | low.contains("}")),
        ("has_lorem_ipsum", low.contains("lorem ipsum")),
        ("has_javascript", low.contains("javascript")),
        *gopher_metrics(t),
    ]
    annotated = docs.select(*base, *[c.alias(n) for n, c in flat])
    return gopher_repetition_metrics(annotated, text_col)
