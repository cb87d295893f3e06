"""Character-trigram language identification (Cavnar & Trenkle 1994).

The n-gram rank-profile classifier — the shape of every classic
language-ID system (textcat, langdetect's ancestor): a language's
profile is its ``top_k`` most frequent character trigrams in rank order;
a document is classified by the "out-of-place" distance between its own
trigram ranks and each profile (missing trigrams pay the maximum
penalty).  This replaces marker-word lookups as the REAL lang-id stage
of a curation pipeline: it needs no tokenizer, works on any script, and
degrades gracefully on short/noisy text.

Engine shapes:

- **Training** is ONE distributed aggregate: trigrams are built JVM-side
  (``transform`` over an index ``sequence`` + ``substring`` — no
  Python), exploded, counted per (lang, gram) with map-side combine, and
  the top-``top_k`` per language (ONE window over the counted table,
  whose size is bounded by the trigram vocabulary) collects to a small
  artifact — languages × top_k rows, KBs.  The corpus never collects.
- **Classification** is pure JVM (a per-row Python kernel measured ~15×
  slower): the same explode + count + per-doc rank window builds the
  document's top-``doc_top`` grams, ONE broadcast join against the
  (lang, gram, rank) profile table crossed with the bounded language
  list computes displacements, a map-side-combined aggregate sums them,
  and a ``min(struct(dist, lang))`` per document is the argmin with a
  deterministic tie-break.
- **Artifact**: ``save_lang_profiles`` / ``load_lang_profiles`` write
  one JSON file through the shared small-file plumbing (local or any
  Hadoop ``scheme://``), so training and classification jobs decouple
  like the quality classifier's.

Determinism: counts are exact; ranks tie-break on the gram string; the
classifier tie-breaks on language name — bit-stable across partitionings
and engines (pinned by an exact pure-Python model test).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "train_lang_profiles",
    "classify_lang",
    "save_lang_profiles",
    "load_lang_profiles",
    "doc_trigram_ranks",
]


def _exploded_grams(df: DataFrame, key, text, n: int) -> DataFrame:
    """(__key, gram) — one row per overlapping character n-gram of the
    normalized text (lowercased, whitespace runs collapsed to one space).

    Two deliberate shapes: the char array is PROJECTED once per row
    before the gram transform (an outer expression captured inside a
    higher-order lambda re-evaluates per element — the repo's
    CollapseProject trap), and grams come from ``slice`` over that array
    rather than ``substr`` over the string — ``substr(i, n)`` re-scans
    the UTF-8 string from the start per call, turning the build quadratic
    in document length (measured: the substr form dominated the whole
    query at sf0.1)."""
    # (?U): Java's \s is ASCII-only by default, but the pure-Python
    # model (and real text) treat U+00A0 etc. as whitespace — the
    # UNICODE_CHARACTER_CLASS flag keeps the two bit-identical.
    t = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"(?U)\s+", " ")
    step = df.select(key.alias("__key"), F.split(t, "").alias("__chars"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("__chars") - (n - 1), F.lit(0))),
        lambda i: F.concat_ws("", F.slice(F.col("__chars"), i, n)),
    )
    safe = F.when(
        F.size("__chars") < n, F.array().cast("array<string>")
    ).otherwise(grams)
    return step.select("__key", F.explode(safe).alias("gram"))


def train_lang_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 300,
    n: int = 3,
) -> dict:
    """Train rank profiles from labeled documents → ``{lang: [gram, ...]}``
    in rank order (index = rank).  One explode + map-side-combined count +
    one window over the bounded (lang, gram) table; ties rank by count
    desc, gram asc (deterministic)."""
    # NULL labels (routine after upstream left joins) train nothing —
    # without the filter they'd surface as a None profile key and crash
    # the artifact sort with an opaque TypeError.
    labeled = docs.filter(F.col(lang_col).isNotNull())
    counted = (
        _exploded_grams(labeled, F.col(lang_col), F.col(text_col), n)
        .withColumnRenamed("__key", "lang")
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("gram").asc())
    top = (
        counted.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_k)
        .select("lang", "gram", "r")
        .collect()
    )
    profiles: dict[str, list] = {}
    for row in top:
        profiles.setdefault(row["lang"], []).append((row["r"], row["gram"]))
    return {
        "format": "restructure_hdfs_topic_spark/langid/v1",
        "n": int(n),
        "top_k": int(top_k),
        "profiles": {
            lang: [g for _, g in sorted(entries)]
            for lang, entries in sorted(profiles.items())
        },
    }


def doc_trigram_ranks(
    text: str, n: int, doc_top: int, max_chars: int | None = 4096
) -> list[str]:
    """Rank-ordered top ``doc_top`` n-grams of one document — the exact
    counting/tie-break rule the classifier kernel uses (exposed for the
    pure-Python model test).  Normalization mirrors ``_trigrams_expr``;
    ``max_chars`` mirrors ``classify_lang``'s prefix cap."""
    import re

    t = (text or "")
    if max_chars is not None:
        t = t[:max_chars]
    t = re.sub(r"\s+", " ", t.lower())
    counts: dict[str, int] = {}
    for i in range(len(t) - n + 1):
        g = t[i : i + n]
        counts[g] = counts.get(g, 0) + 1
    return [g for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))][
        :doc_top
    ]


def classify_lang(
    docs: DataFrame,
    profiles: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_top: int = 100,
    max_chars: int | None = 4096,
) -> DataFrame:
    """Input columns + ``(lang_pred, lang_distance)``: the Cavnar-Trenkle
    out-of-place classification.  distance(doc, L) = Σ over the doc's
    top-``doc_top`` ranked grams of |rank_doc - rank_L|, with grams
    absent from L's profile paying ``top_k`` (the maximum displacement);
    lowest distance wins, ties break on language name.  Empty/NULL text →
    NULL prediction.

    ``max_chars`` (default 4 KB; None disables) classifies on a document
    PREFIX: rank-profile accuracy saturates within the first few KB
    (Cavnar-Trenkle trained on ≤300-gram profiles of short articles), so
    counting every trigram of a book-length document buys nothing and
    multiplies the explode+count shuffle by the mean document length —
    the prefix cap bounds per-doc cost at a constant.

    Pure JVM end-to-end — NO Python in the hot path (a per-row kernel
    measured ~15× slower at sf0.1): doc gram ranks come from the same
    explode + count + per-doc window as training; displacement is one
    broadcast join against the (lang, gram, rank) profile table crossed
    with the bounded language list; distance is a map-side-combined
    aggregate; argmin is one min_by over a langs-sized struct per doc."""
    if profiles.get("format") != "restructure_hdfs_topic_spark/langid/v1":
        raise ValueError("not a langid/v1 profile artifact")
    n = int(profiles["n"])
    top_k = int(profiles["top_k"])
    spark = docs.sparkSession
    prof_rows = [
        (lang, g, r)
        for lang, grams in sorted(profiles["profiles"].items())
        for r, g in enumerate(grams)
    ]
    prof_df = spark.createDataFrame(prof_rows, "lang string, gram string, r_lang long")
    langs_df = spark.createDataFrame(
        [(lang,) for lang in sorted(profiles["profiles"])], "lang string"
    )

    # Per-doc gram ranks: explode + exact count + ONE window per doc
    # (count desc, gram asc — the trainer's tie-break), capped at doc_top.
    text_expr = F.col(text_col)
    if max_chars is not None:
        text_expr = F.substring(text_expr, 1, int(max_chars))
    grams = (
        _exploded_grams(docs, F.col(id_col), text_expr, n)
        .withColumnRenamed("__key", "__id")
        .groupBy("__id", "gram")
        .agg(F.count("*").alias("c"))
    )
    w_doc = Window.partitionBy("__id").orderBy(F.col("c").desc(), F.col("gram").asc())
    ranked = (
        grams.withColumn("r_doc", F.row_number().over(w_doc) - 1)
        .filter(F.col("r_doc") < doc_top)
        .select("__id", "gram", "r_doc")
    )
    # Displacement per (doc gram, language): langs is bounded (cross),
    # profile is KBs (broadcast); absent grams pay top_k.
    disp = (
        ranked.crossJoin(F.broadcast(langs_df))
        .join(F.broadcast(prof_df), ["lang", "gram"], "left")
        .select(
            "__id",
            "lang",
            F.coalesce(
                F.abs(F.col("r_doc") - F.col("r_lang")), F.lit(top_k)
            ).alias("d"),
        )
    )
    dists = disp.groupBy("__id", "lang").agg(F.sum("d").alias("dist"))
    best = dists.groupBy("__id").agg(
        F.min(F.struct(F.col("dist"), F.col("lang"))).alias("b")
    )
    scored = best.select(
        F.col("__id").alias(id_col),
        F.col("b.lang").alias("lang_pred"),
        F.col("b.dist").alias("lang_distance"),
    )
    return docs.join(scored, on=id_col, how="left")


def save_lang_profiles(path: str, profiles: dict, spark=None) -> None:
    """One JSON artifact via the shared small-file plumbing (local or any
    Hadoop ``scheme://``) — train rarely, classify everywhere."""
    from restructure_hdfs_topic_spark.compression import write_small_file

    if profiles.get("format") != "restructure_hdfs_topic_spark/langid/v1":
        raise ValueError("not a langid/v1 profile artifact")
    write_small_file(path, json.dumps(profiles).encode("utf-8"), spark=spark)


def load_lang_profiles(path: str, spark=None) -> dict:
    from restructure_hdfs_topic_spark.compression import read_small_file

    profiles = json.loads(read_small_file(path, spark=spark).decode("utf-8"))
    if profiles.get("format") != "restructure_hdfs_topic_spark/langid/v1":
        raise ValueError(f"{path}: not a langid/v1 profile artifact")
    return profiles
