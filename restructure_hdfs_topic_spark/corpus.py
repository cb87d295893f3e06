"""Fluent corpus-curation facade.

Thin chainable wrapper over the operator modules so a pipeline reads the
way it runs — each step returns a new ``Corpus`` over a lazy DataFrame
(nothing executes until an action), and ``df`` unwraps at any point:

    from restructure_hdfs_topic_spark.corpus import Corpus

    packed = (
        Corpus(docs)                       # (doc_id, source, text, ...)
        .normalize()
        .gopher_gate()
        .strip_duplicated_lines()
        .strip_duplicated_spans(k=8)
        .near_dup_drop(threshold=0.5)
        .mixture_sample({"web": 5, "books": 3})
        .pack(budget=2048)                 # -> pack manifest DataFrame
    )

Every method delegates to the tested operator (same defaults, same scale
shapes); this module adds NO semantics of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Corpus:
    """A document corpus: a DataFrame with an id column, a text column,
    and optionally a strata/source column."""

    def __init__(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        strata_col: str = "source",
    ):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col
        self.strata_col = strata_col

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col, self.strata_col)

    @classmethod
    def from_warc(cls, spark, paths) -> "Corpus":
        """Start a corpus straight from crawl files: parse ``.warc[.gz]``
        under ``paths`` and keep successful textual responses as
        (doc_id, url, fetched_at, text) — the usual next call is
        ``.strip_html()``.  Delegates to ``sources/warc.py``."""
        from restructure_hdfs_topic_spark.sources.warc import (
            read_warc,
            warc_responses_as_documents,
        )

        docs = warc_responses_as_documents(read_warc(spark, paths))
        return cls(docs, id_col="doc_id", text_col="text", strata_col="url")

    @staticmethod
    def crawl_health(spark, paths) -> DataFrame:
        """Companion to ``from_warc``: the rollup of everything that
        projection DROPS (redirect chains, revisits, errors, quarantined
        captures) — (warc_type, status_class, decode_status, n_records,
        n_urls).  Delegates to ``sources/warc.warc_crawl_health``."""
        from restructure_hdfs_topic_spark.sources.warc import (
            read_warc,
            warc_crawl_health,
        )

        return warc_crawl_health(read_warc(spark, paths))

    # -- text hygiene -----------------------------------------------------
    def strip_html(self) -> "Corpus":
        from restructure_hdfs_topic_spark.functions.text import strip_html

        return self._wrap(
            self.df.withColumn(self.text_col, strip_html(F.col(self.text_col)))
        )

    def line_corrections(self, max_removed_ratio: float = 0.05) -> "Corpus":
        """RefinedWeb line-wise corrections: strip boilerplate lines, drop
        heavily-damaged documents."""
        from restructure_hdfs_topic_spark.functions.text import line_corrections

        return self._wrap(
            line_corrections(self.df, self.id_col, self.text_col, max_removed_ratio)
        )

    def normalize(self, nfc: bool = False) -> "Corpus":
        from restructure_hdfs_topic_spark.functions.text import (
            nfc_normalize_text,
            normalize_text,
        )

        t = normalize_text(F.col(self.text_col))
        if nfc:
            t = nfc_normalize_text(t)
        return self._wrap(self.df.withColumn(self.text_col, t))

    def redact_pii(self) -> "Corpus":
        from restructure_hdfs_topic_spark.functions.text import redact_pii

        return self._wrap(
            self.df.withColumn(self.text_col, redact_pii(F.col(self.text_col)))
        )

    # -- quality gates ----------------------------------------------------
    def c4_clean(
        self,
        min_words: int = 3,
        min_sentences: int = 5,
        badwords: tuple = (),
    ) -> "Corpus":
        """C4 cleaning heuristics (line keep + page drops); pair with
        ``strip_duplicated_unit_spans`` for the paper's full recipe."""
        from restructure_hdfs_topic_spark.functions.text import c4_clean

        return self._wrap(
            c4_clean(
                self.df, self.text_col, min_words, min_sentences, badwords
            )
        )

    def gopher_gate(self, **kwargs) -> "Corpus":
        from restructure_hdfs_topic_spark.functions.text import (
            gopher_metrics,
            gopher_passes,
        )

        metrics = gopher_metrics(F.col(self.text_col))
        return self._wrap(
            self.df.filter(gopher_passes(*[c for _, c in metrics], **kwargs))
        )

    def repetition_gate(
        self, thresholds: dict[str, float] | None = None
    ) -> "Corpus":
        """Gopher REPETITION filters (Rae et al. 2021 table A1's dup-line/
        paragraph and n-gram character fractions) — the companion family
        to ``gopher_gate``'s word-level rules."""
        from restructure_hdfs_topic_spark.functions.text import (
            gopher_repetition_metrics,
            gopher_repetition_passes,
        )

        base = self.df.columns
        return self._wrap(
            gopher_repetition_metrics(self.df, self.text_col)
            .filter(gopher_repetition_passes(thresholds))
            .select(*base)
        )

    def dsir_select(
        self, target: "Corpus | DataFrame", k: int, **kwargs
    ) -> "Corpus":
        """DSIR importance resampling toward a target corpus (Xie et al.
        2023): keep the ``k`` documents Gumbel-top-k-sampled ∝ their
        hashed-n-gram likelihood ratio vs ``target``."""
        from restructure_hdfs_topic_spark.operators.dsir import dsir_select

        tgt = target.df if isinstance(target, Corpus) else target
        return self._wrap(
            dsir_select(
                self.df, tgt, k=k, id_col=self.id_col,
                text_col=self.text_col, **kwargs,
            ).drop("log_importance", "gumbel_key")
        )

    def duplication_weights(self, groups: DataFrame | None = None) -> DataFrame:
        """Soft dedup: per-doc duplicate-cluster size + inverse-frequency
        sampling weight (feed to ``weighted_hash_sample``)."""
        from restructure_hdfs_topic_spark.operators.dedup import (
            duplication_weights,
        )

        return duplication_weights(self.df, self.id_col, self.text_col, groups)

    def quality_signals(self) -> DataFrame:
        """Every per-document quality signal as columns (RedPajama-v2's
        annotate-don't-filter shape) — one shuffle-free scan."""
        from restructure_hdfs_topic_spark.plans.signals import (
            annotate_quality_signals,
        )

        return annotate_quality_signals(self.df, self.text_col)

    def leak_report(
        self, benchmark: "Corpus | DataFrame", n: int = 13
    ) -> DataFrame:
        """Per-benchmark-example contamination table (GPT-3 §C): how much
        of each eval example leaked into this corpus, from how many
        documents."""
        from restructure_hdfs_topic_spark.operators.dedup import (
            benchmark_leak_report,
        )

        b = benchmark.df if isinstance(benchmark, Corpus) else benchmark
        return benchmark_leak_report(
            self.df, b, self.id_col, self.text_col, n=n
        )

    def filter_blocked_domains(self, blocked: list[str]) -> "Corpus":
        from restructure_hdfs_topic_spark.plans.curation import (
            filter_blocked_domains,
        )

        return self._wrap(
            filter_blocked_domains(self.df, blocked, self.id_col, self.text_col)
        )

    # -- dedup ------------------------------------------------------------
    def exact_dedup(self) -> "Corpus":
        """Keep the lowest-id copy of each distinct text."""
        from pyspark.sql import Window

        w = Window.partitionBy(F.xxhash64(F.col(self.text_col))).orderBy(self.id_col)
        return self._wrap(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def strip_duplicated_lines(self, min_count: int = 2) -> "Corpus":
        from restructure_hdfs_topic_spark.operators.dedup import (
            strip_duplicated_lines,
        )

        return self._wrap(
            strip_duplicated_lines(self.df, self.id_col, self.text_col, min_count)
        )

    def cached(self, scope: str = "corpus.cached") -> "Corpus":
        """Scope-persist the current frame — a stage boundary marker for
        chains whose downstream step consumes its input more than once
        (the span scrub's count + rebuild, near-dup's pairs + anti-join).
        One live cache generation per scope (``caching.scoped_persist``);
        a warm same-plan re-run reuses the populated cache."""
        from restructure_hdfs_topic_spark.caching import scoped_persist

        return self._wrap(scoped_persist(self.df, scope=scope))

    def strip_duplicated_spans(self, k: int = 8) -> "Corpus":
        from restructure_hdfs_topic_spark.operators.dedup import (
            strip_duplicated_spans,
        )

        return self._wrap(
            strip_duplicated_spans(self.df, self.id_col, self.text_col, k=k)
        )

    def dedup_by_url(
        self, url_col: str = "url", keep: str = "min", extra_tracking: tuple = ()
    ) -> "Corpus":
        """URL-level dedup (RefinedWeb stage 1): one doc per canonical URL."""
        from restructure_hdfs_topic_spark.operators.dedup import dedup_by_url

        return self._wrap(
            dedup_by_url(self.df, self.id_col, url_col, keep, extra_tracking)
        )

    def strip_duplicated_unit_spans(self, sep: str = "\n", k: int = 3) -> "Corpus":
        """C4-style corpus-global k-unit span dedup (three-sentence rule)."""
        from restructure_hdfs_topic_spark.operators.dedup import (
            strip_duplicated_unit_spans,
        )

        return self._wrap(
            strip_duplicated_unit_spans(self.df, self.id_col, self.text_col, sep, k)
        )

    def classify_lang(
        self, profiles: dict, doc_top: int = 100, max_chars: int | None = 4096
    ) -> "Corpus":
        """Trigram rank-profile language ID (train with
        ``operators.langid.train_lang_profiles``); adds ``lang_pred`` /
        ``lang_distance``."""
        from restructure_hdfs_topic_spark.operators.langid import classify_lang

        return self._wrap(
            classify_lang(
                self.df, profiles, self.id_col, self.text_col, doc_top, max_chars
            )
        )

    def lang_gate(
        self,
        profiles: dict,
        allowed: set[str] | None = None,
        max_distance: int | None = None,
        doc_top: int = 100,
        max_chars: int | None = 4096,
    ) -> "Corpus":
        """Keep documents whose trigram-classified language is in
        ``allowed`` (None → any non-NULL prediction) and, optionally,
        whose out-of-place distance is ≤ ``max_distance`` (a coarse
        confidence bound — gibberish scores far from every profile).
        The transient prediction columns are dropped; chain
        ``classify_lang`` instead to keep them.  Same stage
        ``curate_corpus(lang_profiles=...)`` composes."""
        from restructure_hdfs_topic_spark.plans.curation import _lang_gate

        return self._wrap(
            _lang_gate(
                self.df, profiles, allowed, max_distance,
                self.id_col, self.text_col, doc_top, max_chars,
            )
        )

    def quality_classifier_gate(
        self, model: dict, threshold: float = 0.5
    ) -> "Corpus":
        """Model-based quality gate (WebText/Llama-style linear classifier
        over hashed features; train with
        ``operators.classifier.train_quality_classifier``)."""
        from restructure_hdfs_topic_spark.operators.classifier import (
            quality_classifier_gate,
        )

        return self._wrap(
            quality_classifier_gate(
                self.df, model, threshold, self.id_col, self.text_col
            )
        )

    def strip_repeated_paragraphs(self, sep: str = "\n\n") -> "Corpus":
        """Within-document repeated-paragraph removal (nav/banner blocks)."""
        from restructure_hdfs_topic_spark.operators.dedup import (
            strip_repeated_paragraphs,
        )

        return self._wrap(
            strip_repeated_paragraphs(self.df, self.id_col, self.text_col, sep)
        )

    def decontaminate(
        self, benchmark: DataFrame, n: int = 13, margin: int = 0
    ) -> "Corpus":
        """Surgically remove benchmark-colliding n-gram spans (GPT-3 §C
        style) instead of dropping whole documents."""
        from restructure_hdfs_topic_spark.operators.dedup import decontaminate_spans

        return self._wrap(
            decontaminate_spans(
                self.df, benchmark, self.id_col, self.text_col, n, margin
            )
        )

    def near_dup_drop(self, threshold: float = 0.5, **lsh_kwargs) -> "Corpus":
        """MinHash-LSH near-dup removal, keep-first (drop the larger id of
        each verified pair) — the curate_corpus convention.

        The input frame is scope-persisted first: LSH pair generation and
        the anti-join BOTH consume it, and in a fluent chain the input is
        typically a multi-stage prefix (strip_html → gate → scrub) that
        would otherwise re-execute once per consumer — the same persist
        ``curate_corpus`` applies at this exact stage boundary."""
        from restructure_hdfs_topic_spark.caching import scoped_persist
        from restructure_hdfs_topic_spark.operators.dedup import lsh_near_dup_pairs

        src = scoped_persist(self.df, scope="corpus.near_dup_drop.src")
        pairs = lsh_near_dup_pairs(
            src, self.id_col, self.text_col, threshold=threshold, **lsh_kwargs
        )
        losers = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        return self._wrap(src.join(losers, on=self.id_col, how="left_anti"))

    def dedup_representatives(
        self, quality_col: str | None = None, **kwargs
    ) -> "Corpus":
        """Keep the highest-quality member of each near-dup cluster."""
        from restructure_hdfs_topic_spark.operators.dedup import (
            dedup_representatives,
        )

        return self._wrap(
            dedup_representatives(
                self.df, self.id_col, self.text_col, quality_col, **kwargs
            )
        )

    # -- sampling ---------------------------------------------------------
    def mixture_sample(self, weights: dict[str, int], **kwargs) -> "Corpus":
        from restructure_hdfs_topic_spark.operators.sampling import mixture_sample

        return self._wrap(
            mixture_sample(self.df, self.id_col, self.strata_col, weights, **kwargs)
        )

    def epoch_upsample(self, epochs: dict[str, float]) -> "Corpus":
        """GPT-3/LLaMA-style per-source epoch replication (adds an
        ``epoch`` copy index; fractional epochs via the deterministic
        hash fraction)."""
        from restructure_hdfs_topic_spark.operators.sampling import (
            epoch_upsample,
        )

        return self._wrap(
            epoch_upsample(self.df, self.id_col, self.strata_col, epochs)
        )

    def temperature_sample(
        self, alpha: float = 0.3, max_rows: int | None = None
    ) -> "Corpus":
        """Alpha-sampling mixture rebalance (q_s ∝ n_s^alpha, mT5-style)."""
        from restructure_hdfs_topic_spark.operators.sampling import (
            temperature_sample,
        )

        return self._wrap(
            temperature_sample(
                self.df, self.id_col, self.strata_col, alpha, max_rows
            )
        )

    def unimax_sample(
        self,
        total_budget: int,
        max_epochs: float = 4.0,
        n_tokens_col: str = "n_tokens",
    ) -> DataFrame:
        """UniMax epoch-capped mixture realization
        (``sampling.unimax_sample``) — terminal: returns rows +
        ``epoch`` (the frame must already carry ``n_tokens_col``)."""
        from restructure_hdfs_topic_spark.operators.sampling import unimax_sample

        return unimax_sample(
            self.df,
            self.id_col,
            self.strata_col,
            total_budget,
            max_epochs=max_epochs,
            n_tokens_col=n_tokens_col,
        )

    def perplexity_gate(
        self,
        max_bits: float | None = None,
        min_bits: float | None = None,
        lo_q: float | None = None,
        hi_q: float | None = None,
        per_stratum: bool = False,
        model: str = "unigram",
    ) -> "Corpus":
        """CCNet-style LM quality gate: absolute bits/token bounds
        (``max_bits``/``min_bits``) or a quantile band (``lo_q``/``hi_q``,
        per ``strata_col`` when ``per_stratum``).  Keeps survivors with
        their ``bits_per_token`` score attached."""
        from restructure_hdfs_topic_spark.functions.text import tokens
        from restructure_hdfs_topic_spark.operators.lm import (
            perplexity_band,
            perplexity_filter,
        )

        toks = tokens(F.col(self.text_col))
        if lo_q is not None or hi_q is not None:
            out = perplexity_band(
                self.df,
                toks,
                self.id_col,
                lo_q=0.0 if lo_q is None else lo_q,
                hi_q=1.0 if hi_q is None else hi_q,
                strata_col=self.strata_col if per_stratum else None,
                model=model,
            )
        else:
            out = perplexity_filter(
                self.df, toks, self.id_col, max_bits, min_bits, model
            )
        return self._wrap(out)

    def prototype_prune(
        self,
        drop_frac: float = 0.2,
        keep: str = "hard",
        n_clusters: int | None = None,
        embed_dim: int = 64,
        embeddings: DataFrame | None = None,
    ) -> "Corpus":
        """SSL-prototypes / D4 cluster pruning composed over the corpus
        (``similarity.prototype_prune``): embed the text (hashing-trick
        ``embed()`` by default; pass ``embeddings`` as an ``(id, vec)``
        frame to use a real encoder's vectors), k-means the space with
        the exact-int Lloyd, rank every document by cosine to its OWN
        centroid, and drop the ``drop_frac`` most prototypical
        (``keep="hard"`` — redundant easy examples) or most atypical
        (``keep="easy"``) per cluster.  Keeps the surviving DOCUMENT
        rows; singletons always survive."""
        from restructure_hdfs_topic_spark.operators.similarity import (
            prototype_prune,
        )

        emb = embeddings if embeddings is not None else self.embed(dim=embed_dim)
        flags = prototype_prune(
            emb,
            drop_frac=drop_frac,
            keep=keep,
            n_clusters=n_clusters,
            id_col="id",
            vec_col="vec",
        )
        keep_ids = flags.filter(F.col("kept")).select(
            F.col("id").alias(self.id_col)
        )
        return self._wrap(self.df.join(keep_ids, on=self.id_col, how="left_semi"))

    def token_budget_sample(self, budgets: dict[str, int]) -> "Corpus":
        from restructure_hdfs_topic_spark.functions.text import token_count
        from restructure_hdfs_topic_spark.operators.sampling import (
            token_budget_sample,
        )

        counted = self.df.withColumn(
            "__n_tokens", token_count(F.col(self.text_col))
        )
        out = token_budget_sample(
            counted, self.id_col, self.strata_col, budgets, "__n_tokens"
        ).drop("__n_tokens")
        return self._wrap(out)

    # -- terminal steps ---------------------------------------------------
    def profile(self) -> DataFrame:
        from restructure_hdfs_topic_spark.operators.profile import corpus_profile

        return corpus_profile(self.df, self.text_col, self.strata_col)

    def embed(self, dim: int = 64) -> DataFrame:
        from restructure_hdfs_topic_spark.operators.embed import feature_hash_embed

        return feature_hash_embed(self.df, self.id_col, self.text_col, dim=dim)

    def bm25_search(self, queries: DataFrame, k: int = 5, **kwargs) -> DataFrame:
        """BM25-rank the corpus for a ``(query_id, term)`` batch
        (``operators.retrieval.bm25_topk``) — corpus inspection /
        decontamination triage over the curated text."""
        from restructure_hdfs_topic_spark.operators.retrieval import bm25_topk

        return bm25_topk(
            self.df, queries, k=k,
            id_col=self.id_col, text_col=self.text_col, **kwargs,
        )

    def build_bm25_index(self, path: str, n_buckets: int = 64) -> dict:
        """Materialize the on-disk BM25 inverted index of the curated
        corpus (``operators.bm25_index``) — build once, serve many."""
        from restructure_hdfs_topic_spark.operators.bm25_index import (
            build_bm25_index,
        )

        return build_bm25_index(
            self.df, path,
            id_col=self.id_col, text_col=self.text_col, n_buckets=n_buckets,
        )

    def append_bm25_segment(self, path: str) -> dict:
        """Append the corpus as a new SEGMENT of an existing on-disk BM25
        index (``operators.bm25_index.append_bm25_segment``) — the
        incremental lane for growing corpora; served scores stay
        bit-identical to a full rebuild.  Doc ids must be new."""
        from restructure_hdfs_topic_spark.operators.bm25_index import (
            append_bm25_segment,
        )

        return append_bm25_segment(self.df, path, text_col=self.text_col)

    def delete_from_bm25_index(self, path: str) -> dict:
        """Tombstone THIS corpus's ids out of an existing on-disk BM25
        index (``operators.bm25_index.delete_bm25_docs``) — the takedown
        lane: served rows become bit-identical to a rebuild without
        these documents, no corpus re-index."""
        from restructure_hdfs_topic_spark.operators.bm25_index import (
            delete_bm25_docs,
        )

        return delete_bm25_docs(
            self.df.sparkSession, path, self.df.select(self.id_col)
        )

    def forget(
        self,
        bm25_path: str | None = None,
        ivf_path: str | None = None,
        state_dir: str | None = None,
        surviving: DataFrame | None = None,
    ) -> dict:
        """The unified takedown / right-to-be-forgotten lane (VERDICT
        r12 #4): treat THIS corpus as the set of documents to forget and
        fan the deletion out to every index-like state that remembers
        them — after it returns, every serve path behaves as if the
        documents never existed:

        - ``bm25_path``: tombstone the ids out of the on-disk BM25 index
          (``delete_bm25_docs`` — served rows bit-identical to a rebuild
          on the complement);
        - ``ivf_path``: tombstone the ids out of the IVF / IVFPQ vector
          index (``delete_ivf_vectors`` — FAISS ``remove_ids``
          semantics; run ``vacuum_ivf_index`` later for physical purge);
        - ``state_dir``: retract exact fingerprints and MinHash
          signatures from the incremental-dedup state
          (``delete_from_incremental_state`` — a NEW document
          near-identical to a forgotten one is accepted again; pass
          ``surviving`` when other documents may share the deleted
          text).  The Bloom sidecar needs no retraction: the state
          version moves, every consumer gates on it, and stale bitmaps
          can only cause exact-verified false positives.

        Each lane is optional (None skips it); lanes run independently
        and the per-lane results/metas return as
        ``{"bm25": ..., "ivf": ..., "incremental": ...}`` so a caller
        can audit exactly what each store acknowledged.  At 100 TB each
        lane costs one bounded aggregation + one atomic publish — never
        a re-index.

        The lanes mutate DISJOINT artifacts (each under its own storage
        lease / CAS protocol), so they run overlapped from a small
        thread pool (r13, guide §2.6): one lane's straggler tail
        back-fills executors for the others instead of three bounded
        aggregations running strictly in sequence.  A failing lane
        raises exactly as it did sequentially (the first failure
        propagates after all submitted lanes settle)."""
        spark = self.df.sparkSession

        def _bm25():
            from restructure_hdfs_topic_spark.operators.bm25_index import (
                delete_bm25_docs,
            )

            return delete_bm25_docs(spark, bm25_path, self.df.select(self.id_col))

        def _ivf():
            from restructure_hdfs_topic_spark.operators.ivf_index import (
                delete_ivf_vectors,
            )

            return delete_ivf_vectors(
                spark,
                ivf_path,
                self.df.select(self.id_col),
                id_col=self.id_col,
            )

        def _incremental():
            from restructure_hdfs_topic_spark.operators.incremental import (
                delete_from_incremental_state,
            )

            return delete_from_incremental_state(
                spark,
                state_dir,
                docs=self.df,
                surviving=surviving,
                id_col=self.id_col,
                text_col=self.text_col,
            )

        lanes: list[tuple[str, object]] = []
        if bm25_path is not None:
            lanes.append(("bm25", _bm25))
        if ivf_path is not None:
            lanes.append(("ivf", _ivf))
        if state_dir is not None:
            lanes.append(("incremental", _incremental))
        report: dict = {"bm25": None, "ivf": None, "incremental": None}
        if len(lanes) <= 1:
            for name, fn in lanes:
                report[name] = fn()
            return report
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(lanes)) as pool:
            futs = [(name, pool.submit(fn)) for name, fn in lanes]
            errors: list[Exception] = []
            for name, fut in futs:
                try:
                    report[name] = fut.result()
                except Exception as exc:  # settle every lane, then raise
                    errors.append(exc)
        if errors:
            raise errors[0]
        return report

    def export_shards(
        self, path: str, n_shards: int = 16, fmt: str = "json"
    ) -> DataFrame:
        """Materialize the curated corpus as hash-balanced training shards
        + manifest (``plans/export.export_jsonl_shards``); returns the
        manifest.  Token totals ride along so the loader can plan."""
        from restructure_hdfs_topic_spark.functions.text import token_count
        from restructure_hdfs_topic_spark.plans.export import export_jsonl_shards

        with_counts = self.df.withColumn(
            "n_tokens", token_count(F.col(self.text_col))
        )
        return export_jsonl_shards(
            with_counts, path, n_shards=n_shards, id_col=self.id_col,
            token_count_col="n_tokens", fmt=fmt,
        )

    def grouped_holdout_split(
        self, fractions: dict[str, float], groups: DataFrame, **kwargs
    ) -> DataFrame:
        """Leakage-safe train/valid/test tagging keyed by the near-dup
        group (``sampling.grouped_holdout_split``) — pass the output of
        ``near_dup_groups``/``semdedup_groups`` as ``groups``; pass
        ``pinned=<previous (id, split) assignments>`` to FREEZE them and
        make a re-split of a grown corpus churn-zero."""
        from restructure_hdfs_topic_spark.operators.sampling import (
            grouped_holdout_split,
        )

        return grouped_holdout_split(
            self.df, self.id_col, fractions, groups, **kwargs
        )

    def holdout_split(self, fractions: dict[str, float]) -> DataFrame:
        """Deterministic train/valid/test tagging (``sampling.holdout_split``)."""
        from restructure_hdfs_topic_spark.operators.sampling import holdout_split

        return holdout_split(self.df, self.id_col, fractions)

    def epoch_shuffle(self, n_shards: int = 16, seed: int = 0) -> DataFrame:
        """Deterministic per-epoch training order: the corpus with
        ``(shard, pos)`` columns attached (``packing.epoch_shuffle``)."""
        from restructure_hdfs_topic_spark.operators.packing import epoch_shuffle

        return epoch_shuffle(self.df, self.id_col, n_shards, seed)

    def export_epoch(
        self, path: str, n_shards: int = 16, seed: int = 0, fmt: str = "json"
    ) -> DataFrame:
        """Materialize ONE epoch's deterministic training order as
        physically-sorted shard files + manifest
        (``plans/export.export_epoch_shards``)."""
        from restructure_hdfs_topic_spark.functions.text import token_count
        from restructure_hdfs_topic_spark.plans.export import export_epoch_shards

        with_counts = self.df.withColumn(
            "n_tokens", token_count(F.col(self.text_col))
        )
        return export_epoch_shards(
            with_counts, path, n_shards=n_shards, seed=seed,
            id_col=self.id_col, token_count_col="n_tokens", fmt=fmt,
        )

    def pack(self, budget: int = 2048, n_buckets: int = 16) -> DataFrame:
        """Pack manifest over post-pipeline token counts."""
        from restructure_hdfs_topic_spark.functions.text import token_count
        from restructure_hdfs_topic_spark.operators.packing import pack_sequences

        counted = self.df.select(
            self.id_col, token_count(F.col(self.text_col)).alias("n_tokens")
        )
        return pack_sequences(
            counted, id_col=self.id_col, n_tokens_col="n_tokens",
            budget=budget, n_buckets=n_buckets,
        )

    def pack_best_fit(self, budget: int = 2048, n_buckets: int = 16) -> DataFrame:
        """NO-SPLIT pack manifest (best-fit-decreasing, Ding et al. 2024):
        documents pack whole; only over-budget docs split into chunks."""
        from restructure_hdfs_topic_spark.functions.text import token_count
        from restructure_hdfs_topic_spark.operators.packing import best_fit_pack

        counted = self.df.select(
            self.id_col, token_count(F.col(self.text_col)).alias("n_tokens")
        )
        return best_fit_pack(
            counted, id_col=self.id_col, n_tokens_col="n_tokens",
            budget=budget, n_buckets=n_buckets,
        )
