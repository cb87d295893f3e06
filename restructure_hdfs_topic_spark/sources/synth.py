"""Deterministic synthetic fixtures with CONTROLLED structure.

The driver's ``embeddings`` table is near-isotropic (measured r10: top-8
eigenvalues ~2.1% each vs 1.56% for pure noise — STATUS.md), which makes
it useless for gating dimensionality-reduction quality: PCA to any q
keeps ~q/64 of the variance and ANN recall after projection collapses by
construction, not by defect.  Real embedding corpora are the opposite —
encoder outputs concentrate in a low-rank subspace.  This module
generates that shape on demand: a planted low-rank mixture with a
decaying spectrum plus small isotropic noise, fully deterministic (no
wall clock, no global RNG state) and partitioning-independent, so it can
back recall GATES (tests, extras queries, sf1 digest pairs) instead of
recorded negative results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def anisotropic_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    rank: int = 8,
    seed: int = 7,
    decay: float = 0.75,
    noise_scale: float = 0.05,
    n_partitions: int | None = None,
) -> DataFrame:
    """``(vec_id long, embedding array<float>)`` with a planted decaying
    spectrum: ``x_i = z_i @ diag(decay^r) @ W + noise_scale * eps_i``,
    ``z_i ~ N(0, I_rank)``, ``W`` a fixed (rank × dim) Gaussian frame,
    values rounded to 4 dp (the similarity family's quantization grid).

    Determinism: ``W`` comes from ``default_rng(seed)`` on each executor
    (same bytes everywhere — NumPy's Philox/PCG streams are
    platform-stable); row ``i`` draws from ``default_rng([seed, i])``,
    a pure function of the id — so the table is IDENTICAL under any
    partitioning, batch size, or engine revisit, the property every
    digest pair in scale_check relies on.

    Scale shape: embarrassingly parallel ``mapInPandas`` over
    ``spark.range`` — no shuffle, no driver data; per-row RNG init is
    ~µs, negligible against the (rank+dim) Gaussian draws.
    """
    if not (0 < rank <= dim):
        raise ValueError(f"rank must be in (0, {dim}] (got {rank})")
    # Partitions from a ROWS-PER-TASK target (r14, VERDICT r13 #1): the
    # old isqrt(n) cap-64 fanned 15k rows into 64 ~230-row Python tasks —
    # dispatch overhead over compute.  ~2k rows/task keeps every kernel
    # invocation (this generator and the persisted fixture's downstream
    # PCA/ANN consumers, which inherit the partitioning) compute-bound;
    # values are identical under ANY partitioning (per-row RNG), pinned
    # by the scale_check digests.
    parts = n_partitions or max(1, min(256, (n + 2047) // 2048))

    def gen(batches):
        import numpy as np
        import pandas as pd

        w = np.random.default_rng(seed).standard_normal((rank, dim))
        w *= (decay ** np.arange(rank))[:, None]
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                rng = np.random.default_rng([seed, int(i)])
                z = rng.standard_normal(rank)
                eps = rng.standard_normal(dim)
                out[j] = z @ w + noise_scale * eps
            vals = np.round(out, 4).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vals)})

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
