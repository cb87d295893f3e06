"""Model-free document embeddings via the hashing trick.

The embedding-based operators (cosine top-k / ANN / SemDeDup near-dup
groups) consume an ``array<float>`` column; in a real pipeline that column
comes from a learned encoder (a Pandas-UDF model server call).  This
operator fills the embed step with the classic HASHING-TRICK vectorizer
(Weinberger et al. 2009): token ``t`` contributes ``sign(h(t))`` to bucket
``h(t) mod dim`` with term frequency, and the vector is L2-normalized —
deterministic, training-free, and engine-reproducible, so the whole
semantic-dedup pipeline runs end-to-end (and oracle-checks) without any
model artifact.  Cosine similarity over these vectors approximates TF
overlap — the right fixture semantics for near-dup detection even though a
learned encoder would capture more.

The token hash is the repo's standard polynomial (``acc*131 + codepoint
mod 2^31-1`` — ``functions.text.poly_hash`` / the simhash kernel / the
DuckDB ``_TOKHASH`` fragment), so DuckDB reproduces every vector bit-for-
bit after rounding.  One Arrow crossing; a per-batch token-hash cache
makes the char-level fold run once per distinct token (Zipf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from restructure_hdfs_topic_spark.functions.text import HASH_BASE, HASH_MOD


def feature_hash_embed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """``(id, vec array<double>)`` hashing-trick embeddings.  Empty or NULL
    text yields the zero vector.  Values are rounded so cross-engine
    float-summation order cannot flip a comparison."""
    if dim < 2:
        raise ValueError("dim must be >= 2")

    def kernel(batches):
        import re

        import numpy as np
        import pandas as pd

        # Java's \s is ASCII-only; match the JVM/DuckDB tokenizer exactly.
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        cache: dict[str, int] = {}

        def phash(tok: str) -> int:
            h = cache.get(tok)
            if h is None:
                acc = 0
                for ch in tok:
                    acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
                cache[tok] = h = acc
            return h

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            vecs = []
            for text in pdf[text_col]:
                t = (text or "").strip().lower()
                v = np.zeros(dim, dtype=np.float64)
                if t:
                    toks = ws.split(t)
                    h = np.fromiter(
                        (phash(tk) for tk in toks), dtype=np.int64, count=len(toks)
                    )
                    # Sign from a bit INDEPENDENT of the bucket index:
                    # h % 2 would be fully determined by (h % dim) for even
                    # dim, giving every token in a bucket the same sign —
                    # colliding tokens would always add constructively
                    # instead of cancelling in expectation, the exact bias
                    # the Weinberger sign trick removes.
                    np.add.at(v, h % dim, np.where((h // dim) % 2 == 1, 1.0, -1.0))
                    norm = float(np.linalg.norm(v))
                    if norm > 0.0:
                        v /= norm
                vecs.append([float(x) for x in np.round(v, round_digits)])
            yield pd.DataFrame({"id": ids, "vec": vecs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"id {id_type}, vec array<double>"
    )
