"""Property-based tests (hypothesis) for line-level dedup: random
line-structured corpora vs a pure-Python model of the exact rule (strip
every line whose trimmed form occurs >= min_count corpus-wide; blank
lines never count; untouched docs byte-exact; all-dropped docs -> "").

One DataFrame per hypothesis example (many docs per case) so Spark jobs
amortize and the suite stays fast."""

import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from restructure_hdfs_topic_spark.operators.dedup import strip_duplicated_lines

# Small line alphabet forces real cross-doc collisions; whitespace
# paddings exercise the trimmed-matching rule.
line = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", " alpha ", "\tbeta", "", "  ", "epsilon zeta"]
)
doc = st.lists(line, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))
corpus = st.lists(doc, min_size=1, max_size=12)


def _model(texts: list[str], min_count: int) -> list[str]:
    from collections import Counter

    counts = Counter()
    for t in texts:
        for ln in t.split("\n"):
            tr = ln.strip()
            if tr:
                counts[tr] += 1
    out = []
    for t in texts:
        lines = t.split("\n")
        dup_idx = [
            i for i, ln in enumerate(lines)
            if ln.strip() and counts[ln.strip()] >= min_count
        ]
        if not dup_idx:
            out.append(t)  # byte-exact passthrough
        else:
            keep = [ln for i, ln in enumerate(lines) if i not in set(dup_idx)]
            out.append("\n".join(keep))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus, st.integers(min_value=2, max_value=4))
def test_strip_matches_model(spark, texts, min_count):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_lines(df, "doc_id", "text", min_count).collect()
    }
    want = dict(enumerate(_model(texts, min_count)))
    assert got == want
