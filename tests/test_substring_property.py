"""Property-based test of exact substring dedup (td14): a pure-Python
model implements the ExactSubstr rule directly (k-gram document
frequency → covered positions → islands → reassembly) and the Spark
operator must agree on every generated corpus. A 3-word vocabulary
forces heavy cross-document k-gram collisions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from omfietser_etl_spark.textops.dedup import substring_dedup

K = 3
VOCAB = ["aa", "bb", "cc"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _model(texts: list[str], k: int):
    toks = [t.split(" ") for t in texts]
    df: dict[str, set[int]] = {}
    for d, ts in enumerate(toks):
        for i in range(len(ts) - k + 1):
            df.setdefault(" ".join(ts[i : i + k]), set()).add(d)
    dup = {g for g, s in df.items() if len(s) >= 2}
    out = {}
    for d, ts in enumerate(toks):
        covered: set[int] = set()
        for i in range(len(ts) - k + 1):
            if " ".join(ts[i : i + k]) in dup:
                covered.update(range(i, i + k))
        spans = sum(
            1 for p in covered if p - 1 not in covered
        )  # islands = run starts
        clean = " ".join(t for i, t in enumerate(ts) if i not in covered)
        out[d] = (clean, len(ts), len(covered), spans)
    return out


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_substring_dedup_matches_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc: (r.clean_text, r.n_tokens, r.dup_token_cnt, r.dup_span_cnt)
        for r in substring_dedup(df, "doc_id", "text", k=K).collect()
    }
    assert got == _model(texts, K)
