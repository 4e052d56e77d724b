"""Property-based tests for the count-min sketch (tv3) and the snake
shard balancer (ts13): pure-Python models vs the Spark operators on
generated inputs. A tiny vocabulary forces heavy hash-cell sharing in
the sketch; adversarial token-length mixes stress the balance bound.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

VOCAB = ["aa", "bb", "cc", "dd", "ee"]
_stream = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=60)


@settings(max_examples=12, deadline=None)
@given(_stream)
def test_cms_estimates_bound_exact_counts(spark, stream):
    from omfietser_etl_spark.textops.sketch import cms_build, cms_estimate

    terms = spark.createDataFrame([(t,) for t in stream], ["term"])
    sketch = cms_build(terms)
    est = {
        r.term: r.est_tf
        for r in cms_estimate(sketch, terms.distinct()).collect()
    }
    exact = Counter(stream)
    n = len(stream)
    for term, tf in exact.items():
        # CMS contract: never undercount, never exceed the stream size
        assert tf <= est[term] <= n, (term, tf, est[term])


_lengths = st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None)
@given(_lengths)
def test_snake_allocation_matches_model_and_balance_bound(spark, lengths):
    from omfietser_etl_spark.textops.sampling import token_balanced_shards

    s = 4
    rows = [(i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc long, n_tok long")
    got = {
        r.doc: (r.rank, r.shard)
        for r in token_balanced_shards(df, "doc", "n_tok", s).collect()
    }

    # model: rank by (tokens desc, id), snake over shards
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    model = {}
    masses = [0] * s
    for r0, (doc, n) in enumerate(order):
        block, pos = divmod(r0, s)
        shard = pos if block % 2 == 0 else s - 1 - pos
        model[doc] = (r0 + 1, shard)
        masses[shard] += n
    assert got == model

    # LPT-ish balance: spread bounded by 2× the largest document
    assert max(masses) - min(masses) <= 2 * max(lengths)


_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_star_components_equal_label_propagation_on_random_graphs(spark, edges):
    from omfietser_etl_spark.textops.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["doc_lo", "doc_hi"]
    )
    a = sorted(map(tuple, connected_components(pairs).collect()))
    b = sorted(map(tuple, connected_components_star(pairs).collect()))
    assert a == b
