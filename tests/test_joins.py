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
