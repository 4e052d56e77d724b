"""Mergeable-aggregate-state algebra and skew diagnostics
(operators/aggstate.py, operators/diagnostics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.operators.aggstate import (
    agg_state,
    merge_agg_state,
    state_report,
)
from omfietser_etl_spark.operators.diagnostics import skew_report
from omfietser_etl_spark.session import load

from .conftest import SF_SMOKE

KEYS, NUMS = ["o_orderstatus"], ["o_totalprice"]


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_equals_direct_recompute(spark):
    o = load(spark, SF_SMOKE, "orders")
    direct = agg_state(o, KEYS, NUMS)

    state = None
    for i in range(4):  # uneven batches, some keys absent from some
        batch = agg_state(o.filter(F.col("o_orderkey") % 4 == i), KEYS, NUMS)
        state = batch if state is None else merge_agg_state(state, batch, KEYS, NUMS)
    assert _rows(state) == _rows(direct)


def test_merge_is_order_insensitive(spark):
    o = load(spark, SF_SMOKE, "orders")
    a = agg_state(o.filter(F.col("o_orderkey") % 2 == 0), KEYS, NUMS)
    b = agg_state(o.filter(F.col("o_orderkey") % 2 == 1), KEYS, NUMS)
    assert _rows(merge_agg_state(a, b, KEYS, NUMS)) == _rows(
        merge_agg_state(b, a, KEYS, NUMS)
    )


def test_state_report_derives_floor_average(spark):
    df = spark.createDataFrame(
        [("A", 1.00), ("A", 2.01), ("B", 5.00)], ["k", "v"]
    )
    rep = {
        r.k: (r.n_rows, r.sum_v_cents, r.avg_v_cents)
        for r in state_report(agg_state(df, ["k"], ["v"]), ["v"]).collect()
    }
    assert rep["A"] == (2, 301, 150)  # floor(301/2)
    assert rep["B"] == (1, 500, 500)


def test_skew_report_orders_and_shares(spark):
    df = spark.createDataFrame(
        [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10, ["k"]
    )
    rows = skew_report(df, ["k"], top_k=2).collect()
    assert [(r.k, r.cnt, r.rank) for r in rows] == [("hot", 60, 1), ("warm", 30, 2)]
    assert rows[0].share_bp == 6000
    # max=60, mean=100/3 → ratio 1.8 → 180
    assert rows[0].skew_ratio_x100 == 180
    assert rows[0].skew_ratio_x100 == rows[1].skew_ratio_x100
