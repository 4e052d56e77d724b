"""X2 model-inference column operator contract tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from omfietser_etl_spark.operators.inference import (
    CONF_THRESHOLD_BP,
    demo_category_model_loader,
    infer_categories,
    infer_column,
)


def _titles(spark, *names):
    return spark.createDataFrame([(i, n) for i, n in enumerate(names)], "pid int, title string")


def test_infer_column_appends_model_outputs(spark):
    df = _titles(spark, "alpha", "beta", "gamma")

    def loader():
        def model(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n_chars": batch["title"].str.len().astype("int64")})

        return model

    out = infer_column(df, loader, ["title"], "n_chars long")
    rows = {r.title: r.n_chars for r in out.collect()}
    assert rows == {"alpha": 5, "beta": 4, "gamma": 5}
    # passthrough schema preserved, outputs appended
    assert out.columns == ["pid", "title", "n_chars"]


def test_infer_column_batch_size_rechunks(spark):
    df = _titles(spark, *[f"t{i}" for i in range(10)]).coalesce(1)
    sizes = []

    def loader():
        def model(batch: pd.DataFrame) -> pd.DataFrame:
            sizes.append(len(batch))  # runs executor-side; only len matters
            return pd.DataFrame({"one": [1] * len(batch)})

        return model

    out = infer_column(df, loader, ["title"], "one long", batch_size=4)
    assert out.count() == 10  # 4+4+2 chunks recombine losslessly


def test_infer_column_row_count_contract(spark):
    df = _titles(spark, "a", "b").coalesce(1)

    def loader():
        return lambda batch: pd.DataFrame({"x": [1]})  # wrong length

    with pytest.raises(Exception, match="rows for a"):
        infer_column(df, loader, ["title"], "x long").collect()


def test_demo_model_deterministic_and_thresholded(spark):
    model = demo_category_model_loader()
    out1 = model(pd.DataFrame({"title": ["Appelsap 1L", "Bier krat"]}))
    out2 = model(pd.DataFrame({"title": ["Appelsap 1L", "Bier krat"]}))
    pd.testing.assert_frame_equal(out1, out2)
    assert (out1["conf_bp"] >= 0).all() and (out1["conf_bp"] < 10000).all()

    df = _titles(spark, "Appelsap 1L", "Bier krat", "Melk 2L")
    res = infer_categories(df)
    got = res.filter(F.col("accepted")).select("conf_bp").collect()
    assert all(r.conf_bp >= CONF_THRESHOLD_BP for r in got)
