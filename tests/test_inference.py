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


def test_nb_model_classifies_known_aliases(spark):
    """The trained artifact must map the category knowledge it was
    fitted on (and near variants) to the right classes, with high
    confidence — this is the 'real model' bar the demo hash
    categorizer never met."""
    from omfietser_etl_spark.operators.inference import infer_categories_nb

    df = _titles(
        spark,
        "verse groenten en fruit",
        "koffie",
        "chocolade koekjes",
        "rode wijn",
    )
    rows = {r.title: (r.pred_label, r.conf_bp) for r in infer_categories_nb(df).collect()}
    assert rows["verse groenten en fruit"][0] == "Aardappel, groente, fruit"
    assert rows["koffie"][0] == "Koffie, thee"
    assert rows["chocolade koekjes"][0] == "Snoep, chocolade, koek"
    assert rows["rode wijn"][0] == "Wijn en bubbels"
    assert all(conf > 0 for _, conf in rows.values())


def test_nb_predictions_table_feeds_category_cascade(spark):
    """End-to-end reference parity: the trained model produces the
    title-keyed predictions table (prediction.ts:30-35 shape) and the
    cascade's ML step consumes it — an empty category resolves to the
    model's class when confidence clears the 0.65 floor."""
    from omfietser_etl_spark.operators.category import normalize_categories
    from omfietser_etl_spark.operators.inference import nb_predictions_table

    df = spark.createDataFrame(
        [("", "AH", "verse koffie bonen"), ("", "AH", "rode wijn merlot")],
        "main_category string, shop_type string, title string",
    )
    preds = nb_predictions_table(df)
    got = {r.title: r.category for r in preds.collect()}
    assert got["verse koffie bonen"] == "Koffie, thee"
    assert got["rode wijn merlot"] == "Wijn en bubbels"

    out = {
        r["title"]: r["main_category"]
        for r in normalize_categories(df, predictions=preds).collect()
    }
    # resolution depends on model confidence clearing the cascade
    # floor; both titles sit squarely inside trained classes
    assert out["verse koffie bonen"] == "Koffie, thee"
    assert out["rode wijn merlot"] == "Wijn en bubbels"


def test_nb_artifact_training_fit():
    """Driver-side (no Spark): the artifact reproduces ≥95% of its
    training labels — catches artifact/trainer drift."""
    import numpy as np

    from omfietser_etl_spark.config.categories import (
        CATEGORY_ALIAS_PATTERNS,
        FINAL_CATEGORIES,
    )
    from omfietser_etl_spark.operators.inference import (
        NB_ARTIFACT,
        NB_DIM,
        NB_HASH_MOD,
        NB_HASH_SEED,
        nb_trigram_buckets,
    )

    z = np.load(NB_ARTIFACT, allow_pickle=False)
    W, b = z["log_prob"], z["log_prior"]
    labels = [str(x) for x in z["labels"]]
    assert labels == list(FINAL_CATEGORIES)
    pairs = list(CATEGORY_ALIAS_PATTERNS) + [(c.lower(), c) for c in FINAL_CATEGORIES]
    hits = 0
    for text, cat in pairs:
        v = np.zeros(NB_DIM)
        for bk in nb_trigram_buckets(text, NB_DIM, NB_HASH_SEED, NB_HASH_MOD):
            v[bk] += 1
        hits += labels[int(np.argmax(W @ v + b))] == cat
    assert hits / len(pairs) >= 0.95


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


def test_nb_exact_path_fit_and_margin(spark):
    """The exact-integer scoring path (x8's gated variant) reproduces
    the training-alias fit and obeys its output contract: int64
    scores, non-negative margins, ties impossible to distinguish from
    margin_q == 0."""
    from omfietser_etl_spark.config.categories import CATEGORY_ALIAS_PATTERNS
    from omfietser_etl_spark.operators.inference import infer_categories_nb_exact

    aliases = spark.createDataFrame(
        list(CATEGORY_ALIAS_PATTERNS), "title string, true_cat string"
    )
    rows = infer_categories_nb_exact(aliases).collect()
    hits = sum(r.pred_label == r.true_cat for r in rows)
    assert hits / len(rows) >= 0.95
    assert all(r.margin_q >= 0 for r in rows)
    assert all(isinstance(r.score_q, int) for r in rows)


def test_nb_exact_quantization_matches_float_argmax_on_aliases():
    """Driver-side: at NB_SCALE=1e6 the quantized argmax agrees with
    the float argmax on every training alias (quantization noise is
    ~1e-6 logits vs multi-logit class margins)."""
    import numpy as np

    from omfietser_etl_spark.config.categories import CATEGORY_ALIAS_PATTERNS
    from omfietser_etl_spark.operators.inference import (
        NB_ARTIFACT,
        nb_quantized_weights,
        nb_trigram_buckets,
    )

    z = np.load(NB_ARTIFACT, allow_pickle=False)
    W = z["log_prob"].astype(np.float64)
    b = z["log_prior"].astype(np.float64)
    Wq, priorq, labels, dim, seed, mod = nb_quantized_weights()
    for text, _cat in CATEGORY_ALIAS_PATTERNS:
        v = np.zeros(dim, dtype=np.int64)
        for bk in nb_trigram_buckets(text, dim, seed, mod):
            v[bk] += 1
        assert int(np.argmax(Wq @ v + priorq)) == int(np.argmax(W @ v + b))


def test_ols3_fit_recovers_exact_plane(spark):
    """y = 3 + 2·x1 − x2 with zero noise: the normal-equation solve
    must return the exact coefficients (integers survive the double
    Cramer path and the micro-unit round untouched)."""
    from omfietser_etl_spark.operators.regression import ols3_fit

    rows = [(x1, x2, 3 + 2 * x1 - x2)
            for x1 in range(0, 20, 3) for x2 in range(-5, 6, 2)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    out = ols3_fit(df, "x1", "x2", "y").collect()[0]
    assert out.n_rows == len(rows)
    assert (out.beta0_x1e6, out.beta1_x1e6, out.beta2_x1e6) == (
        3_000_000, 2_000_000, -1_000_000,
    )


def test_ols3_fit_matches_numpy_lstsq(spark):
    """Noisy integer data: betas agree with numpy's lstsq to 1e-6
    (the solve is exact Cramer over exact integer sums, so the only
    divergence from lstsq is float round-off)."""
    import numpy as np

    from omfietser_etl_spark.operators.regression import ols3_fit

    rng = [(i, (i * 7) % 13, 100 + 5 * i - 3 * ((i * 7) % 13) + (i * i) % 11)
           for i in range(60)]
    df = spark.createDataFrame(rng, ["x1", "x2", "y"])
    out = ols3_fit(df, "x1", "x2", "y").collect()[0]
    a = np.array([[1.0, x1, x2] for x1, x2, _ in rng])
    b = np.array([float(y) for _, _, y in rng])
    beta = np.linalg.lstsq(a, b, rcond=None)[0]
    got = (out.beta0_x1e6, out.beta1_x1e6, out.beta2_x1e6)
    # micro-unit integers: |got/1e6 - lstsq| < 1e-6 <=> within 1 unit
    assert max(abs(g - e * 1e6) for g, e in zip(got, beta)) < 1.0
