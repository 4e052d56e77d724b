"""Model-inference column operator (SURVEY §2 X2).

The reference generates category predictions with an offline BERT
batch job (`src/scripts/ml/batch_categorize.py:27-41`) and consumes
them as a title-keyed lookup (`category/prediction.ts:74-87`).
:func:`infer_column` generalizes that to an *online* inference column:
any batch model function runs inside ``mapInPandas`` over Arrow
batches, so

- the model executes once per Arrow batch (vectorized), not per row;
- model weights load once per Python worker (pass a loader, not a
  loaded model, so the broadcast-pickle stays small);
- rows never leave executors — the 100 TB shape.

This is the same contract as ``pyspark.ml.functions.predict_batch_udf``
but dependency-free and schema-explicit. The multimodal extractor
(`multimodal/media.py:82`) is the same pattern specialized to bytes.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from ..config.categories import FINAL_CATEGORIES
from ..textops.constants import CHAR_SEED, MOD

# confidence is carried in exact basis points (see functions/exact.py)
CONF_THRESHOLD_BP = 6500

# ---- real NB category model (trained artifact) -------------------- #
# Hashed-character-3-gram multinomial Naive Bayes, trained by
# tools/train_category_model.py on the repo's own category knowledge
# (alias patterns + canon names — the public equivalent of the
# reference's precomputed BERT predictions, batch_categorize.py:27-41).
NB_DIM = 4096
NB_HASH_SEED = CHAR_SEED
NB_HASH_MOD = MOD
NB_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "category_nb.npz",
)


def nb_trigram_buckets(text: str, dim: int, seed: int, mod: int) -> list[int]:
    """Hashed char-3-gram feature buckets of a lowercased, padded
    string. Pure function shared by the trainer and the worker-side
    model closure (re-implemented there by value)."""
    s = f" {(text or '').lower()} "
    out = []
    for i in range(len(s) - 2):
        h = seed
        for ch in s[i : i + 3]:
            h = (h * 31 + ord(ch)) % mod
        out.append(h % dim)
    return out


def infer_column(
    df: DataFrame,
    model_loader: Callable[[], Callable[[pd.DataFrame], pd.DataFrame]],
    input_cols: list[str],
    output_ddl: str,
    batch_size: int | None = None,
) -> DataFrame:
    """Append model outputs as columns, Arrow-batched.

    ``model_loader`` is called ONCE per Python worker and must return
    the actual batch model: ``model(batch: pd.DataFrame) ->
    pd.DataFrame`` where the input has exactly ``input_cols`` and the
    output has the ``output_ddl`` columns, same length and order.

    ``batch_size`` optionally re-chunks Arrow batches before the model
    sees them (GPU-memory-bound models want fixed batch shapes).
    """
    out_struct = StructType.fromDDL(output_ddl)
    full_schema = StructType(list(df.schema.fields) + list(out_struct.fields))
    cols = list(input_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_loader()
        for pdf in batches:
            if pdf.empty:
                continue
            chunks = (
                [pdf]
                if batch_size is None
                else [pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size)]
            )
            for chunk in chunks:
                out = model(chunk[cols].reset_index(drop=True))
                if len(out) != len(chunk):
                    raise ValueError(
                        f"model returned {len(out)} rows for a {len(chunk)}-row batch"
                    )
                yield pd.concat(
                    [chunk.reset_index(drop=True), out.reset_index(drop=True)], axis=1
                )

    return df.mapInPandas(run, full_schema)


def make_demo_category_loader() -> Callable[[], Callable[[pd.DataFrame], pd.DataFrame]]:
    """Deterministic stand-in for the reference's BERT categorizer
    (`batch_categorize.py:27-41`): label = canon[poly_hash(title) mod
    26], confidence = hash mod 10000 bp. Oracle-expressible (the same
    polynomial hash the dedup oracles replicate), so the inference
    *plumbing* sits under the exact correctness gate; swap the body
    for a real model, keep the contract.

    Returned as a runtime-created closure over plain data so
    cloudpickle ships it BY VALUE — Python workers never need this
    package importable (the driver may run from any directory; same
    discipline as multimodal/media.py:94)."""
    labels = tuple(FINAL_CATEGORIES)
    seed, mod = CHAR_SEED, MOD

    def loader() -> Callable[[pd.DataFrame], pd.DataFrame]:
        import pandas as _pd

        def model(batch):
            out_label, out_conf = [], []
            for title in batch["title"]:
                h = seed
                for ch in title or "":
                    h = (h * 31 + ord(ch)) % mod
                out_label.append(labels[h % len(labels)])
                out_conf.append(h % 10000)
            return _pd.DataFrame({"pred_label": out_label, "conf_bp": out_conf})

        return model

    return loader


def demo_category_model_loader() -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Driver-side convenience: the demo model itself."""
    return make_demo_category_loader()()


def make_nb_category_loader(
    artifact_path: str | None = None,
) -> Callable[[], Callable[[pd.DataFrame], pd.DataFrame]]:
    """Loader for the REAL trained category model (multinomial NB over
    hashed char-3-grams; artifact from tools/train_category_model.py).

    The closure captures only the artifact PATH and hash constants —
    pickled by value, workers need numpy/pandas but never this
    package. Weights load once per worker (the infer_column contract);
    scoring is one dense matmul per Arrow batch. On a real cluster
    ship the .npz with ``spark.files`` and resolve via
    ``SparkFiles.get``; in local mode the repo path is visible as-is.

    Outputs per row: pred_label (argmax class), conf_bp (softmax
    probability of the argmax in basis points, float64 rounded to
    int64 — deterministic on identical IEEE inputs).
    """
    path = artifact_path or NB_ARTIFACT

    def loader() -> Callable[[pd.DataFrame], pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        z = _np.load(path, allow_pickle=False)
        W = z["log_prob"].astype(_np.float64)        # (C, D)
        b = z["log_prior"].astype(_np.float64)       # (C,)
        labels = [str(x) for x in z["labels"]]
        dim = int(z["dim"][0])
        seed = int(z["hash_seed"][0])
        mod = int(z["hash_mod"][0])

        def model(batch: _pd.DataFrame) -> _pd.DataFrame:
            X = _np.zeros((len(batch), dim), dtype=_np.float64)
            for r, title in enumerate(batch["title"]):
                s = f" {(title or '').lower()} "
                for i in range(len(s) - 2):
                    h = seed
                    for ch in s[i : i + 3]:
                        h = (h * 31 + ord(ch)) % mod
                    X[r, h % dim] += 1.0
            scores = X @ W.T + b                     # (N, C)
            pred = scores.argmax(axis=1)
            m = scores.max(axis=1, keepdims=True)
            p = _np.exp(scores - m)
            conf = p[_np.arange(len(batch)), pred] / p.sum(axis=1)
            return _pd.DataFrame(
                {
                    "pred_label": [labels[i] for i in pred],
                    "conf_bp": _np.round(conf * 10000).astype(_np.int64),
                }
            )

        return model

    return loader


# Quantization scale for the exact-integer NB scoring path: log-probs
# and log-priors are staged as round(x * NB_SCALE) int64 micrologits,
# so scores are pure int64 arithmetic — bit-identical across numpy,
# Spark and the DuckDB oracle (no float summation-order hazards).
NB_SCALE = 1_000_000


def nb_quantized_weights(artifact_path: str | None = None, scale: int = NB_SCALE):
    """Load the committed NB artifact and quantize to exact int64
    micrologits. Returns ``(Wq (C,D) int64, priorq (C,) int64,
    labels list[str], dim, seed, mod)``. Shared (by re-execution, not
    import) between the worker-side exact loader and the DuckDB
    oracle builder in ``catalog/inferencespec.py`` so both sides stage
    the identical integer weight table."""
    import numpy as np

    z = np.load(artifact_path or NB_ARTIFACT, allow_pickle=False)
    Wq = np.round(z["log_prob"].astype(np.float64) * scale).astype(np.int64)
    priorq = np.round(z["log_prior"].astype(np.float64) * scale).astype(np.int64)
    labels = [str(x) for x in z["labels"]]
    return Wq, priorq, labels, int(z["dim"][0]), int(z["hash_seed"][0]), int(z["hash_mod"][0])


def make_nb_exact_loader(
    artifact_path: str | None = None,
) -> Callable[[], Callable[[pd.DataFrame], pd.DataFrame]]:
    """Loader for the EXACT-integer variant of the trained NB model:
    same artifact, same argmax, but log-probs quantized to int64
    micrologits (``NB_SCALE``) so the whole score is integer
    arithmetic — deterministic and SQL-replayable, which is what puts
    x8 under the full value-hash gate (round-4 verdict item 3).

    Outputs per row: pred_label (argmax class, ties broken by class
    index), score_q (winning int64 micrologit score), margin_q
    (winner minus runner-up, 0 on a tie). Confidence-as-softmax stays
    on the float path (`make_nb_category_loader`); margin_q is the
    exact-arithmetic analogue.

    Closure captures only the artifact path + scale (pickled by
    value; workers need numpy/pandas only)."""
    path = artifact_path or NB_ARTIFACT
    scale = NB_SCALE

    def loader() -> Callable[[pd.DataFrame], pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        z = _np.load(path, allow_pickle=False)
        Wq = _np.round(z["log_prob"].astype(_np.float64) * scale).astype(_np.int64)
        priorq = _np.round(z["log_prior"].astype(_np.float64) * scale).astype(_np.int64)
        labels = [str(x) for x in z["labels"]]
        dim = int(z["dim"][0])
        seed = int(z["hash_seed"][0])
        mod = int(z["hash_mod"][0])

        def model(batch: _pd.DataFrame) -> _pd.DataFrame:
            X = _np.zeros((len(batch), dim), dtype=_np.int64)
            for r, title in enumerate(batch["title"]):
                s = f" {(title or '').lower()} "
                for i in range(len(s) - 2):
                    h = seed
                    for ch in s[i : i + 3]:
                        h = (h * 31 + ord(ch)) % mod
                    X[r, h % dim] += 1
            scores = X @ Wq.T + priorq               # (N, C) exact int64
            pred = scores.argmax(axis=1)             # first max = lowest class idx
            rows = _np.arange(len(batch))
            best = scores[rows, pred]
            runner = scores.copy()
            runner[rows, pred] = _np.iinfo(_np.int64).min
            margin = best - runner.max(axis=1)
            return _pd.DataFrame(
                {
                    "pred_label": [labels[i] for i in pred],
                    "score_q": best,
                    "margin_q": margin,
                }
            )

        return model

    return loader


def infer_categories_nb_exact(df: DataFrame, title_col: str = "title") -> DataFrame:
    """X2 with the real trained model on the exact-integer scoring
    path: fully gate-able (DuckDB replays the quantized argmax
    bit-for-bit via the sparse delta-weight table)."""
    return infer_column(
        df.withColumnRenamed(title_col, "title") if title_col != "title" else df,
        make_nb_exact_loader(),
        ["title"],
        "pred_label string, score_q long, margin_q long",
    )


def nb_predictions_table(df: DataFrame, title_col: str = "title") -> DataFrame:
    """Build the reference-shaped predictions table
    ``(title, category, confidence)`` from the real trained NB model,
    ready for ``operators.category.normalize_categories(predictions=)``
    — the in-engine equivalent of the reference's precomputed
    ml_predictions.json keyed by exact title (prediction.ts:30-35,
    batch_categorize.py:100+).

    Distinct-then-infer: the model scores each DISTINCT title once
    (titles repeat across scrapes/shops at scale), and the cascade's
    broadcast join fans results back out."""
    from pyspark.sql import functions as F

    distinct = (
        df.select(F.col(title_col).alias("title"))
        .where(F.col("title").isNotNull() & (F.col("title") != ""))
        .distinct()
    )
    inferred = infer_column(
        distinct,
        make_nb_category_loader(),
        ["title"],
        "pred_label string, conf_bp long",
    )
    return inferred.select(
        "title",
        F.col("pred_label").alias("category"),
        (F.col("conf_bp") / 10000.0).alias("confidence"),
    )


def infer_categories_nb(df: DataFrame, title_col: str = "title") -> DataFrame:
    """X2 with the real trained model: online NB inference + the
    reference's confidence threshold (prediction.ts:74-87)."""
    from pyspark.sql import functions as F

    inferred = infer_column(
        df.withColumnRenamed(title_col, "title") if title_col != "title" else df,
        make_nb_category_loader(),
        ["title"],
        "pred_label string, conf_bp long",
    )
    return inferred.withColumn(
        "accepted", F.col("conf_bp") >= CONF_THRESHOLD_BP
    )


def infer_categories(df: DataFrame, title_col: str = "title") -> DataFrame:
    """X2 demo pipeline: online inference + confidence threshold
    (ref consumption: category/prediction.ts:74-87 — predictions below
    the confidence floor fall back to the unresolved path)."""
    from pyspark.sql import functions as F

    inferred = infer_column(
        df.withColumnRenamed(title_col, "title") if title_col != "title" else df,
        make_demo_category_loader(),
        ["title"],
        "pred_label string, conf_bp long",
    )
    return inferred.withColumn(
        "accepted", F.col("conf_bp") >= CONF_THRESHOLD_BP
    )
