"""Train the real category-classifier artifact for X2 inference.

The reference ships precomputed Dutch-BERT predictions
(`src/scripts/ml/batch_categorize.py:27-41`,
`processed_data/ml_predictions.json`) consumed as a title-keyed
lookup. No pretrained-network weights can ship here, so the honest
equivalent is a model TRAINED IN-REPO on the public category
knowledge the repo already carries: the ~165 alias patterns + 26
final category names (`config/categories.py`, mirroring
normalizer.ts:105-382). This script fits a multinomial Naive Bayes
over hashed character 3-grams of those labeled strings — fully
deterministic, pure numpy, no randomness — and writes
`omfietser_etl_spark/models/category_nb.npz` (~400 KB float32).

Run:  python tools/train_category_model.py
The artifact is committed; re-run only when the alias table changes.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omfietser_etl_spark.config.categories import (  # noqa: E402
    CATEGORY_ALIAS_PATTERNS,
    FINAL_CATEGORIES,
)
from omfietser_etl_spark.operators.inference import (  # noqa: E402
    NB_DIM,
    NB_HASH_MOD,
    NB_HASH_SEED,
    nb_trigram_buckets,
)

ALPHA = 0.1  # Laplace smoothing
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "omfietser_etl_spark", "models", "category_nb.npz",
)


def training_set() -> list[tuple[str, str]]:
    """(text, label) pairs: every alias pattern plus each canonical
    category name labeled as itself."""
    pairs = [(alias, cat) for alias, cat in CATEGORY_ALIAS_PATTERNS]
    pairs += [(cat.lower(), cat) for cat in FINAL_CATEGORIES]
    return pairs


def main() -> None:
    labels = list(FINAL_CATEGORIES)
    idx = {c: i for i, c in enumerate(labels)}
    counts = np.zeros((len(labels), NB_DIM), dtype=np.float64)
    prior = np.zeros(len(labels), dtype=np.float64)
    pairs = training_set()
    for text, cat in pairs:
        i = idx[cat]
        prior[i] += 1
        for b in nb_trigram_buckets(text, NB_DIM, NB_HASH_SEED, NB_HASH_MOD):
            counts[i, b] += 1

    log_prior = np.log(prior / prior.sum())
    totals = counts.sum(axis=1, keepdims=True)
    log_prob = np.log((counts + ALPHA) / (totals + ALPHA * NB_DIM))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        log_prob=log_prob.astype(np.float32),
        log_prior=log_prior.astype(np.float32),
        labels=np.array(labels),
        dim=np.array([NB_DIM]),
        hash_seed=np.array([NB_HASH_SEED]),
        hash_mod=np.array([NB_HASH_MOD]),
    )

    # training-set fit report (sanity: aliases must map to their class)
    W, b = log_prob, log_prior
    hits = 0
    for text, cat in pairs:
        v = np.zeros(NB_DIM)
        for bk in nb_trigram_buckets(text, NB_DIM, NB_HASH_SEED, NB_HASH_MOD):
            v[bk] += 1
        if labels[int(np.argmax(W @ v + b))] == cat:
            hits += 1
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes); "
          f"training fit {hits}/{len(pairs)}")


if __name__ == "__main__":
    main()
