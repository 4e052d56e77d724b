"""Training-shard export sink: the last hop of the text-to-tensor
chain (ts5 shuffle → ts6 tokenize → HERE → dataloader).

A training run does not read a lake table; it reads N shard files in
a fixed order, and the loader contract is (a) shard assignment and
intra-shard order are reproducible (epoch = salt), (b) a manifest
says exactly how many rows/tokens each shard holds so the loader can
plan steps-per-epoch WITHOUT scanning data, (c) a half-written export
is never mistaken for a complete one.

Scale shape: `shuffle_order` is one shuffle keyed on shard + an
intra-shard sort (no global sort); the write is
`repartition(shard) → sortWithinPartitions → partitionBy(shard)` so
every shard directory holds position-ordered rows. The manifest agg
is shard-cardinality-sized. The manifest commit is write-tmp +
fsync + atomic rename — readers either see the previous complete
export or the new one (same `_CURRENT` discipline as the parquet
state store in `streaming/incremental.py`).

Mirrors the reference's completion-flag epilogue
(`src/api/services/job-manager.ts:278-348` writes progress/complete
JSON after the batch) — generalized to a loader-consumable manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textops.sampling import hash_bucket, shuffle_order

MANIFEST_NAME = "_MANIFEST.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shuffle",
    token_count_col: str | None = None,
) -> dict:
    """Export ``df`` as ``n_shards`` position-ordered shard dirs +
    an atomically-committed manifest. Returns the manifest dict.

    ``token_count_col``: optional precomputed per-row token count —
    included per shard so the dataloader can budget tokens, not just
    rows, without reading data.
    """
    ordered = shuffle_order(df, id_col, n_shards, salt)
    (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

    aggs = [F.count("*").alias("rows")]
    if token_count_col is not None:
        aggs.append(F.sum(F.col(token_count_col)).cast("long").alias("tokens"))
    # manifest counts need only the (pure hash) shard assignment, not
    # the positional window — a map-side-combined agg pass, no sort
    assign = df.select(
        F.pmod(hash_bucket(id_col, salt + ":shard"), F.lit(n_shards)).alias("shard"),
        *( [F.col(token_count_col)] if token_count_col is not None else [] ),
    )
    per_shard = assign.groupBy("shard").agg(*aggs).collect()  # k rows

    empty = {"rows": 0, **({"tokens": 0} if token_count_col is not None else {})}
    shards = {str(s): dict(empty) for s in range(n_shards)}
    for r in per_shard:
        entry = {"rows": r["rows"]}
        if token_count_col is not None:
            entry["tokens"] = r["tokens"]
        shards[str(r["shard"])] = entry
    manifest = {
        "format": "parquet",
        "n_shards": n_shards,
        "salt": salt,
        "id_col": id_col,
        "total_rows": sum(e["rows"] for e in shards.values()),
        "shards": shards,
    }
    if token_count_col is not None:
        manifest["total_tokens"] = sum(e["tokens"] for e in shards.values())

    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def read_manifest(path: str) -> dict:
    """Load a committed export manifest; raises FileNotFoundError for
    an absent/incomplete export (the .tmp never counts)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def read_training_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard, position-ordered — what a dataloader worker reads.

    The shard dir holds a single sorted file (the export coalesced per
    shard), so parquet row order IS position order; the sort here is a
    cheap in-memory guard in case a future writer splits files.
    """
    return spark.read.parquet(os.path.join(path, f"shard={shard}")).sortWithinPartitions(
        "pos"
    )
