"""Declared query inventory for the correctness gate.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables
(pre-registered views). The driver hashes both results (columns sorted
by name, order-insensitive), so builders and oracles must agree on
column NAMES and rounded values.

Conventions (applied on BOTH sides):
- alias every computed column identically;
- round double outputs (money 2dp, ratios/similarities 4dp);
- timestamps leave the query as epoch integers or formatted strings —
  never raw timestamp columns (ns-vs-us precision differs between
  engines);
- deterministic total orderings (unique tiebreak columns) wherever a
  LIMIT / row_number is involved.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared operator query from SURVEY.md §2."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


def all_specs() -> list[QuerySpec]:
    from . import (
        derived,
        inferencespec,
        multimodalspec,
        opsspec,
        pipelines,
        qualityspec,
        relational,
        reports,
        streaming,
        textops,
        trainprep,
    )

    specs: list[QuerySpec] = []
    for mod in (
        relational,
        derived,
        pipelines,
        qualityspec,
        textops,
        streaming,
        reports,
        multimodalspec,
        inferencespec,
        trainprep,
        opsspec,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in catalog"
    return specs
