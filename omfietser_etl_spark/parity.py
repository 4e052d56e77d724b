"""Local DuckDB-oracle parity harness.

Mimics the driver's correctness gate: run the Spark query and the
DuckDB oracle SQL over the same parquet tables, then compare row
count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted by all columns, floats rounded).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .session import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    detail: str = ""


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            # round(6) multiplies by 1e6 internally — above ~2^53/1e6
            # that round-trip corrupts exact integers (e.g. DuckDB
            # HUGEINT sums surfaced as float64). Only round small
            # magnitudes; large values are integral sums anyway.
            v = df[c]
            df[c] = v.where(v.abs() >= 1e9, v.round(6))
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    df = _normalize(df)
    if len(df) == 0:
        return "empty"

    def cell(v) -> str:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\\N"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6f}".rstrip("0").rstrip(".")
        return str(v)

    lines = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(name: str, spark_df, oracle_sql: str, con) -> ParityResult:
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return ParityResult(
            name, False, len(sp), len(du),
            f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}",
        )
    if len(sp) != len(du):
        return ParityResult(name, False, len(sp), len(du), "row count mismatch")
    hs, hd = _value_hash(sp), _value_hash(du)
    if hs != hd:
        return ParityResult(name, False, len(sp), len(du), _diff_hint(sp, du))
    return ParityResult(name, True, len(sp), len(du))


def _diff_hint(sp: pd.DataFrame, du: pd.DataFrame) -> str:
    """Best-effort mismatch localization for debugging."""
    sp, du = _normalize(sp), _normalize(du)
    key_cols = list(sp.columns)
    try:
        sps = sp.sort_values(key_cols).reset_index(drop=True)
        dus = du.sort_values(key_cols).reset_index(drop=True)
        for c in key_cols:
            a, b = sps[c], dus[c]
            if a.dtype != b.dtype:
                try:
                    b = b.astype(a.dtype)
                except (ValueError, TypeError):
                    return f"dtype mismatch on {c}: {a.dtype} vs {b.dtype}"
            neq = a.ne(b) & ~(a.isna() & b.isna())
            if neq.any():
                i = int(neq.idxmax())
                return (
                    f"value mismatch col={c} row~{i}: "
                    f"spark={sps[c].iloc[i]!r} oracle={dus[c].iloc[i]!r}"
                )
        return "hash mismatch (values look equal after normalize — ordering/precision?)"
    except Exception as e:  # noqa: BLE001 — diagnostics only
        return f"hash mismatch (diff failed: {e})"
