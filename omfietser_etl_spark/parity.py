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
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df


def _dtype_kind(dtype) -> str:
    """Coarse dtype class: int-vs-float is the driver-visible boundary
    (DuckDB HUGEINT -> float64 vs Spark int64 hash-fails at the gate);
    width differences (int32 vs int64) render identically and pass."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def _value_hash(df: pd.DataFrame) -> str:
    """Dtype-STRICT hash mirroring the driver: a float64 1460.0 renders
    '1460.0' and an int64 1460 renders '1460' — different hashes. The
    old version canonicalized integral floats to ints, which masked the
    HUGEINT->float64 oracle-dtype class for two straight rounds."""
    df = _normalize(df)
    if len(df) == 0:
        return "empty"

    def cell(v) -> str:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\\N"
        if isinstance(v, float):
            v = round(v, 6) + 0.0  # +0.0 folds -0.0 into 0.0
            return repr(v)
        return str(v)

    lines = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Spill outside the repo: DuckDB's temp dir defaults to the
    # process cwd — a big oracle (g5 at the 10x corpus) wrote 70 GB
    # of duckdb_temp_storage-*.tmp into the repo's .tmp/ (round 10).
    con.execute("SET temp_directory = '/tmp/spark_graft_duckdb_spill'")
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
    for c in sorted(sp.columns):
        ks, kd = _dtype_kind(sp[c].dtype), _dtype_kind(du[c].dtype)
        if ks != kd and len(sp) > 0:
            return ParityResult(
                name, False, len(sp), len(du),
                f"dtype-kind mismatch on {c}: spark {sp[c].dtype} ({ks}) "
                f"vs oracle {du[c].dtype} ({kd})",
            )
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
