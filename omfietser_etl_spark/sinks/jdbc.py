"""K2/K3 JDBC upsert sink: staged bulk write + one set-based merge.

The reference upserts row-at-a-time inside a transaction
(`postgres-adapter.ts:216-251` staging, `:637-788` processed — one
``INSERT ... ON CONFLICT DO UPDATE`` per product). The Spark-first
shape for the same contract is:

1. ``df.write.jdbc`` the batch into a session staging table —
   parallel bulk inserts, one connection per partition;
2. ONE server-side set-based merge
   ``INSERT INTO target SELECT ... FROM staging ON CONFLICT (keys)
   DO UPDATE SET col = EXCLUDED.col, ...`` — the database applies
   the whole batch in a single statement/plan;
3. drop the staging table.

That keeps executor parallelism for the data movement and leaves the
conflict resolution where it is atomic and index-backed. No Postgres
ships in this sandbox, so :func:`jdbc_upsert` is exercised through
its SQL generator (:func:`upsert_merge_sql`) — the unit tests execute
the generated statement against SQLite, whose ``ON CONFLICT`` grammar
matches Postgres' — and the parquet MERGE emulation in
`streaming/incremental.py:58,147` remains the sandbox execution path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Conflict keys per reference table (init-processor-schema.sql:24-39;
# postgres-adapter.ts:177,220,685).
STAGING_CONFLICT_KEYS = ("shop_type", "external_id")
PROCESSED_CONFLICT_KEYS = ("shop_type", "external_id", "schema_version")


def _ident(name: str) -> str:
    """Quote an SQL identifier (defense against reserved words; the
    column names here come from our own schemas, not user input)."""
    return '"' + name.replace('"', '""') + '"'


@dataclass(frozen=True)
class UpsertSpec:
    """One target table's upsert contract."""

    table: str
    columns: tuple[str, ...]
    conflict_cols: tuple[str, ...]
    # columns refreshed on conflict; default = all non-key columns
    update_cols: tuple[str, ...] = ()
    # audit column stamped server-side on update (the reference sets
    # processed_at / updated_at = CURRENT_TIMESTAMP)
    touch_col: str | None = None
    staging_table: str = field(default="", compare=False)

    def resolved_update_cols(self) -> tuple[str, ...]:
        if self.update_cols:
            return self.update_cols
        return tuple(c for c in self.columns if c not in self.conflict_cols)

    def resolved_staging(self) -> str:
        return self.staging_table or f"{self.table}__stage"


def upsert_merge_sql(spec: UpsertSpec) -> str:
    """The single set-based merge statement (step 2 above)."""
    cols = ", ".join(_ident(c) for c in spec.columns)
    keys = ", ".join(_ident(c) for c in spec.conflict_cols)
    sets = [f"{_ident(c)} = EXCLUDED.{_ident(c)}" for c in spec.resolved_update_cols()]
    if spec.touch_col:
        sets.append(f"{_ident(spec.touch_col)} = CURRENT_TIMESTAMP")
    set_sql = ",\n  ".join(sets)
    return (
        f"INSERT INTO {spec.table} ({cols})\n"
        # WHERE true disambiguates ON CONFLICT from a join for
        # SQLite's parser; harmless no-op on Postgres.
        f"SELECT {cols} FROM {spec.resolved_staging()} WHERE true\n"
        f"ON CONFLICT ({keys})\n"
        f"DO UPDATE SET\n  {set_sql}"
    )


def upsert_values_sql(spec: UpsertSpec) -> str:
    """Single-row parameterized form — byte-parity with the statement
    the reference issues per product (postgres-adapter.ts:172-188);
    useful for trickle writes outside Spark."""
    cols = ", ".join(_ident(c) for c in spec.columns)
    keys = ", ".join(_ident(c) for c in spec.conflict_cols)
    params = ", ".join(f"${i + 1}" for i in range(len(spec.columns)))
    sets = [f"{_ident(c)} = EXCLUDED.{_ident(c)}" for c in spec.resolved_update_cols()]
    if spec.touch_col:
        sets.append(f"{_ident(spec.touch_col)} = CURRENT_TIMESTAMP")
    set_sql = ",\n  ".join(sets)
    return (
        f"INSERT INTO {spec.table} ({cols})\n"
        f"VALUES ({params})\n"
        f"ON CONFLICT ({keys})\n"
        f"DO UPDATE SET\n  {set_sql}"
    )


def staging_spec_for(df: DataFrame, table: str, conflict_cols: tuple[str, ...],
                     touch_col: str | None = None) -> UpsertSpec:
    """Derive the UpsertSpec from a batch DataFrame's schema."""
    return UpsertSpec(
        table=table,
        columns=tuple(df.columns),
        conflict_cols=conflict_cols,
        touch_col=touch_col,
    )


def jdbc_upsert(
    df: DataFrame,
    jdbc_url: str,
    table: str,
    conflict_cols: tuple[str, ...],
    properties: dict[str, str] | None = None,
    touch_col: str | None = None,
    num_partitions: int | None = None,
) -> str:
    """Staged bulk upsert (steps 1–3). Returns the merge SQL it ran.

    Dedupe the batch on the conflict key FIRST (latest-wins is the
    caller's policy — see ``streaming.incremental.latest_per_key``):
    Postgres raises ``ON CONFLICT DO UPDATE command cannot affect row
    a second time`` if one statement hits the same key twice.
    """
    spec = staging_spec_for(df, table, conflict_cols, touch_col)
    staging = spec.resolved_staging()
    props = dict(properties or {})
    writer = df.repartition(num_partitions) if num_partitions else df
    writer.write.jdbc(jdbc_url, staging, mode="overwrite", properties=props)

    merge = upsert_merge_sql(spec)
    # Run the merge + drop through one JVM JDBC connection (the Python
    # driver holds no DB driver of its own).
    spark = df.sparkSession
    jvm = spark._jvm  # noqa: SLF001 — no public JDBC statement API in PySpark
    conn_props = jvm.java.util.Properties()
    for k, v in props.items():
        conn_props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(jdbc_url, conn_props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(merge)
            stmt.executeUpdate(f"DROP TABLE {staging}")
        finally:
            stmt.close()
    finally:
        conn.close()
    return merge
