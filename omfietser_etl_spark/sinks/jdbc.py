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
conflict resolution where it is atomic and index-backed.

Dialects. The merge statement is generated per DIALECT:

- ``postgresql`` — ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col
  = EXCLUDED.col`` (the reference's exact grammar,
  postgres-adapter.ts:177-185);
- ``sqlite`` — same upsert grammar plus the ``WHERE true`` join-
  ambiguity disambiguator SQLite's parser requires;
- ``ansi`` — SQL:2003 ``MERGE INTO ... USING ... WHEN MATCHED THEN
  UPDATE / WHEN NOT MATCHED THEN INSERT`` for engines without the
  Postgres extension (SQL Server, Oracle, DB2; Postgres ≥15 also
  accepts it).

TEST-COVERAGE LIMITATION, stated honestly: no Postgres server ships
in this sandbox. The generated ``sqlite`` statement is executed for
real against SQLite (tests/test_jdbc_upsert.py) and the ``postgresql``
variant differs from it only by the ``WHERE true`` token — but
live-Postgres quirks (type coercion of EXCLUDED refs, trigger
interactions, concurrent-writer behavior) are asserted nowhere. A
live test exists and self-skips unless ``SPARK_GRAFT_PG_URL`` points
at a reachable server. The parquet MERGE emulation in
`streaming/incremental.py` remains the sandbox execution path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

DIALECTS = ("postgresql", "sqlite", "ansi")


def dialect_for_url(jdbc_url: str) -> str:
    """Infer the merge dialect from a JDBC URL; unknown engines get
    the conservative ANSI MERGE."""
    if jdbc_url.startswith(("jdbc:postgresql:", "postgresql:", "postgres:")):
        return "postgresql"
    if jdbc_url.startswith("jdbc:sqlite:"):
        return "sqlite"
    return "ansi"

# Conflict keys per reference table (init-processor-schema.sql:24-39;
# postgres-adapter.ts:177,220,685).
STAGING_CONFLICT_KEYS = ("shop_type", "external_id")
PROCESSED_CONFLICT_KEYS = ("shop_type", "external_id", "schema_version")


def _ident(name: str) -> str:
    """Quote an SQL identifier (defense against reserved words; the
    column names here come from our own schemas, not user input)."""
    return '"' + name.replace('"', '""') + '"'


def _qualified(name: str) -> str:
    """Quote a possibly schema-qualified table name part-by-part
    ("public.order" -> "public"."order") — table names must be quoted
    with the same discipline as columns, or a reserved-word/mixed-case
    table the quoted DDL created fails at merge time."""
    return ".".join(_ident(part) for part in name.split("."))


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


def upsert_merge_sql(spec: UpsertSpec, dialect: str = "postgresql") -> str:
    """The single set-based merge statement (step 2 above), in the
    requested dialect (see module docstring)."""
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {DIALECTS}")
    cols = ", ".join(_ident(c) for c in spec.columns)
    keys = ", ".join(_ident(c) for c in spec.conflict_cols)
    staging = spec.resolved_staging()

    if dialect == "ansi":
        on = " AND ".join(
            f"t.{_ident(c)} = s.{_ident(c)}" for c in spec.conflict_cols
        )
        sets = [
            f"t.{_ident(c)} = s.{_ident(c)}" for c in spec.resolved_update_cols()
        ]
        if spec.touch_col:
            sets.append(f"t.{_ident(spec.touch_col)} = CURRENT_TIMESTAMP")
        ins_vals = ", ".join(f"s.{_ident(c)}" for c in spec.columns)
        return (
            f"MERGE INTO {_qualified(spec.table)} t\n"
            f"USING {_qualified(staging)} s\n"
            f"ON ({on})\n"
            f"WHEN MATCHED THEN UPDATE SET\n  " + ",\n  ".join(sets) + "\n"
            f"WHEN NOT MATCHED THEN INSERT ({cols})\n"
            f"VALUES ({ins_vals})"
        )

    sets = [f"{_ident(c)} = EXCLUDED.{_ident(c)}" for c in spec.resolved_update_cols()]
    if spec.touch_col:
        sets.append(f"{_ident(spec.touch_col)} = CURRENT_TIMESTAMP")
    set_sql = ",\n  ".join(sets)
    # WHERE true disambiguates ON CONFLICT from a join for SQLite's
    # parser; omitted on Postgres so the statement is byte-identical
    # to the reference adapter's grammar.
    where = " WHERE true" if dialect == "sqlite" else ""
    return (
        f"INSERT INTO {_qualified(spec.table)} ({cols})\n"
        f"SELECT {cols} FROM {_qualified(staging)}{where}\n"
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
        f"INSERT INTO {_qualified(spec.table)} ({cols})\n"
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
    dialect: str | None = None,
) -> str:
    """Staged bulk upsert (steps 1–3). Returns the merge SQL it ran.
    ``dialect`` defaults to what :func:`dialect_for_url` infers.

    Dedupe the batch on the conflict key FIRST (latest-wins is the
    caller's policy — a row_number window over the key ordered by the
    recency column, the dd1_latest_per_key pattern):
    Postgres raises ``ON CONFLICT DO UPDATE command cannot affect row
    a second time`` if one statement hits the same key twice.
    """
    spec = staging_spec_for(df, table, conflict_cols, touch_col)
    staging = spec.resolved_staging()
    props = dict(properties or {})
    writer = df.repartition(num_partitions) if num_partitions else df
    writer.write.jdbc(jdbc_url, staging, mode="overwrite", properties=props)

    merge = upsert_merge_sql(spec, dialect or dialect_for_url(jdbc_url))
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
            stmt.executeUpdate(f"DROP TABLE {_qualified(staging)}")
        finally:
            stmt.close()
    finally:
        conn.close()
    return merge
