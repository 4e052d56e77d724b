"""JDBC upsert sink: generated ON CONFLICT SQL executed against
SQLite (same upsert grammar as Postgres) + shape assertions mirroring
the reference's own adapter tests (postgres-adapter.test.ts:212,355).
"""

from __future__ import annotations

import os
import sqlite3

import pytest

from omfietser_etl_spark.sinks.jdbc import (
    PROCESSED_CONFLICT_KEYS,
    STAGING_CONFLICT_KEYS,
    UpsertSpec,
    dialect_for_url,
    upsert_merge_sql,
    upsert_values_sql,
)

STAGING_COLS = (
    "raw_product_id", "shop_type", "external_id", "name", "price", "data", "content_hash",
)


def _staging_spec() -> UpsertSpec:
    return UpsertSpec(
        table="staging_products",
        columns=STAGING_COLS,
        conflict_cols=STAGING_CONFLICT_KEYS,
        touch_col="processed_at",
    )


def test_merge_sql_shape_matches_reference_contract():
    sql = upsert_merge_sql(_staging_spec())
    assert 'ON CONFLICT ("shop_type", "external_id")' in sql
    assert '"name" = EXCLUDED."name"' in sql
    assert '"processed_at" = CURRENT_TIMESTAMP' in sql
    # conflict keys never self-update
    assert '"shop_type" = EXCLUDED' not in sql

    processed = UpsertSpec(
        table="processed_products",
        columns=("unified_id", "shop_type", "external_id", "schema_version", "title"),
        conflict_cols=PROCESSED_CONFLICT_KEYS,
        touch_col="updated_at",
    )
    sql3 = upsert_merge_sql(processed)
    assert 'ON CONFLICT ("shop_type", "external_id", "schema_version")' in sql3


def test_dialect_inference_and_variants():
    assert dialect_for_url("jdbc:postgresql://h/db") == "postgresql"
    assert dialect_for_url("jdbc:sqlite:/tmp/x.db") == "sqlite"
    assert dialect_for_url("jdbc:sqlserver://h") == "ansi"

    spec = _staging_spec()
    pg = upsert_merge_sql(spec, "postgresql")
    lite = upsert_merge_sql(spec, "sqlite")
    # the two upsert-grammar dialects differ ONLY by SQLite's parser
    # disambiguator — documents that the SQLite execution test covers
    # the Postgres statement shape
    assert lite == pg.replace(
        "FROM staging_products__stage\n", "FROM staging_products__stage WHERE true\n"
    )
    assert "WHERE true" not in pg

    ansi = upsert_merge_sql(spec, "ansi")
    assert ansi.startswith("MERGE INTO staging_products t")
    assert 'ON (t."shop_type" = s."shop_type" AND t."external_id" = s."external_id")' in ansi
    assert "WHEN MATCHED THEN UPDATE SET" in ansi
    assert "WHEN NOT MATCHED THEN INSERT" in ansi
    # conflict keys never self-update in the matched branch
    assert 't."shop_type" = s."shop_type",' not in ansi

    with pytest.raises(ValueError):
        upsert_merge_sql(spec, "mysql")


def test_live_postgres_upsert():
    """Executes the postgresql-dialect merge against a REAL server
    when one is provided; otherwise skips loudly. This is the honest
    boundary of the sandbox's JDBC coverage (no Postgres ships here):
    set SPARK_GRAFT_PG_URL=postgresql://user:pw@host/db to run."""
    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("no live Postgres (set SPARK_GRAFT_PG_URL)")
    psycopg2 = pytest.importorskip("psycopg2")
    spec = _staging_spec()
    con = psycopg2.connect(url)
    try:
        cur = con.cursor()
        cols_ddl = ", ".join(f'"{c}" TEXT' for c in STAGING_COLS)
        cur.execute("DROP TABLE IF EXISTS staging_products, staging_products__stage")
        cur.execute(
            f"CREATE TABLE staging_products ({cols_ddl}, processed_at TIMESTAMPTZ, "
            'UNIQUE ("shop_type", "external_id"))'
        )
        cur.execute(f"CREATE TABLE staging_products__stage ({cols_ddl})")
        cur.execute(
            "INSERT INTO staging_products VALUES "
            "('1','AH','x1','old','1.0','{}','h0', NULL)"
        )
        cur.execute(
            "INSERT INTO staging_products__stage VALUES "
            "('2','AH','x1','new-name','2.5','{}','h1'),"
            "('3','AH','x2','brand-new','9.9','{}','h2')"
        )
        cur.execute(upsert_merge_sql(spec, "postgresql"))
        cur.execute(
            'SELECT "external_id", "name", processed_at FROM staging_products'
        )
        rows = {r[0]: r for r in cur.fetchall()}
        assert rows["x1"][1] == "new-name" and rows["x1"][2] is not None
        assert rows["x2"][1] == "brand-new"
        con.rollback()
    finally:
        con.close()


def test_values_sql_parameter_count():
    sql = upsert_values_sql(_staging_spec())
    assert "VALUES ($1, $2, $3, $4, $5, $6, $7)" in sql


def test_merge_sql_executes_upsert_semantics_on_sqlite():
    spec = _staging_spec()
    con = sqlite3.connect(":memory:")
    cols_ddl = ", ".join(f'"{c}"' for c in STAGING_COLS)
    con.execute(
        f"CREATE TABLE staging_products ({cols_ddl}, processed_at TEXT, "
        'UNIQUE ("shop_type", "external_id"))'
    )
    con.execute(f"CREATE TABLE staging_products__stage ({cols_ddl})")

    con.execute(
        "INSERT INTO staging_products VALUES (1, 'AH', 'x1', 'old', 1.0, '{}', 'h0', 'never')"
    )
    con.executemany(
        "INSERT INTO staging_products__stage VALUES (?, ?, ?, ?, ?, ?, ?)",
        [
            (2, "AH", "x1", "new-name", 2.5, "{}", "h1"),   # conflict → update
            (3, "AH", "x2", "brand-new", 9.9, "{}", "h2"),  # fresh → insert
        ],
    )
    con.execute(upsert_merge_sql(spec, "sqlite"))

    rows = {
        r[0]: r
        for r in con.execute(
            'SELECT "external_id", "raw_product_id", "name", "processed_at" '
            "FROM staging_products"
        )
    }
    assert rows["x1"][1:3] == (2, "new-name")      # EXCLUDED values applied
    assert rows["x1"][3] != "never"                 # touch column stamped
    assert rows["x2"][1:3] == (3, "brand-new")      # new key inserted
