"""Catalog-level invariants: shape of the contract itself (cheap,
Spark-free where possible) — catches registration and SQL-syntax
regressions before the heavyweight parity tests run."""

from __future__ import annotations

from lenses_topology_example_spark.catalog import _CATALOG
from tests.oracle import duck_connection


def test_catalog_shape():
    assert len(_CATALOG) >= 89
    rows_only = {k for k, (_f, sql) in _CATALOG.items() if sql is None}
    assert rows_only == {
        "approx_distinct_users",
        "approx_quantiles",
        "sink_parquet",
    }, "rows-only set changed — update SURVEY.md §2.8 and the driver notes"
    for name, (fn, _sql) in _CATALOG.items():
        assert callable(fn), name


def test_every_oracle_sql_plans_in_duckdb(sf_dir):
    """EXPLAIN every oracle against the real views: catches SQL syntax
    errors (f-string splice slips) instantly, without executing."""
    con = duck_connection(sf_dir)
    failures = []
    for name, (_fn, sql) in _CATALOG.items():
        if sql is None:
            continue
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex)[:120]}")
    con.close()
    assert not failures, failures
