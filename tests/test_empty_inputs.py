"""Empty-input contracts for the operators the round-8 sweep fixed
(tools/empty_sweep.py runs the WHOLE catalog per-round; these pin the
fixed entries and the one documented engine divergence in the suite)."""

from __future__ import annotations

import pytest

from lenses_topology_example_spark.catalog import _CATALOG
from lenses_topology_example_spark.tables import TABLES


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        src = pq.read_table(f"{sf}/{t}.parquet")
        pq.write_table(src.schema.empty_table(), f"{dst}/{t}.parquet")
    return str(dst)


def test_erasure_plan_empty_does_not_crash(spark, empty_dir):
    """An empty table made delete_fraction a 0/0 ANSI DIVIDE_BY_ZERO
    crash (round-8 sweep); try_divide yields NULL instead."""
    rows = _CATALOG["erasure_plan"][0](spark, empty_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.rows_to_delete == 0
        assert r.rows_total == 0
        assert r.delete_fraction is None


def test_constraint_audit_empty_reports_passed(spark, empty_dir):
    """Empty tables audit as 0 violations / passed=true — the same
    coalesce contract as the streaming events_dq_batch (r7 ADVICE)."""
    rows = _CATALOG["constraint_audit"][0](spark, empty_dir).collect()
    assert len(rows) == 12
    for r in rows:
        assert r.n_violations == 0, r
        assert r.passed is True, r


def test_k_anonymity_empty_is_typed(spark, empty_dir):
    row = _CATALOG["k_anonymity"][0](spark, empty_dir).collect()[0]
    assert (row.k_min, row.n_classes, row.n_rows) == (0, 0, 0)
    assert (row.classes_at_risk, row.rows_at_risk) == (0, 0)
    assert row.risk_fraction is None
    assert row.is_k_anonymous is False  # conservative sentinel, documented


def test_embed_threshold_sweep_empty_counts_zero(spark, empty_dir):
    rows = _CATALOG["embed_threshold_sweep"][0](spark, empty_dir).collect()
    assert rows  # one row per threshold
    for r in rows:
        assert (r.n_pairs, r.n_docs_matched, r.n_removable) == (0, 0, 0)
        assert r.removal_fraction is None


def test_rollup_empty_divergence_is_stable(spark, empty_dir):
    """Engine-level divergence, pinned so a behavior change is noticed:
    Spark emits ZERO rows for ROLLUP over empty input; DuckDB emits the
    grand-total row (SQL standard). tools/empty_sweep.py carries these
    in KNOWN_DIVERGENT; if this test starts failing, Spark changed —
    remove the entries from KNOWN_DIVERGENT."""
    import duckdb

    assert _CATALOG["rollup_sales"][0](spark, empty_dir).count() == 0
    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM '{empty_dir}/orders.parquet'"
        )
        con.sql(
            f"CREATE VIEW customer AS SELECT * FROM '{empty_dir}/customer.parquet'"
        )
        con.sql(
            f"CREATE VIEW nation AS SELECT * FROM '{empty_dir}/nation.parquet'"
        )
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{empty_dir}/lineitem.parquet'"
        )
        assert len(con.sql(_CATALOG["rollup_sales"][1]).fetchall()) >= 1
    finally:
        con.close()
