"""Governance-tier semantics: SCD2 versioning invariants and the
constraint audit's report shape on the (clean) testdata. Oracle parity
runs in test_oracle_parity.py."""

from __future__ import annotations

from collections import Counter

from lenses_topology_example_spark.catalog import _CATALOG


def test_scd2_invariants(spark, sf_dir):
    rows = _CATALOG["scd2_apply"][0](spark, sf_dir).collect()
    by_cust = Counter(r.c_custkey for r in rows)
    currents = Counter(r.c_custkey for r in rows if r.is_current)

    # exactly one current version per customer
    assert set(by_cust) == set(currents)
    assert all(c == 1 for c in currents.values())
    # version counts are 1 (untouched) or 2 (updated)
    assert set(by_cust.values()) <= {1, 2}
    assert 2 in by_cust.values(), "the 1998-H1 window must update someone"

    for r in rows:
        if r.is_current:
            assert r.valid_to is None
        else:
            # a closed-out row's valid_to must equal the successor's
            # valid_from
            succ = [
                s
                for s in rows
                if s.c_custkey == r.c_custkey and s.is_current
            ]
            assert len(succ) == 1 and succ[0].valid_from == r.valid_to


def test_scd2_balance_delta_exact(spark, sf_dir):
    import duckdb

    rows = _CATALOG["scd2_apply"][0](spark, sf_dir).collect()
    con = duckdb.connect()
    deltas = dict(
        con.execute(
            f"""
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
            FROM '{sf_dir}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1998-01-01'
              AND o_orderdate < TIMESTAMP '1998-07-01'
            GROUP BY o_custkey
            """
        ).fetchall()
    )
    old = {r.c_custkey: r.acctbal for r in rows if not r.is_current}
    new = {
        r.c_custkey: r.acctbal
        for r in rows
        if r.is_current and r.c_custkey in old
    }
    assert set(old) == set(new) and set(old) <= set(deltas)
    for k in old:
        assert abs((new[k] - old[k]) - deltas[k]) < 1e-6


def test_constraint_audit_clean_data_passes(spark, sf_dir):
    rows = _CATALOG["constraint_audit"][0](spark, sf_dir).collect()
    assert len(rows) == 11
    report = {r.check_name: r for r in rows}
    # the generator produces referentially-intact, in-range data — every
    # constraint must pass with zero violations and a real denominator
    for name, r in report.items():
        assert r.passed, f"{name}: {r.n_violations} violations"
        assert r.n_violations == 0
        assert r.n_rows > 0
