"""Every catalog query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from lenses_topology_example_spark import catalog

from .oracle import compare

_ORACLES = catalog.oracle_sql()
_QUERIES = catalog.queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    compare(df, _ORACLES[name], sf_dir)


def test_all_queries_have_entries():
    # every query is runnable; oracle coverage is near-total
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 40
