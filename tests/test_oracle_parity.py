"""Every catalog query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's CORRECTNESS gate.

Runtime shape (r10 VERDICT ask #7 — the suite's big rock): the tier's
cost was 247 SEQUENTIAL Spark actions (~1 s each). The session fixture
below takes every toPandas() concurrently (Spark's scheduler runs
threaded actions fine on local[32]) against the shared catalog_dfs
plans, so the per-test body is only the DuckDB oracle + the canon
compare on one shared connection. Failures stay per-entry: an action
error is captured in the fixture and re-raised by that entry's test
alone.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from lenses_topology_example_spark import catalog

from .oracle import compare_pandas, duck_connection

_ORACLES = catalog.oracle_sql()
_QUERIES = catalog.queries()


@pytest.fixture(scope="session")
def parity_pandas(catalog_dfs, spark, sf_dir):
    def run(name):
        try:
            if name in catalog_dfs:
                df = catalog_dfs[name]
            else:
                # sink_parquet: excluded from the shared plan fixture
                # because BUILDING it executes its write (documented
                # contract exception) — build it here, serially, when
                # its own parity entry runs
                df = _QUERIES[name](spark, sf_dir)
            return name, df.toPandas(), None
        except Exception as e:  # re-raised by the entry's own test
            return name, None, e

    with ThreadPoolExecutor(max_workers=8) as ex:
        return {n: (pdf, err) for n, pdf, err in ex.map(run, sorted(_ORACLES))}


@pytest.fixture(scope="session")
def parity_con(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(parity_pandas, parity_con, sf_dir, name):
    pdf, err = parity_pandas[name]
    if err is not None:
        raise err
    compare_pandas(pdf, _ORACLES[name], sf_dir, con=parity_con)


def test_all_queries_have_entries():
    # every query is runnable; oracle coverage is near-total
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 40
