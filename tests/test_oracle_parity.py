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

    # overlap the DuckDB oracle sweep with the Spark collection pool
    # (r15 VERDICT ask #3): DuckDB queries release the GIL and the
    # Spark threads mostly wait on the JVM, so the two pools share the
    # wall instead of summing — by the time the per-entry tests run,
    # every oracle is a cache hit. No-op if decimal-exposure (earlier
    # in alphabetical order) already warmed it.
    import threading

    from .oracle import warm_cache

    warmer = threading.Thread(target=warm_cache, args=(sf_dir,), daemon=True)
    warmer.start()
    with ThreadPoolExecutor(max_workers=8) as ex:
        out = {n: (pdf, err) for n, pdf, err in ex.map(run, sorted(_ORACLES))}
    # bounded: if the warmer wedged, the per-query serial fallback in
    # oracle_result still works — don't hang the whole parity session
    # (r16 ADVICE)
    warmer.join(timeout=120)
    return out


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


def test_cross_engine_dtype_classes_are_proven_safe(
    parity_pandas, parity_con, sf_dir
):
    """The sink_parquet lesson, generalized (round 15): the driver's
    hash is dtype-sensitive, and a cross-engine pandas-landing class
    that appears in only ONE entry can stay masked for rounds (decimal
    .Decimal-vs-float64 was hash-red r13+r14 while every replica
    passed, because the replica canon forgave it). A full-catalog scan
    at r15 found exactly TWO surviving divergence classes, each proven
    driver-safe by many green verdicts since r7-r11:

      int32 vs int64            (Spark IntegerType vs DuckDB BIGINT;
                                 20 columns, e.g. gains_curve.cell,
                                 multimodal_meta.n_bytes — green r11)
      datetime64[ns] vs [us]    (Spark toPandas ns vs DuckDB us;
                                 22 columns, e.g. order_backlog.day,
                                 scd2_apply.valid_from — green r8)

    This test pins that set: a NEW cross-engine landing class (the
    next decimal) fails HERE at registration, not in a driver round.
    Reuses the session fixtures — no extra Spark or DuckDB work."""
    from tests.oracle import oracle_result

    safe = {
        ("int32", "int64"),
        ("datetime64[ns]", "datetime64[us]"),
    }

    def landing(series):
        d = str(series.dtype)
        if d != "object":
            return d
        nn = series.dropna()
        return f"object[{type(nn.iloc[0]).__name__}]" if len(nn) else "object[empty]"

    offenders = []
    for name in sorted(_ORACLES):
        pdf, err = parity_pandas[name]
        if err is not None:
            continue  # the entry's own parity test reports it
        want, _cols, _types = oracle_result(
            _ORACLES[name], sf_dir, con=parity_con
        )
        for c in pdf.columns:
            sd, dd = landing(pdf[c]), landing(want[c])
            if sd == dd or (sd, dd) in safe:
                continue
            if "object[empty]" in (sd, dd):
                continue  # no values at this SF to class
            offenders.append(f"{name}.{c}: spark={sd} oracle={dd}")
    assert not offenders, (
        "NEW cross-engine dtype landing class (driver-hash hazard — "
        "see the sink_parquet r13/r14 case): " + "; ".join(offenders[:10])
    )


def test_all_queries_have_entries():
    # every query is runnable; oracle coverage is near-total
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 40
