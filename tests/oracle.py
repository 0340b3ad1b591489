"""DuckDB-oracle comparison harness — a faithful local replica of the
driver's correctness gate (row count + schema-insensitive column match +
order-insensitive exact values), so mismatches surface at sf0.001 before
the driver runs at sf0.01."""

from __future__ import annotations

import duckdb

from lenses_topology_example_spark.tables import TABLES
from tools.canon import canon_rows as _rows  # the ONE dtype-strict canon


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare(spark_df, sql: str, sf_dir: str) -> None:
    compare_pandas(spark_df.toPandas(), sql, sf_dir)


def compare_pandas(got, sql: str, sf_dir: str, con=None) -> None:
    """compare() with the Spark action already taken — the parity
    tier collects its toPandas results concurrently (r10 VERDICT ask
    #7) and hands each here. Pass `con` to reuse a connection; it is
    left open for the caller in that case."""
    own = con is None
    if own:
        con = duck_connection(sf_dir)
    want = con.sql(sql).df()
    if own:
        con.close()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = _rows(got), _rows(want)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
