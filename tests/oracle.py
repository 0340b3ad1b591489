"""DuckDB-oracle comparison harness — a faithful local replica of the
driver's correctness gate (row count + schema-insensitive column match +
order-insensitive exact values), so mismatches surface at sf0.001 before
the driver runs at sf0.01."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from lenses_topology_example_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Dtype-STRICT canonical value: carries a numeric-class tag so that
    int64 `1` vs float64 `1.0` MISMATCH, exactly like the driver's hash
    (round 2: DuckDB HUGEINT window-SUMs land in pandas as float64 and
    the driver failed two queries the loose Python `==` canon passed).
    Decimal is float-class: duckdb.df() renders DECIMAL as float64, so
    that is the class the driver compares it in."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, np.generic):
        return _canon(v.item())
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_canon(x) for x in v))
    return v


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(out, key=lambda r: tuple((str(type(x)), str(x)) for x in r))


def compare(spark_df, sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    con = duck_connection(sf_dir)
    want = con.sql(sql).df()
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
