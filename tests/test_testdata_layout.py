"""Testdata physical-layout canary.

The driver regenerates /root/testdata between rounds and has already
flipped the events.ts physical layout once (TIMESTAMP(NANOS) ->
timestamp[us]), which silently broke every events consumer (round-5
verdict). This file makes the NEXT layout flip fail loudly in exactly
one place instead of as dozens of opaque downstream errors.

Checks, per table at sf0.001:
- load_table succeeds and yields at least one row;
- the columns each operator tier depends on exist with a sane logical
  type after load_table's normalization;
- events.ts is a timestamp (any tz flavor) with values in a plausible
  year range — catches both a dtype flip load_table missed and a
  unit-confusion bug (ns interpreted as µs lands in year 1970).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from lenses_topology_example_spark.tables import TABLES, load_table

# column -> acceptable Spark type classes, per table. Only the
# load-bearing columns each operator tier actually reads.
_EXPECTED = {
    "region": {"r_regionkey": (T.LongType, T.IntegerType)},
    "nation": {"n_nationkey": (T.LongType, T.IntegerType)},
    "customer": {"c_custkey": (T.LongType, T.IntegerType)},
    "supplier": {"s_suppkey": (T.LongType, T.IntegerType)},
    "part": {"p_partkey": (T.LongType, T.IntegerType)},
    "orders": {
        "o_orderkey": (T.LongType, T.IntegerType),
        "o_orderdate": (T.DateType, T.TimestampType, T.TimestampNTZType),
    },
    "lineitem": {
        "l_orderkey": (T.LongType, T.IntegerType),
        "l_quantity": (T.DoubleType, T.DecimalType),
    },
    "events": {
        "ts": (T.TimestampType, T.TimestampNTZType),
        "user_id": (T.LongType, T.IntegerType, T.StringType),
        "value": (T.DoubleType, T.DecimalType),
    },
    "documents": {"doc_id": (T.LongType, T.IntegerType, T.StringType)},
    "embeddings": {"embedding": (T.ArrayType,)},
}


@pytest.mark.parametrize("name", TABLES)
def test_table_layout(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, ok_types in _EXPECTED.get(name, {}).items():
        assert col in fields, f"{name}.{col} missing; have {sorted(fields)}"
        assert isinstance(fields[col], ok_types), (
            f"{name}.{col} loaded as {fields[col]}; expected one of "
            f"{[t.__name__ for t in ok_types]} — testdata layout changed?"
        )
    assert df.limit(1).count() == 1, f"{name} is empty"


def test_events_ts_values_sane(spark, sf_dir):
    row = (
        load_table(spark, sf_dir, "events")
        .selectExpr("min(ts) AS lo", "max(ts) AS hi")
        .first()
    )
    assert isinstance(row["lo"], datetime.datetime), row
    # a ns-as-µs confusion lands ~year 1971; a µs-as-ns one lands far
    # future. Any sane generator stays inside this band.
    assert 2000 <= row["lo"].year <= 2100, f"events.ts min {row['lo']}"
    assert 2000 <= row["hi"].year <= 2100, f"events.ts max {row['hi']}"
    assert row["lo"] <= row["hi"]
