"""Round-15 pins (r14 VERDICT ask #1 — the sink_parquet decimal class).

The r14 driver recorded sink_parquet hash_match=false for the second
consecutive round while every local replica MATCHed. Root cause
(r14 VERDICT): sink_parquet was the catalog's ONLY entry whose Spark
output contained a DecimalType column — Spark toPandas lands
DecimalType as object decimal.Decimal, DuckDB lands DECIMAL(38,0) as
float64, the driver's hash is dtype-strict, and tools/canon.py
deliberately folded Decimal into float-class, so the replica FORGAVE
exactly what the driver punished. These tests pin the three-part fix:

1. sinks.py emits id_hash_sum as BIGINT on both engines
   (DECIMAL(38,0) accumulation -> % 10^15 -> BIGINT cast);
2. tools/canon.py tags Decimal as its OWN class (replica reproduces
   the driver verdict instead of masking it);
3. tests/test_catalog.py statically rejects DecimalType outputs from
   in-window queries (pinned here by feeding the guard's predicate a
   decimal schema).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from tools.canon import canon, canon_rows


def test_canon_splits_decimal_from_float():
    """A Decimal must NOT compare equal to the float64 the other
    engine landed — that is the driver's observed behavior (r13+r14
    sink_parquet). Pre-r15 canon returned ("f", 1.0) for both."""
    assert canon(Decimal("1")) != canon(1.0)
    assert canon(Decimal("2.5")) != canon(2.5)
    # within-class equality still holds (value-compared as float, so
    # precision-string artifacts like 1.50 vs 1.5 don't split)
    assert canon(Decimal("1.50")) == canon(Decimal("1.5"))
    # and int vs Decimal split too (three distinct numeric classes)
    assert canon(Decimal("1")) != canon(1)


def test_canon_rows_reproduces_the_driver_red():
    """The exact r14 failure shape: identical VALUES, Spark side
    Decimal objects, oracle side float64 — the replica must now
    MISMATCH (it passed pre-r15, masking two rounds of driver reds)."""
    spark_side = pd.DataFrame({"id_hash_sum": [Decimal("123"), Decimal("7")]})
    oracle_side = pd.DataFrame({"id_hash_sum": [123.0, 7.0]})
    assert canon_rows(spark_side) != canon_rows(oracle_side)
    # same dtype on both sides still matches
    assert canon_rows(oracle_side) == canon_rows(
        pd.DataFrame({"id_hash_sum": [7.0, 123.0]})
    )


def test_sink_parquet_output_has_no_decimal_column(spark, sf_dir):
    """The fix of record: id_hash_sum lands as BIGINT (LongType); no
    output column of any type in the decimal landing class."""
    from pyspark.sql.types import DecimalType, LongType

    from lenses_topology_example_spark.operators import sinks

    df = sinks.q_sink_parquet(spark, sf_dir)
    types = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(types["id_hash_sum"], LongType), types
    assert not any(isinstance(t, DecimalType) for t in types.values()), types


def test_sink_parquet_id_hash_residue_matches_direct_computation(
    spark, sf_dir
):
    """% 10^15 must be a pure landing-type change: the BIGINT residue
    equals the exact DECIMAL(38,0) sum mod 10^15 computed
    independently from the source (md5 values < 1e9, so at test SF the
    sum is far below 10^15 and the residue IS the exact sum — the mod
    only matters past ~10^6 rows/currency, where it keeps the value
    exact in int64/float64 instead of overflowing them)."""
    from pyspark.sql import functions as F

    from lenses_topology_example_spark.functions.texthash import md5_hash_mod
    from lenses_topology_example_spark.operators import sinks
    from lenses_topology_example_spark.operators.payments import q_fx_convert

    audit = {
        r["currency"]: r["id_hash_sum"]
        for r in sinks.q_sink_parquet(spark, sf_dir).collect()
    }
    truth = {
        r["currency"]: int(r["s"]) % 10**15
        for r in q_fx_convert(spark, sf_dir)
        .groupBy("currency")
        .agg(
            F.sum(
                md5_hash_mod(F.col("event_id").cast("string")).cast(
                    "decimal(38,0)"
                )
            ).alias("s")
        )
        .collect()
    }
    assert audit == truth
    assert all(isinstance(v, int) for v in audit.values())
