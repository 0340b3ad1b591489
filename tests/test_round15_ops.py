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


def test_make_nulls_is_deterministic_and_schema_preserving(tmp_path):
    """The NULL-density axis slice generator (tools/make_nulls.py,
    r14 VERDICT ask #4): two builds of the same (sf_dir, pct) must be
    byte-identical (md5-deterministic selection — the Spark and DuckDB
    legs of a parity run must read the SAME NULLs), schemas must match
    the source EXACTLY (events.ts has shipped as TIMESTAMP(NANOS); a
    round-trip through an engine would rewrite it), and the realized
    NULL fraction must sit near the requested density."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        subprocess.run(
            [
                sys.executable,
                "tools/make_nulls.py",
                "--sf-dir", src,
                "--out", out,
                "--pct", "50",
            ],
            check=True,
            capture_output=True,
            cwd="/root/repo",
        )
    for t in ["orders", "lineitem", "events", "documents", "region"]:
        pa_a = open(f"{a}/{t}.parquet", "rb").read()
        pa_b = open(f"{b}/{t}.parquet", "rb").read()
        assert pa_a == pa_b, f"{t}: non-deterministic build"
        assert pq.read_schema(f"{a}/{t}.parquet").equals(
            pq.read_schema(f"{src}/{t}.parquet")
        ), f"{t}: schema drifted from source"
    tab = pq.read_table(f"{a}/orders.parquet")
    frac = tab.column("o_totalprice").null_count / tab.num_rows
    assert 0.45 < frac < 0.55, frac
    # keys untouched
    assert tab.column("o_orderkey").null_count == 0


def test_make_hikey_is_deterministic_and_referentially_intact(tmp_path):
    """The key-cardinality axis slice (tools/make_hikey.py): two builds
    byte-identical, events schema preserved exactly, every remapped
    user_id distinct, and every user_id covered by the expanded
    customer dim (referential integrity by construction)."""
    import subprocess
    import sys

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        subprocess.run(
            [sys.executable, "tools/make_hikey.py",
             "--sf-dir", src, "--out", out],
            check=True, capture_output=True, cwd="/root/repo",
        )
    for t in ["events", "customer"]:
        assert open(f"{a}/{t}.parquet", "rb").read() == open(
            f"{b}/{t}.parquet", "rb"
        ).read(), f"{t}: non-deterministic build"
    ev = pq.read_table(f"{a}/events.parquet")
    assert ev.schema.equals(pq.read_schema(f"{src}/events.parquet"))
    assert len(pc.unique(ev.column("user_id"))) == ev.num_rows
    cust = pq.read_table(f"{a}/customer.parquet")
    assert cust.num_rows == ev.num_rows
    assert len(pc.unique(cust.column("c_custkey"))) == cust.num_rows
    assert pc.max(ev.column("user_id")).as_py() <= pc.max(
        cust.column("c_custkey")
    ).as_py()
