"""Salted-join equivalence: salting must not change join semantics, and
the salted plan must actually spread a hot key across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from lenses_topology_example_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 10k rows, 90% on one hot key — the Zipf-head shape.
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 50))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") * 2).alias("dim_val"),
    ).union(
        spark.range(1).select(F.lit("HOT").alias("k"), F.lit(-1).alias("dim_val"))
    )
    return left, right


def test_salted_join_equivalence(spark):
    left, right = _skewed_frames(spark)
    expected = left.join(right, "k").select("k", "payload", "dim_val")
    got = salted_join(left, right, "k", n_salts=8).select("k", "payload", "dim_val")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_buckets = (
        left.filter(F.col("k") == "HOT")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 8, "hot key must fan out across all salt buckets"


def test_salted_join_rejects_right_and_full(spark):
    """right/full outer would duplicate unmatched replicated-side rows
    n_salts times — must be rejected, not silently wrong."""
    import pytest

    left, right = _skewed_frames(spark)
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", n_salts=8, how=how)


def test_salted_outer_join_semantics(spark):
    left, right = _skewed_frames(spark)
    # left rows with keys missing from right survive a left join exactly once
    left2 = left.union(
        spark.range(5).select(
            F.lit("MISSING").alias("k"), F.col("id").alias("payload")
        )
    )
    expected = left2.join(right, "k", "left").count()
    got = salted_join(left2, right, "k", n_salts=8, how="left").count()
    assert got == expected
