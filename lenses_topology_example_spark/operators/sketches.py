"""Approximate-sketch aggregations (100 TB scale path, SURVEY.md §2.4).

Exact distinct counts and exact percentiles need a full shuffle of the
key/value space; the sketch forms are one-pass, mergeable, and bounded-
memory — the only viable shape for interactive answers over 100 TB:

- approx_count_distinct: HyperLogLog++ (relative error ~= 1.04/sqrt(2^p),
  default rsd 5%), merged per-partition then at the final agg — the
  shuffle carries fixed-size sketch bytes, not the key set.
- percentile_approx: a quantile summary (Greenwald-Khanna-style) with
  bounded accuracy parameter; same mergeability argument.

Both are engine-specific sketches, so no DuckDB oracle can hash-match
them — these are declared WITHOUT oracle_sql (the driver's weaker
rows-only check) and their accuracy contract is asserted against the
exact answers in tests/test_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type at 2% target rsd."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summary over event values (accuracy 10000 —
    error bound = 1/accuracy of the rank)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("approx_pcts"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
