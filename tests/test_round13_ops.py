"""Round-13 class pins: the two cross-engine numeric finds of the
big-slice sweeps (BASELINE.md round-13) stay enforced contracts.

- Class #9: interpolated-percentile association-order 1-ulp split
  (fired at docs10 in `percentiles.p99`) — the 6dp round must stay in
  BOTH the Spark plan and the oracle SQL.
- dsum2: winsorized_stats' per-segment revenue sums crossed dsum's
  scale-6 2^53 line at sf10 (1-ulp mean splits, measured live). The
  scale-2 re-round is lossless for 2dp inputs; these tests pin the
  premise (2dp grid), the magnitude envelope, and the fingerprints.
"""

from __future__ import annotations

from lenses_topology_example_spark.catalog import oracle_sql


def test_percentiles_interpolation_is_rounded_on_both_engines():
    """Class-#9 fingerprint: every interpolated output in the
    percentiles pair carries the 6dp round. The raw form matched for
    12 rounds at the driver SFs and split by 1 ulp the first time a
    duplicated slice moved p99's cut between unequal neighbors — the
    round is load-bearing, not cosmetic."""
    sql = oracle_sql()["percentiles"]
    assert sql.count("ROUND(quantile_cont") == 3, sql
    from lenses_topology_example_spark.operators import relational2
    import inspect

    src = inspect.getsource(relational2.q_percentiles)
    assert src.count('F.round(F.expr("percentile') == 3, (
        "percentiles' Spark plan lost its 6dp interpolation round"
    )


def test_winsorized_means_use_dsum2_on_both_engines():
    """dsum2 fingerprint: all three winsorized/trimmed/raw mean
    numerators must re-round at scale 2 (ROUND(..., 2)) before the
    double cast, on both engines — dsum's scale-6 line (~9.0e9) is
    crossed by the ~7.5e11 per-segment sums at sf10 (measured 1-ulp
    mean splits, round-13 sweep)."""
    sql = oracle_sql()["winsorized_stats"]
    # exact dsum2_sql expansion fingerprint (the earlier regex branch
    # could not match the nested parens and was dead — r13 ADVICE)
    assert sql.count("CAST(ROUND(SUM(CAST(") >= 3, sql
    assert sql.count(", 2) AS DOUBLE)") >= 3, sql
    from lenses_topology_example_spark.operators import analytics
    import inspect

    src = inspect.getsource(analytics.q_winsorized_stats)
    assert src.count("dsum2(") == 3, (
        "winsorized_stats' Spark means no longer go through dsum2"
    )


def test_winsorized_inputs_are_exact_2dp_and_sums_fit_dsum2(spark, sf_dir):
    """The dsum2 premise, enforced at data + contract SF: (a) every
    o_totalprice is EXACTLY a 2dp decimal (so the scale-2 re-round is
    lossless — the whole correctness argument), and (b) the worst
    per-segment sum projected to sf100 stays under dsum2's 2^53/100
    ceiling while the same sum at sf10 CROSSES dsum's scale-6 line
    (the reason dsum was wrong)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from lenses_topology_example_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    off_grid = orders.filter(
        F.col("o_totalprice")
        != F.col("o_totalprice").cast("decimal(18,2)").cast("double")
    ).count()
    assert off_grid == 0, "o_totalprice left the 2dp grid"

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    worst = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s"))
        .agg(F.max("s"))
        .collect()[0][0]
    )
    worst = float(worst)
    sf = 0.001 if "0.001" in sf_dir else 0.01
    proj = 1.0 / sf
    # (b1) sf100 projection under dsum2's ceiling (scale-2 units)
    assert worst * proj * 100 * 100 < 2**53
    # (b2) sf10 projection PAST dsum's scale-6 line — the measured class
    assert worst * proj * 10 * 1e6 > 2**53
