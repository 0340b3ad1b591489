"""Accuracy contracts for the sketch tier: the approximate answers must
land within their documented error bounds of the exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from lenses_topology_example_spark.operators.sketches import (
    approx_distinct_raw,
    approx_quantiles_raw,
    q_approx_distinct_users,
    q_approx_quantiles,
)
from lenses_topology_example_spark.tables import load_table


def test_hll_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_raw(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        # rsd 2% requested; allow 4 sigma
        assert abs(approx[et] - ex) <= max(0.08 * ex, 2), (et, approx[et], ex)


def test_hll_property_entry_all_within_bound(spark, sf_dir):
    """The oracle-paired catalog form (round 13): every group's 3-sigma
    bound boolean must be TRUE — the column the oracle recomputes as a
    literal, giving the driver hash real teeth on the sketch."""
    rows = q_approx_distinct_users(spark, sf_dir).collect()
    assert rows
    assert all(r["within_bound"] for r in rows), rows


def test_approx_quantiles_property_entry_all_within_bound(spark, sf_dir):
    """Catalog-form rank-bound booleans must all be TRUE (and the rank
    recount must see every (type, pct) cell exactly once)."""
    rows = q_approx_quantiles(spark, sf_dir).collect()
    assert len(rows) == len({(r["event_type"], r["pct"]) for r in rows})
    assert rows
    assert all(r["within_bound"] for r in rows), [
        (r["event_type"], r["pct"]) for r in rows if not r["within_bound"]
    ]


def test_approx_quantiles_rank_bounded(spark, sf_dir):
    """Quantile sketches bound RANK error, not value error: the approx
    p-quantile must lie within the exact [p-5pp, p+5pp] value bracket
    (value-space error is unbounded on skewed data)."""
    approx: dict[str, dict[float, float]] = {}
    for r in approx_quantiles_raw(spark, sf_dir).collect():
        approx.setdefault(r["event_type"], {})[r["pct"]] = r["approx_value"]
    brackets = {
        r["event_type"]: r["b"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.45, 0.55, 0.85, 0.95, 0.94, 1.0))"
            ).alias("b")
        )
        .collect()
    }
    for et, a in approx.items():
        lo = brackets[et]
        p50, p90, p99 = a[0.5], a[0.9], a[0.99]
        assert lo[0] - 1e-9 <= p50 <= lo[1] + 1e-9, (et, "p50", p50, lo[0], lo[1])
        assert lo[2] - 1e-9 <= p90 <= lo[3] + 1e-9, (et, "p90", p90, lo[2], lo[3])
        assert lo[4] - 1e-9 <= p99 <= lo[5] + 1e-9, (et, "p99", p99, lo[4], lo[5])


def test_cms_overestimates_only(spark, sf_dir):
    """Count-Min property: the estimate NEVER undercounts (min over
    rows of hashed cells >= the true count), and with the deliberately
    small catalog width (16 buckets for ~40 distinct tokens) collisions
    must actually occur — some token strictly overestimated — so the
    sketch path is non-vacuously exercised."""
    from lenses_topology_example_spark.operators.sketches import q_cms_token_freq

    rows = q_cms_token_freq(spark, sf_dir).collect()
    assert rows
    assert all(r["cms_n"] >= r["exact_n"] for r in rows)
    assert any(r["cms_n"] > r["exact_n"] for r in rows), (
        "no collisions at width 16 — sketch check is vacuous"
    )
