"""Payments pipeline semantics (reference parity, SURVEY.md §3.3)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from lenses_topology_example_spark.datamodel import (
    CURRENCY_RATES,
    SUSPICIOUS_THRESHOLD,
    currency_rates_df,
)
from lenses_topology_example_spark.sources.generator import gen_payments_df
from lenses_topology_example_spark.streaming.pipelines import convert_payments


def test_rates_match_reference(spark):
    # CurrencyExchangeRepo.java:15-19, exact values
    rows = {r["currency"]: r["rate"] for r in currency_rates_df(spark).collect()}
    assert rows == {c: float(r) for c, r in CURRENCY_RATES.items()}
    assert rows["GBP"] == 1.0
    assert rows["USD"] == float(Decimal("1.313558"))


def test_unknown_currency_drops(spark):
    # reference would NPE (PaymentsService.java:101-102); we inner-join-drop
    payments = spark.createDataFrame(
        [("GBP", 100.0), ("XXX", 50.0)], "currency string, amount double"
    )
    out = convert_payments(payments, currency_rates_df(spark)).collect()
    assert [r["currency"] for r in out] == ["GBP"]
    assert out[0]["amount_xchg"] == 100.0  # GBP rate is 1.0


def test_suspicious_threshold_is_strict(spark):
    # PaymentsService.java:95: amount < 10000, strictly
    payments = spark.createDataFrame(
        [("GBP", 10000.0), ("GBP", 9999.99)], "currency string, amount double"
    )
    conv = convert_payments(payments, currency_rates_df(spark))
    susp = conv.filter(
        F.col("amount_xchg") < F.lit(float(SUSPICIOUS_THRESHOLD))
    ).collect()
    assert [r["amount"] for r in susp] == [9999.99]


def test_generator_distribution(spark):
    # PaymentsSimulator.java:29,57: round-robin currencies, amounts in
    # [1, 2_000_000), 5 payments per 400ms tick
    df = gen_payments_df(spark, n=1000)
    rows = df.collect()
    assert len(rows) == 1000
    per_currency = df.groupBy("currency").count().collect()
    assert {r["count"] for r in per_currency} == {200}
    amounts = [r["amount"] for r in rows]
    assert min(amounts) >= 1.0 and max(amounts) < 2_000_000.0
    ts = sorted(r["ts"] for r in rows)
    assert abs((ts[-1] - ts[0]).total_seconds() - (1000 // 5 - 1) * 0.4) < 1e-6
