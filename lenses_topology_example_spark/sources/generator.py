"""Synthetic payments generator (S2).

Reference: PaymentsSimulator.java:25-59 — every 400 ms emit one payment
per currency with amount ~ Uniform[1, 2 000 000) and a now-timestamp.

Spark design: `spark.range(n)` (a parallel, partitioned long range — no
driver-side loop) + pure column arithmetic. Randomness is replaced by a
deterministic multiplicative-hash PRNG in int64 so the stream is exactly
reproducible AND expressible in ANSI SQL for the DuckDB oracle: the same
(index -> currency, amount, timestamp) mapping computes bit-identically
in both engines. The streaming twin is `format("rate-micro-batch")` with
the same column exprs (streaming/pipelines.py).

At scale: spark.range partitions the index space across executors;
generation is embarrassingly parallel, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datamodel import currency_for

N_PAYMENTS = 100_000
# Knuth's multiplicative constant; i*K mod M spreads uniformly in [0, M).
_K = 2654435761
_M = 1_999_999_000  # amounts land in [1.0, 2_000_000.0) after /1000+1
_EPOCH_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
_TICK_MS = 400  # PaymentsSimulator.java:39


def gen_payments_df(spark: SparkSession, n: int = N_PAYMENTS) -> DataFrame:
    i = F.col("id")
    amount = ((i * F.lit(_K)) % F.lit(_M)) / F.lit(1000.0) + F.lit(1.0)
    ts_ms = F.lit(_EPOCH_MS) + (i / F.lit(5)).cast("long") * F.lit(_TICK_MS)
    return spark.range(n).select(
        i.alias("payment_id"),
        currency_for(i).alias("currency"),
        amount.alias("amount"),
        F.timestamp_millis(ts_ms).alias("ts"),
    )


def q_gen_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 as an oracle-checked query (sf_dir unused: source is synthetic)."""
    return gen_payments_df(spark)


SQL_GEN_PAYMENTS = f"""
    SELECT i AS payment_id,
           CASE CAST(i % 5 AS INTEGER) WHEN 0 THEN 'GBP' WHEN 1 THEN 'USD'
                WHEN 2 THEN 'EUR' WHEN 3 THEN 'CAN' ELSE 'CHF' END AS currency,
           (i * {_K}) % {_M} / 1000.0 + 1.0 AS amount,
           epoch_ms({_EPOCH_MS} + (i // 5) * {_TICK_MS}) AS ts
    FROM range(0, {N_PAYMENTS}) t(i)
"""
