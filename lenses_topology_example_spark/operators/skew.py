"""Skew-mitigation join strategies (100 TB design lever, SURVEY.md §4).

The reference keys everything by currency/word — 5-key and Zipf-head
distributions are exactly the shapes that melt a naive shuffle join at
scale: one reducer gets the "the"/"USD" partition and runs for hours.

Two remedies, in preference order:
1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
   default in session.get_spark): Spark splits oversized shuffle blocks
   at runtime — zero code. Use it whenever both sides are shuffleable.
2. Explicit salting (this module) for the cases AQE can't fix: the
   skewed side's hot keys are spread across `n_salts` sub-keys and the
   other side is replicated per salt. Works for any join the planner
   must execute as a shuffle join, costs n_salts x replication of the
   small side, and preserves exact join semantics (proved by
   tests/test_skew.py equivalence check).

No reference counterpart (the reference never shuffles — single
process); this is engine infrastructure, exercised by tests, not a
driver-contract query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` with `other` on `key`, salting the skewed side.

    The salt must be deterministic (rand() breaks retried tasks,
    monotonically_increasing_id depends on partition layout), so it is
    pmod(xxhash64(<all columns>), n_salts): stable per row content, and
    it spreads a hot key's rows as long as their payloads differ
    (identical full rows are literal duplicates — co-locating them is
    harmless).

    `other` is exploded across all n_salts values (n_salts x small-side
    rows), so every (key, salt) bucket finds its match. The output drops
    the salt column — semantics identical to skewed.join(other, key)
    for the SUPPORTED join types: inner, left/left_outer, left_semi,
    left_anti (the ones where `other` rows never surface unmatched).
    right/full outer are rejected — an unmatched `other` row would
    appear once per salt replica, n_salts duplicates.
    """
    if "__salt" in skewed.columns or "__salt" in other.columns:
        raise ValueError(
            "salted_join reserves the '__salt' column name; rename the "
            "existing column first (silently overwriting it would join on "
            "the wrong value and then drop the user's column)"
        )
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of "
            f"the replicated side would be duplicated n_salts times; "
            f"supported: {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def q_salted_join_events(spark, sf_dir: str) -> DataFrame:
    """Driver-checkable twin of salted_join: events (the Zipf-headed
    fact — a handful of hot user_ids own most rows) salted-joined to
    the customer dim on user_id, then aggregated per market segment.
    The oracle is the PLAIN join+group-by, so the driver hash check
    proves the salting transform is semantics-preserving end-to-end
    (the unit tests prove it per join type; this proves it on real
    testdata under a vanilla session).

    Scale note: with a dim this small Spark would broadcast and salting
    would be unnecessary — the entry exists to pin exactness of the
    fallback path used when BOTH sides are too big to broadcast and one
    key is hot (SCALING.md lever 2). n_salts x dim replication is the
    documented cost.

    sum_value discipline (r6 verdict ask #2 — this query's only driver
    red was a hash mismatch its values could not explain): the per-row
    double goes through DECIMAL(38,6) so the SUM is accumulation-order
    independent, then the SUMMED decimal round-trips to DOUBLE exactly
    as q_lm_score does its logs, so the output column is a plain
    float64 on both engines instead of the catalog's only
    driver-visible Decimal-from-double object."""
    from ..tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("k"), "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    joined = salted_join(events, cust, "k")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )


SQL_SALTED_JOIN_EVENTS = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
"""
