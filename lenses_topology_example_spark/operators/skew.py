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


def q_join_skew_stats(spark, sf_dir: str) -> DataFrame:
    """Key-distribution skew report for the events->customer join key
    (user_id): row/key counts, max and exact-p99 key frequency, the hot
    head's row share, and the max/avg skew ratio — the measurement that
    DECIDES between a plain shuffle join, AQE skew splitting, and
    explicit salting (module doc levers 1-2). Measure first: salting an
    unskewed key pays n_salts x replication for nothing.

    Zero corpus-scale windows: the p99 comes from a cumulative count
    over the key-frequency HISTOGRAM (|distinct frequency values| rows
    — the token_entropy sorted-run trick), never a rank over the key
    dictionary; the top-10 head is TakeOrderedAndProject; everything
    else is one partial-agg pass over the per-key counts."""
    from pyspark.sql import Window as W

    from ..tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    per_key = events.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    totals = per_key.agg(
        F.sum("df").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("df").alias("max_df"),
    )
    hist = per_key.groupBy("df").agg(F.count(F.lit(1)).alias("nk"))
    cum = hist.withColumn(
        "cum",
        F.sum("nk").over(
            W.orderBy("df").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    p99 = (
        cum.crossJoin(F.broadcast(totals.select("n_keys")))
        .filter(F.col("cum") >= F.ceil(F.col("n_keys") * F.lit(0.99)))
        .agg(F.min("df").alias("p99_df"))
    )
    top10 = (
        per_key.orderBy(F.col("df").desc(), F.col("k"))
        .limit(10)
        .agg(F.sum("df").alias("top10_rows"))
    )
    rt = lambda c: c.cast("decimal(38,6)").cast("double")
    return (
        totals.crossJoin(F.broadcast(p99))
        .crossJoin(F.broadcast(top10))
        .select(
            "n_rows",
            "n_keys",
            "max_df",
            "p99_df",
            rt(
                F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
            ).alias("avg_df"),
            rt(
                (F.col("max_df").cast("double") * F.col("n_keys").cast("double"))
                / F.col("n_rows").cast("double")
            ).alias("skew_ratio"),
            rt(
                F.col("top10_rows").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("top10_share"),
        )
    )


SQL_JOIN_SKEW_STATS = """
    WITH per_key AS (
        SELECT user_id AS k, COUNT(*) AS df FROM events GROUP BY user_id
    ), totals AS (
        SELECT CAST(SUM(df) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               CAST(MAX(df) AS BIGINT) AS max_df
        FROM per_key
    ), hist AS (
        SELECT df, COUNT(*) AS nk FROM per_key GROUP BY df
    ), cum AS (
        SELECT df, SUM(nk) OVER (ORDER BY df
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ), p99 AS (
        SELECT CAST(MIN(df) AS BIGINT) AS p99_df
        FROM cum CROSS JOIN totals
        WHERE cum >= CEIL(n_keys * 0.99)
    ), top10 AS (
        SELECT CAST(SUM(df) AS BIGINT) AS top10_rows FROM (
            SELECT df FROM per_key ORDER BY df DESC, k LIMIT 10
        )
    )
    SELECT n_rows, n_keys, max_df, p99_df,
           CAST(CAST(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS avg_df,
           CAST(CAST((CAST(max_df AS DOUBLE) * CAST(n_keys AS DOUBLE))
                     / CAST(n_rows AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS skew_ratio,
           CAST(CAST(CAST(top10_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS top10_share
    FROM totals CROSS JOIN p99 CROSS JOIN top10
"""
