"""Data-governance tier: declarative quality-constraint auditing and the
slowly-changing-dimension type-2 merge — the two pipeline components a
production warehouse runs around every ingest (SURVEY.md §2 extension
surface; the reference's only governance is the suspicious-payment
predicate fan-out, PaymentsService.java:94-99 — these are its
warehouse-scale generalizations).

Scale notes (100 TB): the single-table checks fuse into ONE conditional
aggregate per table (map-side partial aggregation reduces each scan to a
handful of counters per partition); the key-uniqueness, referential, and
temporal checks each add their own scan or join on top of that — the two
referential checks are LEFT ANTI joins on the natural keys
(co-partitioned SMJ under AQE — the orphan side is the probe, never
materialized wide), so lineitem is read more than once in the full
audit (r7 ADVICE: the fusion claim applies per single-table pass, not
to the whole report).
The SCD2 merge touches the dimension twice (current rows to close out,
via one join with the update batch) and the update batch once; at real
scale the update batch is days-grain small, so Catalyst broadcasts it
both times and the dimension never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.texthash import SQL_MD5_HASH64
from ..tables import load_table
from .relational import dsum, dsum4_sql, dsum_sql


def _check(name: str, violations: F.Column, total: F.Column) -> list[F.Column]:
    return [
        F.lit(name).alias("check_name"),
        violations.cast("long").alias("n_violations"),
        total.cast("long").alias("n_rows"),
        (violations == 0).alias("passed"),
    ]


def _check_cols() -> list[F.Column]:
    """_check's twin for stack()-unpivoted frames already carrying
    (check_name, nv, n) columns."""
    return [
        F.col("check_name"),
        F.col("nv").cast("long").alias("n_violations"),
        F.col("n").cast("long").alias("n_rows"),
        (F.col("nv") == 0).alias("passed"),
    ]


def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative constraint audit in one report frame:
    completeness (NOT NULL), domain membership, numeric ranges, key
    uniqueness, and referential integrity — each a counted-violations
    row with a pass flag.

    One fused conditional-sum pass per table + one groupBy for the key
    uniqueness + two anti-joins for referential integrity; the final
    report is a union of 1-row aggregates (driver-size).

    Staging (r16 standing plan-audit gate): the audit touches orders
    five times and lineitem three times (fused agg, key-uniqueness
    groupBy, two referential anti-join probes, the temporal join), and
    the old plan re-scanned parquet for each consumer (orders 8x,
    lineitem 4x, zero exchange reuse) — each fused 1-row aggregate was
    even re-derived once per report row it fed. Now the needed column
    projections are memo-persisted once (exactly the staged audit
    table a production run materializes before a multi-check pass) and
    each fused aggregate emits ALL its report rows in one stack()
    unpivot instead of one .select per row."""
    from .dedup import _memo_persist

    li = _memo_persist(
        spark,
        sf_dir,
        "audit_lineitem_proj",
        lambda: load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_discount",
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
        ),
    )
    orders = _memo_persist(
        spark,
        sf_dir,
        "audit_orders_proj",
        lambda: load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
        ),
    )
    cust = load_table(spark, sf_dir, "customer")

    n1 = F.count(F.lit(1))
    # coalesce: SUM over an EMPTY table is NULL — a NULL violation count
    # makes `passed` NULL (neither pass nor fail, invisible to
    # passed=false alerting); an empty table audits as 0 violations /
    # passed=true (same contract as the streaming events_dq_batch,
    # r7 ADVICE; generalized after the round-8 empty-input sweep)
    cnt = lambda cond: F.coalesce(
        F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
    )

    li_checks = li.agg(
        cnt(F.col("l_discount") < 0).alias("v1"),
        cnt(F.col("l_discount") > 1).alias("v2"),
        cnt(F.col("l_quantity") <= 0).alias("v3"),
        cnt(F.col("l_extendedprice") < 0).alias("v4"),
        n1.alias("n"),
    )
    o_checks = orders.agg(
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v1"),
        cnt(F.col("o_totalprice") <= 0).alias("v2"),
        cnt(F.col("o_orderdate").isNull()).alias("v3"),
        n1.alias("n"),
    )
    c_checks = cust.agg(
        cnt(F.col("c_name").isNull()).alias("v1"),
        n1.alias("n"),
    )
    dup_orderkeys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)),
                F.lit(0),
            ).alias("v"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("n"),
        )
    )
    orphan_li = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(F.broadcast(li.agg(F.count(F.lit(1)).alias("n"))))
    )
    # cross-table temporal constraint — the one check here that FAILS
    # on the synthetic data (~47% of lineitems ship before their order
    # date: the generator draws shipdates independently of order
    # dates; discovered by the order_backlog sweep-line, which has to
    # clamp the inverted intervals). An audit that only ever passes
    # proves nothing; this row is the live demonstration.
    temporal = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_shipdate") < F.col("o_orderdate"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    orphan_orders = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(F.broadcast(orders.agg(F.count(F.lit(1)).alias("n"))))
    )

    # one stack() unpivot per fused aggregate: the aggregate computes
    # ONCE and emits every report row it feeds (the old one-.select-
    # per-row form re-derived the whole scan+agg per row — the r16
    # plan-audit class)
    li_rows = li_checks.selectExpr(
        "stack(4, "
        "'lineitem.discount >= 0', v1, "
        "'lineitem.discount <= 1', v2, "
        "'lineitem.quantity > 0', v3, "
        "'lineitem.extendedprice >= 0', v4) AS (check_name, nv)",
        "n",
    ).select(*_check_cols())
    o_rows = o_checks.selectExpr(
        "stack(3, "
        "'orders.status in (O,F,P)', v1, "
        "'orders.totalprice > 0', v2, "
        "'orders.orderdate not null', v3) AS (check_name, nv)",
        "n",
    ).select(*_check_cols())
    rows = [
        li_rows,
        o_rows,
        c_checks.select(*_check("customer.name not null", F.col("v1"), F.col("n"))),
        dup_orderkeys.select(
            *_check("orders.orderkey unique", F.col("v"), F.col("n"))
        ),
        orphan_li.select(
            *_check("lineitem.orderkey in orders", F.col("v"), F.col("n"))
        ),
        orphan_orders.select(
            *_check("orders.custkey in customer", F.col("v"), F.col("n"))
        ),
        temporal.select(
            *_check("lineitem.shipdate >= order date", F.col("v"), F.col("n"))
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("check_name")


SQL_CONSTRAINT_AUDIT = """
    WITH li AS (
        SELECT COALESCE(SUM(CASE WHEN l_discount < 0 THEN 1 ELSE 0 END), 0) AS v1,
               COALESCE(SUM(CASE WHEN l_discount > 1 THEN 1 ELSE 0 END), 0) AS v2,
               COALESCE(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS v3,
               COALESCE(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END), 0) AS v4,
               COUNT(*) AS n
        FROM lineitem
    ), o AS (
        SELECT COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END), 0) AS v1,
               COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS v2,
               COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS v3,
               COUNT(*) AS n
        FROM orders
    ), c AS (
        SELECT COALESCE(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END), 0) AS v1,
               COUNT(*) AS n
        FROM customer
    ), dup AS (
        SELECT COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS v,
               COALESCE(SUM(c), 0) AS n
        FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey)
    ), orph_li AS (
        -- NOT EXISTS, not NOT IN: a NULL in the referenced key column
        -- would make NOT IN yield zero rows (0 orphans) while the Spark
        -- side's left_anti counts every orphan (r7 ADVICE — null-safe,
        -- matches left_anti semantics)
        SELECT (SELECT COUNT(*) FROM lineitem
                WHERE NOT EXISTS (SELECT 1 FROM orders
                                  WHERE o_orderkey = l_orderkey)) AS v,
               (SELECT COUNT(*) FROM lineitem) AS n
    ), orph_o AS (
        SELECT (SELECT COUNT(*) FROM orders
                WHERE NOT EXISTS (SELECT 1 FROM customer
                                  WHERE c_custkey = o_custkey)) AS v,
               (SELECT COUNT(*) FROM orders) AS n
    ), temporal AS (
        SELECT COALESCE(SUM(CASE WHEN l_shipdate < o_orderdate
                            THEN 1 ELSE 0 END), 0) AS v,
               COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT * FROM (
        SELECT 'lineitem.discount >= 0' AS check_name, CAST(v1 AS BIGINT)
               AS n_violations, CAST(n AS BIGINT) AS n_rows, v1 = 0 AS passed
        FROM li
        UNION ALL
        SELECT 'lineitem.discount <= 1', CAST(v2 AS BIGINT),
               CAST(n AS BIGINT), v2 = 0 FROM li
        UNION ALL
        SELECT 'lineitem.quantity > 0', CAST(v3 AS BIGINT),
               CAST(n AS BIGINT), v3 = 0 FROM li
        UNION ALL
        SELECT 'lineitem.extendedprice >= 0', CAST(v4 AS BIGINT),
               CAST(n AS BIGINT), v4 = 0 FROM li
        UNION ALL
        SELECT 'orders.status in (O,F,P)', CAST(v1 AS BIGINT),
               CAST(n AS BIGINT), v1 = 0 FROM o
        UNION ALL
        SELECT 'orders.totalprice > 0', CAST(v2 AS BIGINT),
               CAST(n AS BIGINT), v2 = 0 FROM o
        UNION ALL
        SELECT 'orders.orderdate not null', CAST(v3 AS BIGINT),
               CAST(n AS BIGINT), v3 = 0 FROM o
        UNION ALL
        SELECT 'customer.name not null', CAST(v1 AS BIGINT),
               CAST(n AS BIGINT), v1 = 0 FROM c
        UNION ALL
        SELECT 'orders.orderkey unique', CAST(v AS BIGINT),
               CAST(n AS BIGINT), v = 0 FROM dup
        UNION ALL
        SELECT 'lineitem.orderkey in orders', CAST(v AS BIGINT),
               CAST(n AS BIGINT), v = 0 FROM orph_li
        UNION ALL
        SELECT 'orders.custkey in customer', CAST(v AS BIGINT),
               CAST(n AS BIGINT), v = 0 FROM orph_o
        UNION ALL
        SELECT 'lineitem.shipdate >= order date', CAST(v AS BIGINT),
               CAST(n AS BIGINT), v = 0 FROM temporal
    )
    ORDER BY check_name
"""


SCD2_EPOCH = "1995-01-01"
SCD2_WINDOW_START = "1998-01-01"
SCD2_WINDOW_END = "1998-07-01"


def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply a batch of
    account-balance updates to the customer dimension, versioning
    changed rows instead of overwriting them. The update batch is
    derived deterministically from the data: every customer who ordered
    in 1998-H1 gets acctbal += Σ(o_totalprice in the window), effective
    at their LAST order date in the window.

    Merge shape: the dimension LEFT-joins the (small) update batch
    once — unmatched rows pass through open (valid_to NULL, current);
    matched rows fan out via an inline 2-element explode into the
    closed-out old version (valid_to = effective ts) and the new
    current version. One scan of the dimension, one broadcastable
    update aggregate, no union-of-two-joins double scan.

    Balance arithmetic goes through DECIMAL(38,6) (the dsum
    discipline) so old + delta is exact on both engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(SCD2_WINDOW_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(SCD2_WINDOW_END).cast("timestamp"))
    )
    updates = orders.groupBy("o_custkey").agg(
        dsum(F.col("o_totalprice")).alias("delta"),
        F.max("o_orderdate").alias("eff_ts"),
    )
    merged = cust.join(
        updates, F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    epoch = F.lit(SCD2_EPOCH).cast("timestamp")
    # version = 0 -> the original row (closed out if an update matched);
    # version = 1 -> the new current row (updated customers only)
    versions = merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        "delta",
        "eff_ts",
        F.explode(
            F.when(F.col("eff_ts").isNotNull(), F.array(F.lit(0), F.lit(1)))
            .otherwise(F.array(F.lit(0)))
        ).alias("version"),
    )
    new_bal = (
        (
            F.col("c_acctbal").cast("decimal(38,6)")
            + F.col("delta").cast("decimal(38,6)")
        ).cast("double")
    )
    return versions.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.when(F.col("version") == 1, new_bal)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.when(F.col("version") == 1, F.col("eff_ts"))
        .otherwise(epoch)
        .alias("valid_from"),
        F.when(
            (F.col("version") == 0) & F.col("eff_ts").isNotNull(),
            F.col("eff_ts"),
        ).alias("valid_to"),
        (
            (F.col("version") == 1)
            | ((F.col("version") == 0) & F.col("eff_ts").isNull())
        ).alias("is_current"),
    ).orderBy("c_custkey", "valid_from")


SQL_SCD2_APPLY = f"""
    WITH updates AS (
        SELECT o_custkey,
               {dsum_sql("o_totalprice")} AS delta,
               MAX(o_orderdate) AS eff_ts
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{SCD2_WINDOW_START}'
          AND o_orderdate < TIMESTAMP '{SCD2_WINDOW_END}'
        GROUP BY o_custkey
    ), merged AS (
        SELECT c.*, u.delta, u.eff_ts
        FROM customer c LEFT JOIN updates u ON c.c_custkey = u.o_custkey
    ), versions AS (
        SELECT m.*, v.version
        FROM merged m,
             UNNEST(CASE WHEN m.eff_ts IS NOT NULL THEN [0, 1]
                         ELSE [0] END) AS v(version)
    )
    SELECT c_custkey, c_name, c_mktsegment,
           CASE WHEN version = 1 THEN CAST(
                    CAST(c_acctbal AS DECIMAL(38,6))
                    + CAST(delta AS DECIMAL(38,6)) AS DOUBLE)
                ELSE c_acctbal END AS acctbal,
           CASE WHEN version = 1 THEN eff_ts
                ELSE TIMESTAMP '{SCD2_EPOCH}' END AS valid_from,
           CASE WHEN version = 0 AND eff_ts IS NOT NULL THEN eff_ts
                ELSE NULL END AS valid_to,
           (version = 1 OR (version = 0 AND eff_ts IS NULL)) AS is_current
    FROM versions
    ORDER BY c_custkey, valid_from
"""


MV_CUTOFF = "1999-01-01"


def q_agg_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a pre-aggregated view
    (revenue + order count per priority x year) maintained by MERGING
    the stored base aggregate with a freshly-aggregated delta batch,
    instead of recomputing over all history. Sums and counts are
    re-associable partial aggregates, so base ⊎ delta re-aggregated on
    the same keys IS the full recompute — and because both sums go
    through DECIMAL(38,6), the merged result is bit-identical to it,
    which is exactly what the oracle checks (the oracle is the full
    recompute over all orders; a green hash here PROVES the
    incremental path is exact, not approximately right).

    Scale shape: the historical side aggregates once (in production
    it is a stored artifact, read not recomputed); each refresh costs
    O(delta) + a |view|-key merge, never O(history). avg derives at
    read time as sum/count (one IEEE division) — never maintained as
    a running average, which does not merge."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderpriority", F.year("o_orderdate").alias("o_year")
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "o_year")
        .agg(
            F.sum("rev_dec").alias("rev_dec"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
    # scale-4 re-round before the double casts: per-cell revenue
    # crosses the scale-6 2^53 line at sf1.0 (the decayed_revenue rule)
    rev4 = F.round(F.col("rev_dec"), 4).cast("double")
    return merged.select(
        "o_orderpriority",
        "o_year",
        rev4.alias("revenue"),
        "n_orders",
        (rev4 / F.col("n_orders")).alias("avg_order_value"),
    ).orderBy("o_orderpriority", "o_year")


# The oracle is the FULL recompute — parity proves the incremental
# merge exact.
SQL_AGG_DELTA_MERGE = f"""
    SELECT o_orderpriority,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           {dsum4_sql("o_totalprice")} AS revenue,
           COUNT(*) AS n_orders,
           {dsum4_sql("o_totalprice")} / COUNT(*) AS avg_order_value
    FROM orders
    GROUP BY o_orderpriority, o_year
    ORDER BY o_orderpriority, o_year
"""


K_ANON = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (c_nationkey, c_mktsegment): the minimum equivalence-class size,
    how many classes and rows fall below k=5, and the at-risk row
    fraction — the re-identification screen a privacy review runs
    before any customer-grain export (the PII tier's structural
    counterpart: pii_scrub redacts direct identifiers, this measures
    indirect ones).

    One |QI-classes|-bounded aggregation then a scalar fold; the risk
    fraction rounds through DECIMAL(38,6) (single division, then the
    repo's standard round-trip)."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    # empty-input contract (round-8 sweep): MIN/SUM over zero classes
    # are NULL — coalesce to 0 so the report stays typed and the
    # is_k_anonymous flag is a real boolean (k_min=0 < k reads as NOT
    # anonymous: conservative for an empty export); the risk fraction
    # is try_divide (0 rows -> NULL, matching the oracle's NaN/NULL)
    return classes.agg(
        F.coalesce(F.min("sz"), F.lit(0)).alias("k_min"),
        F.count(F.lit(1)).alias("n_classes"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("sz") < K_ANON, 1).otherwise(0)), F.lit(0)
        ).alias("classes_at_risk"),
        F.coalesce(
            F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0)),
            F.lit(0),
        ).alias("rows_at_risk"),
    ).select(
        "k_min",
        "n_classes",
        "n_rows",
        "classes_at_risk",
        "rows_at_risk",
        F.try_divide(F.col("rows_at_risk"), F.col("n_rows"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("risk_fraction"),
        (F.col("k_min") >= K_ANON).alias("is_k_anonymous"),
    )


SQL_K_ANONYMITY = f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT COALESCE(MIN(sz), 0) AS k_min,
           COUNT(*) AS n_classes,
           CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS classes_at_risk,
           CAST(COALESCE(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END), 0)
               AS BIGINT) AS rows_at_risk,
           CAST(CAST(CAST(COALESCE(SUM(CASE WHEN sz < {K_ANON}
                                        THEN sz ELSE 0 END), 0) AS DOUBLE)
                     / CAST(COALESCE(SUM(sz), 0) AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS risk_fraction,
           COALESCE(MIN(sz), 0) >= {K_ANON} AS is_k_anonymous
    FROM classes
"""


ERASURE_USER_MOD = 97  # deterministic stand-in for a deletion-request list


def q_erasure_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact plan: given a deletion-request set (here
    a deterministic stand-in — every customer key ≡ 0 mod 97; in
    production a small request table), count the rows each table loses,
    following the foreign-key cascade: customer rows directly, orders
    via custkey, lineitem via the affected orderkeys, events via
    user_id. The PLAN (counts per table) is what a privacy office
    reviews before the destructive pass runs — and at 100 TB the
    cascade is two semi-join hops whose build sides are the
    request-scale key sets, never the facts.

    Shape: the request set broadcasts; each table pays one LEFT SEMI
    join + count; the orderkey set for the lineitem hop is itself
    request-scale (orders of deleted customers), derived once."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    targets = cust.filter(
        F.col("c_custkey") % ERASURE_USER_MOD == 0
    ).select("c_custkey")
    doomed_orders = orders.join(
        F.broadcast(targets), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    doomed_orderkeys = doomed_orders.select("o_orderkey")

    counts = [
        ("customer", targets.agg(F.count(F.lit(1)).alias("n")),
         cust.agg(F.count(F.lit(1)).alias("t"))),
        ("orders", doomed_orders.agg(F.count(F.lit(1)).alias("n")),
         orders.agg(F.count(F.lit(1)).alias("t"))),
        (
            "lineitem",
            li.join(
                F.broadcast(doomed_orderkeys),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi",
            ).agg(F.count(F.lit(1)).alias("n")),
            li.agg(F.count(F.lit(1)).alias("t")),
        ),
        (
            "events",
            events.join(
                F.broadcast(targets),
                F.col("user_id") == F.col("c_custkey"),
                "left_semi",
            ).agg(F.count(F.lit(1)).alias("n")),
            events.agg(F.count(F.lit(1)).alias("t")),
        ),
    ]
    out = None
    for name, n, t in counts:
        row = (
            n.crossJoin(F.broadcast(t))
            .select(
                F.lit(name).alias("table_name"),
                F.col("n").alias("rows_to_delete"),
                F.col("t").alias("rows_total"),
                # try_divide: an EMPTY table (t=0) must yield a NULL
                # fraction, not an ANSI DIVIDE_BY_ZERO crash mid-plan
                # (found by the round-8 empty-input sweep)
                F.try_divide(
                    F.col("n").cast("double"), F.col("t").cast("double")
                )
                .cast("decimal(38,6)")
                .cast("double")
                .alias("delete_fraction"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


SQL_ERASURE_PLAN = f"""
    WITH targets AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {ERASURE_USER_MOD} = 0
    ), doomed_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM targets)
    ), rows AS (
        SELECT 'customer' AS table_name,
               (SELECT COUNT(*) FROM targets) AS rows_to_delete,
               (SELECT COUNT(*) FROM customer) AS rows_total
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM doomed_orders),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)),
               (SELECT COUNT(*) FROM lineitem)
        UNION ALL
        SELECT 'events',
               (SELECT COUNT(*) FROM events
                WHERE user_id IN (SELECT c_custkey FROM targets)),
               (SELECT COUNT(*) FROM events)
    )
    SELECT table_name, rows_to_delete, rows_total,
           CAST(CAST(CAST(rows_to_delete AS DOUBLE)
                     / CAST(rows_total AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS delete_fraction
    FROM rows
    ORDER BY table_name
"""


# --- l-diversity audit (round 9) ---------------------------------------------

# distinct-sensitive-values floor per QI class (Machanavajjhala et al.,
# "l-Diversity: Privacy Beyond k-Anonymity", ICDE'06). 8 splits the
# class population at the driver SF (sf0.01: l_distinct ranges 4..10
# over the 125 classes) so the verdict column is actually falsifiable
# there — the NEARDUP_COS_CATALOG parameter discipline.
L_DIV = 8
# sensitive attribute = account-balance band (1000-unit buckets): one
# IEEE division + floor, identical both engines
SENS_BAND = 1000.0


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the same quasi-identifier pair as
    q_k_anonymity (c_nationkey, c_mktsegment), sensitive attribute =
    the customer's account-balance band: a class can be k-anonymous yet
    leak the sensitive value when everyone in it shares one band —
    that homogeneity is exactly what this measures. Per-class rows
    (size, distinct sensitive values l, the diversity verdict) so a
    privacy review can target the failing classes; q_k_anonymity's
    scalar report is the companion summary.

    Scale shape: sensitive band is a per-row double division + floor
    (no shuffle), then ONE |QI-classes|-bounded two-level aggregation —
    count-distinct of the band inside each class collapses map-side
    because (QI, band) is grouped first, so the wide shuffle carries
    |QI x bands| rows, not |customers|."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(SENS_BAND)).alias("band"),
    )
    # two-level: (QI, band) first so the distinct collapses map-side
    per_band = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_band.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "l_distinct",
            (F.col("l_distinct") >= F.lit(L_DIV)).alias("is_l_diverse"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


SQL_L_DIVERSITY = f"""
    WITH bands AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT) AS band
        FROM customer
    ), per_band AS (
        SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS n
        FROM bands GROUP BY c_nationkey, c_mktsegment, band
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(SUM(n) AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           COUNT(*) >= {L_DIV} AS is_l_diverse
    FROM per_band
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
"""


# --- small-cell-safe release (round 9) ---------------------------------------

# release parameters: suppress below RELEASE_K, perturb by a seeded
# integer in [-NOISE_HALF, +NOISE_HALF], publish rounded to ROUND_BASE.
# The release grain is the FINER (QI, band) cell — small cells exist
# there by construction, and RELEASE_K=3 yields a real suppressed /
# released mix at both sf0.01 (765/136) and sf0.1 (4/1371).
RELEASE_K = 3
NOISE_HALF = 3
ROUND_BASE = 5


def q_private_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census-style small-cell-safe release of the (QI, balance-band)
    cell counts: cells below RELEASE_K are SUPPRESSED (released as
    NULL), surviving cells are perturbed by a seeded integer noise draw
    in [-3, +3] and published rounded to base-5 — the suppression +
    perturbation + controlled-rounding stack statistical agencies apply
    before publishing small-area tabulations. The noise source is a
    deterministic md5 draw keyed by the cell (the repo's seeded-coin
    pattern, score_weighted_sample discipline) standing in for the
    calibrated DP mechanism — the release SHAPE (which cells survive,
    integer-exact post-processing) is the operator under test and is
    what the oracle pins in both directions (a cell wrongly released
    AND a cell wrongly suppressed each break parity).

    Integer-exact end-to-end: the band is one IEEE division + floor
    identical on both engines; the noise is an int64 remainder; the
    rounding is pure integer arithmetic on nonneg values (cnt >= 3,
    noise >= -3, so v + 2 >= 2 — both engines' % agree on
    nonnegatives); no floating point past the band.

    Scale shape: ONE |QI x bands|-bounded aggregation then per-row
    integer expressions; nothing after the groupBy exceeds |cells|."""
    from ..functions.texthash import md5_hash64

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(SENS_BAND)).alias("band"),
    )
    cells = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    noise = (
        md5_hash64(
            F.concat(
                F.lit("release|"),
                F.col("c_nationkey").cast("string"),
                F.lit("|"),
                F.col("c_mktsegment"),
                F.lit("|"),
                F.col("band").cast("string"),
            )
        )
        % F.lit(2 * NOISE_HALF + 1)
        - F.lit(NOISE_HALF)
    )
    cells = cells.withColumn("noise", noise.cast("long")).withColumn(
        "suppressed", F.col("true_count") < F.lit(RELEASE_K)
    )
    v = F.col("true_count") + F.col("noise")
    rounded = (v + F.lit(ROUND_BASE // 2)) - (
        v + F.lit(ROUND_BASE // 2)
    ) % F.lit(ROUND_BASE)
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("band").cast("long").alias("band"),
        "true_count",
        "noise",
        "suppressed",
        F.when(F.col("suppressed"), F.lit(None).cast("long"))
        .otherwise(rounded.cast("long"))
        .alias("released_count"),
    ).orderBy("c_nationkey", "c_mktsegment", "band")


_SQL_RELEASE_NOISE = (
    "(("
    + SQL_MD5_HASH64.format(
        x="'release|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment"
        " || '|' || CAST(band AS VARCHAR)"
    )
    + f" % {2 * NOISE_HALF + 1}) - {NOISE_HALF})"
)

SQL_PRIVATE_RELEASE = f"""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT) AS band,
               COUNT(*) AS true_count
        FROM customer GROUP BY c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT)
    ), seeded AS (
        SELECT c_nationkey, c_mktsegment, band,
               CAST(true_count AS BIGINT) AS true_count,
               CAST({{noise}} AS BIGINT) AS noise,
               true_count < {RELEASE_K} AS suppressed
        FROM cells
    )
    SELECT c_nationkey, c_mktsegment, band, true_count, noise, suppressed,
           CASE WHEN suppressed THEN NULL
                ELSE CAST(
                    (true_count + noise + {ROUND_BASE // 2})
                    - (true_count + noise + {ROUND_BASE // 2})
                      % {ROUND_BASE}
                    AS BIGINT)
           END AS released_count
    FROM seeded
    ORDER BY c_nationkey, c_mktsegment, band
""".format(noise=_SQL_RELEASE_NOISE)


# --- declarative column profiler (round 9) -----------------------------------


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Glue-style column profile of the orders table: per column,
    row count, null count and rate, exact distinct count, and min/max
    rendered through type-pinned formats — the profiling pass a
    warehouse runs BEFORE writing constraints (constraint_audit checks
    rules someone already wrote; this is where the rules come from).

    Min/max render via explicit per-type formats (decimal string for
    the money column, fixed strftime for the timestamp, raw casts for
    ints/strings) because engine-native double/timestamp -> string
    formatting differs; the formats are part of the operator contract.

    Determinism: counts are exact int64; null_rate is one decimal
    division; distincts are exact (the production variant swaps in
    approx_count_distinct at petabyte scale — the plan shape is
    identical, this form is the oracle-checkable calibration of that
    swap).

    Scale shape: ONE scan; the multi-column exact COUNT(DISTINCT)
    battery compiles to Spark's Expand (|columns| x rows map-side,
    partial-agged before the exchange) — the standard profiling cost;
    the unpivot emits |columns| rows. The Expand inflation is pure
    scan-side compute, so the scan is _parallel_scan-guarded (r17: on
    the single-row-group testdata layout the whole |columns| x rows
    pass ran on ONE task, 4-7 s at sf0.1; the guard is a no-op on any
    multi-split scan)."""
    from .dedup import _parallel_scan

    od = _parallel_scan(spark, load_table(spark, sf_dir, "orders"))
    ts_fmt = "yyyy-MM-dd HH:mm:ss"

    def prof(col: str, mn, mx):
        return F.struct(
            F.lit(col).alias("column"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(col).isNull().cast("long"))
            .cast("long")
            .alias("n_null"),
            F.countDistinct(F.col(col)).cast("long").alias("n_distinct"),
            mn.alias("min_display"),
            mx.alias("max_display"),
        )

    def s(col):  # plain cast
        return F.min(F.col(col)).cast("string"), F.max(
            F.col(col)
        ).cast("string")

    def dec(col):  # 2-decimal money
        return (
            F.min(F.col(col)).cast("decimal(38,2)").cast("string"),
            F.max(F.col(col)).cast("decimal(38,2)").cast("string"),
        )

    def ts(col):
        return (
            F.date_format(F.min(F.col(col)), ts_fmt),
            F.date_format(F.max(F.col(col)), ts_fmt),
        )

    agg = od.agg(
        F.array(
            prof("o_orderkey", *s("o_orderkey")),
            prof("o_custkey", *s("o_custkey")),
            prof("o_orderstatus", *s("o_orderstatus")),
            prof("o_totalprice", *dec("o_totalprice")),
            prof("o_orderdate", *ts("o_orderdate")),
            prof("o_orderpriority", *s("o_orderpriority")),
        ).alias("cols")
    )
    return (
        agg.select(F.explode("cols").alias("c"))
        .select("c.*")
        .select(
            "column",
            "n_rows",
            "n_null",
            F.try_divide(F.col("n_null"), F.col("n_rows"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("null_rate"),
            "n_distinct",
            "min_display",
            "max_display",
        )
        .orderBy("column")
    )


def _sql_profile_arm(col: str, mn: str, mx: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {mn} AS min_display,
               {mx} AS max_display
        FROM orders"""


SQL_TABLE_PROFILE = f"""
    WITH arms AS (
        {_sql_profile_arm('o_orderkey',
            'CAST(MIN(o_orderkey) AS VARCHAR)',
            'CAST(MAX(o_orderkey) AS VARCHAR)')}
        UNION ALL {_sql_profile_arm('o_custkey',
            'CAST(MIN(o_custkey) AS VARCHAR)',
            'CAST(MAX(o_custkey) AS VARCHAR)')}
        UNION ALL {_sql_profile_arm('o_orderstatus',
            'MIN(o_orderstatus)', 'MAX(o_orderstatus)')}
        UNION ALL {_sql_profile_arm('o_totalprice',
            'CAST(CAST(MIN(o_totalprice) AS DECIMAL(38,2)) AS VARCHAR)',
            'CAST(CAST(MAX(o_totalprice) AS DECIMAL(38,2)) AS VARCHAR)')}
        UNION ALL {_sql_profile_arm('o_orderdate',
            "strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')",
            "strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')")}
        UNION ALL {_sql_profile_arm('o_orderpriority',
            'MIN(o_orderpriority)', 'MAX(o_orderpriority)')}
    )
    SELECT "column", n_rows, n_null,
           CAST(CAST(CAST(n_null AS DOUBLE) / CAST(n_rows AS DOUBLE)
                AS DECIMAL(38,6)) AS DOUBLE) AS null_rate,
           n_distinct, min_display, max_display
    FROM arms
    ORDER BY "column"
"""


# --- zone-map / data-skipping layout audit (round 10) ---------------------------

ZM_FILE_KEYS = 500  # orderkeys per simulated data file
ZM_PRUNE_LO = "1997-01-01"  # the audited predicate: shipdate in [LO, HI)
ZM_PRUNE_HI = "1998-01-01"


def q_zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping audit — the lakehouse layout question
    behind every Delta/Iceberg OPTIMIZE decision: if lineitem were laid
    out as files of ZM_FILE_KEYS consecutive orderkeys, what do each
    file's min/max shipdate zone maps look like, and can the standard
    one-year predicate [ZM_PRUNE_LO, ZM_PRUNE_HI) skip the file
    entirely (max < LO or min >= HI)? Emits one row per simulated
    file: row count, the zone map, its span in days, and the prunable
    verdict — wide spans with prunable=false across the board is the
    signature that says "cluster by shipdate before you ship this
    table" (Moerkotte, Small Materialized Aggregates, VLDB 1998 — the
    zone-map paper).

    Determinism: file ids are exact integer division; zone maps are
    MIN/MAX of dates (comparisons only); the span is integer datediff;
    the verdict compares dates against shared literals.

    Scale shape (100 TB): ONE map-side-combinable aggregate keyed by
    file id (the exact zone-map build a writer performs); output is
    |files| rows. No joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") / F.lit(ZM_FILE_KEYS))
        .cast("long")
        .alias("file_id"),
        F.to_date("l_shipdate").alias("ship"),
    )
    lo = F.lit(ZM_PRUNE_LO).cast("date")
    hi = F.lit(ZM_PRUNE_HI).cast("date")
    return (
        li.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ship").alias("mn"),
            F.max("ship").alias("mx"),
        )
        .select(
            "file_id",
            "n_rows",
            F.date_format("mn", "yyyy-MM-dd").alias("min_ship"),
            F.date_format("mx", "yyyy-MM-dd").alias("max_ship"),
            F.datediff(F.col("mx"), F.col("mn"))
            .cast("long")
            .alias("span_days"),
            ((F.col("mx") < lo) | (F.col("mn") >= hi)).alias("prunable"),
        )
        .orderBy("file_id")
    )


SQL_ZONEMAP_PRUNE_AUDIT = f"""
    WITH zm AS (
        SELECT l_orderkey // {ZM_FILE_KEYS} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(CAST(l_shipdate AS DATE)) AS mn,
               MAX(CAST(l_shipdate AS DATE)) AS mx
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(file_id AS BIGINT) AS file_id, n_rows,
           strftime(mn, '%Y-%m-%d') AS min_ship,
           strftime(mx, '%Y-%m-%d') AS max_ship,
           CAST(date_diff('day', mn, mx) AS BIGINT) AS span_days,
           (mx < DATE '{ZM_PRUNE_LO}' OR mn >= DATE '{ZM_PRUNE_HI}')
               AS prunable
    FROM zm
    ORDER BY file_id
"""
