"""Relational breadth tier 3: the classic multi-join / correlated-
subquery TPC-H shapes not yet covered by relational.py / relational2.py
(SURVEY.md §2.4-2.5 extension surface) — Q4 EXISTS semi-join, Q7 volume
shipping, Q8 market share, Q9 product profit, Q13 outer-join histogram,
Q15 top supplier (scalar-aggregate subquery), and a Q2-flavored
min-cost-supplier correlated subquery.

Same determinism contract as relational.py (decimal-disciplined SUMs via
dsum/dsum_sql, unique ORDER BY tiebreakers, per-row double expressions
written with identical operation order in Spark and the oracle).

Scale notes (100 TB): every query here keeps lineitem/orders as the
probe side of shuffle joins on their natural keys (co-partitioned SMJ
under AQE), broadcasts only the bounded dims (nation ×2 aliases,
region), and pushes all date/flag filters into the parquet scan before
any join. The Q13 histogram's second aggregation runs over |customers|
rows, and the Q15/Q2 "equal to the max/min" filters compare exact
DECIMAL(38,6) aggregates — parallelism-independent, so the winner set is
stable at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..tables import load_table
from .relational import dsum, dsum_sql


def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders in one quarter having at least one
    lineitem shipped >30 days after the order date, counted per
    priority. The EXISTS is a LEFT SEMI join — lineitem never widens
    the orders rows, and the 30-day predicate rides inside the join so
    Spark evaluates it during the probe (no post-join filter pass)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualifying = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_COUNT = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between two nations per year,
    both directions. nation joins twice under distinct aliases — both
    broadcast (25 rows); the nation-pair filter applies after the two
    broadcasts but before the groupBy, so the shuffle carries only the
    qualifying pair's rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(revenue).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_VOLUME_SHIPPING = f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum_sql("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1.0 - l_discount) AS volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: NATION_3's share of PROMO-part revenue sold to
    ASIA customers, per year. The share is two decimal-disciplined sums
    in ONE aggregation pass (conditional sum / total sum) and a single
    IEEE division — identical to the oracle's evaluation order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    n_supp = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cr_key") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(target) / dsum(revenue)).alias("mkt_share"))
        .orderBy("o_year")
    )


SQL_MARKET_SHARE = f"""
    SELECT o_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             / {dsum_sql("volume")} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1.0 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped (adapted: testdata has no partsupp, so supply
    cost is modeled as 60% of p_retailprice): profit on parts whose
    name contains 'bolt', per supplier nation per year. The p_name
    LIKE filter prunes part BEFORE its join; profit is one per-row
    double expression with identical operation order on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - (
        F.lit(0.6) * F.col("p_retailprice")
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


SQL_PRODUCT_PROFIT = f"""
    SELECT nation, o_year, {dsum_sql("amount")} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1.0 - l_discount)
               - (0.6 * p_retailprice) * l_quantity AS amount
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: histogram of orders-per-customer, including
    zero-order customers via LEFT OUTER join with the priority filter
    INSIDE the join condition (a WHERE would silently drop the
    zero-order customers the query exists to count). Two aggregations:
    the first shuffles |customers| keys, the second runs over the tiny
    distinct-count frame."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_CUSTOMER_DISTRIBUTION = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with maximum revenue in one
    quarter. The "equal to the max" filter compares the EXACT
    DECIMAL(38,6) aggregate (not the double projection), so float
    round-trip can never split or merge winners — parallelism- and
    engine-independent. Spark side: an empty-frame MAX window over the
    |suppliers|-row aggregate (tiny; the WindowExec WARN class is the
    documented window-above-aggregate shape)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue.cast("decimal(38,6)")).alias("rev_dec")
    )
    best = per_supp.withColumn(
        "max_rev", F.max("rev_dec").over(W.partitionBy())
    ).filter(F.col("rev_dec") == F.col("max_rev"))
    return (
        best.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TOP_SUPPLIER = """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(38,6))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
    FROM revenue0 JOIN supplier ON supplier_no = s_suppkey
    WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue0)
    ORDER BY s_suppkey
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-flavored (adapted: no partsupp — the observed minimum
    unit price over lineitem plays the supplycost role): for each small
    part, the supplier(s) that have sold it at the lowest unit price.
    The correlated `price = (SELECT MIN ...)` decorrelates to a per-part
    MIN window over the (part, supplier) aggregate; MIN over doubles is
    exact and order-independent, so the equality filter is stable at
    any parallelism. Top 25 by retail price with unique tiebreakers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    best = per_ps.withColumn(
        "part_min", F.min("min_unit_price").over(W.partitionBy("l_partkey"))
    ).filter(F.col("min_unit_price") == F.col("part_min"))
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            "s_name",
            "s_acctbal",
            "min_unit_price",
        )
        .orderBy(
            F.col("p_retailprice").desc(),
            F.col("p_partkey"),
            F.col("s_name"),
        )
        .limit(25)
    )


SQL_MIN_COST_SUPPLIER = """
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS min_unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, p_retailprice, s_name, s_acctbal,
           min_unit_price
    FROM per_ps
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size <= 5
      AND min_unit_price = (
        SELECT MIN(min_unit_price) FROM per_ps i
        WHERE i.l_partkey = per_ps.l_partkey
      )
    ORDER BY p_retailprice DESC, p_partkey, s_name
    LIMIT 25
"""


# --- round-8 wave: Q17 / Q22 shapes ------------------------------------------
# (Q10 and Q18 shapes already live in relational2.py as returned_items
# and big_orders — do not re-add them here.)


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue that would be lost by
    refusing small-quantity orders of one brand's parts — lineitems
    whose quantity is under 20% of that part's average order quantity.

    The correlated `qty < 0.2 * (SELECT AVG ... WHERE same part)`
    decorrelates to one per-part aggregate joined back to the brand's
    lineitems. Determinism: the per-part mean is
    CAST(decimal-sum AS DOUBLE) / count — one IEEE division in the same
    order on both engines (engine-native AVG over doubles is
    order-dependent and banned, relational.py module doc). Scale shape:
    the brand filter prunes part to ~1/25 before either scan-side join;
    both joins broadcast the pruned part key set, so lineitem is
    scanned twice (once per aggregate) but never shuffled."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#11"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = brand_li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        brand_li.join(
            F.broadcast(per_part),
            F.col("l_partkey") == F.col("ap_partkey"),
        )
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


SQL_SMALL_QTY_REVENUE = """
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#11'
    ), per_part AS (
      SELECT l_partkey AS ap_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM brand_li GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM brand_li JOIN per_part ON l_partkey = ap_partkey
    WHERE l_quantity < 0.2 * avg_qty
"""


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-flavored (adapted: market segment plays the country-
    code role — the schema has no phone column): per segment, the
    customers with above-average positive account balance and NO order
    since the cutoff — the dormant-but-funded accounts a sales team
    would call first.

    Scale shape: the global mean balance is one scalar aggregate
    (decimal-sum / count) broadcast via a 1-row cross join; the
    "no recent order" predicate is a LEFT ANTI join against the
    date-pruned orders scan (the NOT EXISTS decorrelation — never a
    count-then-filter materialization); the final aggregate is
    |segments| keys."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))  # 1-row scalar broadcast
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


SQL_SALES_OPPORTUNITY = f"""
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           {dsum_sql('c_acctbal')} AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c.c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


# --- round-9 wave: the remaining classic shapes (Q3/Q6/Q11/Q16/Q19/Q20/Q21) --
# (With these the full set of TPC-H query archetypes expressible over the
# testdata star schema is covered: Q1 agg_revenue, Q3/Q4/Q5/Q6/Q7/Q8/Q9 here
# and in relational*.py, Q10 returned_items, Q11/Q16/Q19/Q20/Q21 below,
# Q12 late_shipments, Q13/Q15/Q17/Q22 above, Q14 promo_revenue, Q18
# big_orders, Q2-flavored min_cost_supplier. Q11/Q16/Q20 are adapted to the
# schema's lack of a partsupp table — supply relationships observed through
# lineitem play the partsupp role; Q21 is adapted to the lack of
# l_commitdate/l_receiptdate — "late" is shipped >90 days after the order
# date.)


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 unshipped-revenue orders for one market
    segment as of a cutoff date. Both date predicates and the segment
    filter push into the parquet scans BEFORE either join; the
    customer side is filtered to one segment (broadcastable at any SF
    where |segment| stays dim-sized, else AQE picks SMJ); the final
    TakeOrderedAndProject keeps only 10 rows per partition before the
    single-driver merge — no full sort of the aggregate.

    Reference stake: the multi-join + agg + top-k composition of the
    reference's processor graphs (lenses-topology-example
    sparkstreaming/App.java:66-85 composes source->join->agg->sink the
    same way, minus SQL)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


SQL_SHIPPING_PRIORITY = f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: revenue increase from eliminating small-order
    discounts in one year. The whole query is ONE scan with every
    predicate (year range, discount band, quantity cap) pushed into
    the parquet reader and a partial+final aggregate to a single row —
    the canonical zero-shuffle filter-agg; at 100 TB the only data
    movement is |partitions| partial rows. The discount band compares
    the SAME stored doubles against the same literals on both engines,
    so the boundary rows (0.05/0.07 exactly) agree by construction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_FORECAST_REVENUE = f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped (adapted: no partsupp table — the observed
    supply value of a part is its lineitem revenue): parts whose value
    exceeds 1.2x the all-parts average, i.e. the HAVING-against-a-
    global-fraction shape. The per-part value is ONE keyed aggregate;
    the global average is a second aggregate over that result REUSED
    via its shuffle (identical subplan -> Spark's ReusedExchange, so
    lineitem is scanned once) and broadcast as a 1-row scalar — no
    unpartitioned window over |parts| rows, which at 100 TB would
    funnel billions of part rows through one task. Threshold
    arithmetic is exact-decimal sum -> double divide -> double
    multiply in the SAME order on both engines, so boundary parts
    agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice")).alias("value")
    )
    # the inner sum spans the WHOLE lineitem total (~2.3e11 at sf1.0)
    # — scale-4 re-round before the double cast (the 2^53 rule), else
    # the threshold itself diverges cross-engine and boundary parts
    # flip in/out of the result set
    avg_v = pv.agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 4)
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_value")
    )
    return (
        pv.crossJoin(F.broadcast(avg_v))  # 1-row scalar broadcast
        .filter(F.col("value") > F.col("avg_value") * 1.2)
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


SQL_IMPORTANT_PARTS = f"""
    WITH pv AS (
        SELECT l_partkey, {dsum_sql('l_extendedprice')} AS value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM pv
    WHERE value > (
        SELECT CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
        FROM pv
      ) * 1.2
    ORDER BY value DESC, l_partkey
"""


def q_parts_supplier_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped (adapted: no partsupp/s_comment — supply
    relationships are observed through lineitem, and the excluded
    "complaint" suppliers are the negative-balance ones): distinct
    supplier count per (brand, type, size) for a target size list,
    minus excluded suppliers. The part filters (brand <>, type <>,
    size IN) prune the part scan BEFORE its join; the excluded-
    supplier set is a LEFT ANTI against a tiny broadcast frame (NOT IN
    without the NULL trap — s_suppkey is non-null by schema); the
    count-distinct shuffles (brand, type, size, suppkey) pairs only
    after the anti join has already dropped excluded rows."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


SQL_PARTS_SUPPLIER_REL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND NOT EXISTS (
        SELECT 1 FROM supplier
        WHERE s_suppkey = l_suppkey AND s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three OR'd brand/size/quantity
    channels. The implied superset predicate (brand IN the 3, size <=
    15) prunes the part scan before the join, the part side broadcasts,
    and the EXACT three-way disjunction rides INSIDE the join condition
    so each probe row is decided during the hash lookup — no
    materialize-then-filter pass over the joined width."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    channel = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return li.join(
        F.broadcast(part),
        (F.col("l_partkey") == F.col("p_partkey")) & channel,
    ).agg(
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_DISCOUNTED_REVENUE = f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


def q_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped (adapted: no partsupp availqty — a supplier
    qualifies by shipping MORE than 1.25x the average red-part volume
    in the target year): the nested IN-subquery chain decorrelated to
    filtered-broadcast-join -> keyed agg -> scalar-threshold ->
    dim join. The part prefix filter prunes to ~1/8 of the part table
    before its broadcast; per-supplier volume is one keyed aggregate
    whose shuffle is REUSED by the scalar-average branch
    (ReusedExchange — lineitem scanned once); the supplier dim join
    happens only for qualifying suppkeys."""
    part_red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    sq = (
        li.join(F.broadcast(part_red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("qty_shipped"))
    )
    avg_q = sq.agg(
        (
            F.sum(F.col("qty_shipped").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        sq.crossJoin(F.broadcast(avg_q))  # 1-row scalar broadcast
        .filter(F.col("qty_shipped") > F.col("avg_qty") * 1.25)
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name", "qty_shipped")
        .orderBy("s_suppkey")
    )


SQL_PROMO_SUPPLIERS = f"""
    WITH sq AS (
        SELECT l_suppkey, {dsum_sql('l_quantity')} AS qty_shipped
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, qty_shipped
    FROM sq JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty_shipped > (
        SELECT CAST(SUM(CAST(qty_shipped AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
        FROM sq
      ) * 1.25
    ORDER BY s_suppkey
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped (adapted: no l_commitdate/l_receiptdate —
    "late" is shipped >90 days after the order date): suppliers who
    were the SOLE late supplier on a finished multi-supplier order.
    The classic EXISTS / NOT EXISTS pair over self-joined lineitem is
    decorrelated to per-(order, supplier) then per-order aggregates —
    lineitem self-joins ZERO times: one orders join (status filter
    pushed to the scan), two keyed aggregations on the same orderkey
    prefix (the second rides the first's partitioning), and a
    broadcast supplier-dim join for the names. At 100 TB the state is
    per-order supplier counts, never a pairwise supplier x supplier
    blow-up."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).cast("int"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        per_supp.filter(F.col("late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


SQL_WAITING_SUPPLIERS = """
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                   THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
        FROM per_supp GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE per_supp.late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""
