"""Bucketed co-located join: the 100 TB lever for repeated fact-fact
joins — both sides bucketed by the join key at write time join WITHOUT
any Exchange (SURVEY.md §4). Proven here on the plan, not claimed."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from lenses_topology_example_spark.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/warehouse'"
    )
    # disable broadcast so the fact-fact SMJ path (what bucketing is FOR
    # at scale, where neither side fits in memory) is the one planned
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bucketdb.orders_b")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bucketdb.lineitem_b")
        )
        joined = spark.table("bucketdb.lineitem_b").join(
            spark.table("bucketdb.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the right thing
        n = joined.count()
        expected = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert n == expected
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
        for key, val in [
            ("spark.sql.autoBroadcastJoinThreshold", prev),
            ("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe),
        ]:
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
