"""Proof for SCALE.md's bucketing prescription: bucketing both fact
tables by the join key at write time makes the fact-fact join
co-located — ZERO exchanges on either join input — and bucket-keyed
aggregation reuses the layout the same way.

This is the 100 TB story for lineitem⋈orders: the bench plans show
one orderkey shuffle per fact join at read time; these tests show
that shuffle disappearing under `bucketBy`, which is exactly what a
production deployment does at write time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from hbase_increment_index_spark.catalog import load_table

    # spark.sql.warehouse.dir is static on the shared session; the
    # bucketed tables land in its default warehouse and are dropped on
    # teardown
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_fact_join_has_no_exchange(spark, bucketed):
    orders, li = bucketed
    # disable broadcast so the join strategy is the co-located
    # sort-merge the bucketed layout enables (at 100 TB neither fact
    # side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # sanity: the join actually ran and produced fact-fact output
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # restore the SESSION default (the suite runs AQE-off for
        # speed; hardcoding "true" leaked AQE-on to later tests)
        spark.conf.set("spark.sql.adaptive.enabled", _prev_aqe)


def test_unbucketed_fact_join_needs_exchanges(spark, sf_dir):
    from hbase_increment_index_spark.catalog import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        assert _plan(joined).count("Exchange") == 2  # the cost bucketing removes
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # restore the SESSION default (the suite runs AQE-off for
        # speed; hardcoding "true" leaked AQE-on to later tests)
        spark.conf.set("spark.sql.adaptive.enabled", _prev_aqe)


def test_bucketed_aggregation_reuses_layout(spark, bucketed):
    _, li = bucketed
    _prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        plan = _plan(agg)
        # grouping on the bucket key: no exchange before the aggregate
        assert "Exchange" not in plan, plan
        assert agg.count() > 0
    finally:
        # restore the SESSION default (the suite runs AQE-off for
        # speed; hardcoding "true" leaked AQE-on to later tests)
        spark.conf.set("spark.sql.adaptive.enabled", _prev_aqe)


def test_bucketed_join_results_match_unbucketed(spark, sf_dir, bucketed):
    from hbase_increment_index_spark.catalog import load_table

    orders_b, li_b = bucketed
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
