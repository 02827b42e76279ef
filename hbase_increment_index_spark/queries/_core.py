"""Flagship query and the OLAP reporting block."""
from __future__ import annotations
from hbase_increment_index_spark.numeric import exact_avg, exact_sum
from pyspark.sql import DataFrame, SparkSession, functions as F
from ._shared import _t



# --------------------------------------------------------------------------
# Flagship (entry): filter + facet + stats over events — S-scan + Q1 + Q10 +
# Q13 + Q7 in one query.
# --------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.filter(F.col("value") > 1.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 6).alias("sum_value"),
            exact_avg("value", 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_events").desc(), F.col("event_type").asc())
    )


FLAGSHIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE value > 1.0
GROUP BY event_type
ORDER BY n_events DESC, event_type ASC
"""


# --------------------------------------------------------------------------
# OLAP — star-schema joins + aggregation (the "real-time OLAP" claim,
# reference README.md:5-6)
# --------------------------------------------------------------------------

def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_increment_index_spark.functions.layout import fan_out

    li = _t(spark, sf_dir, "lineitem")
    return (
        fan_out(li)  # decimal partial agg is the map-side cost
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
            ).cast("double").alias("sum_disc_price"),
            F.round(exact_avg("l_quantity", 2), 6).alias("avg_qty"),
            F.round(exact_avg("l_discount", 2), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


OLAP_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def olap_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem ⋈ orders, dims broadcast. At 100 TB the
    fact-fact join shuffles on orderkey (or is bucket-co-located); the
    dimension chain never shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    from hbase_increment_index_spark.functions.layout import fan_out

    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    li = fan_out(li)  # orders/dims broadcast: join+agg run in the scan tasks
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name")
    )


OLAP_REVENUE_SQL = """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def olap_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = (
        orders.groupBy("o_custkey")
        .agg(exact_sum("o_totalprice", 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


OLAP_TOP_CUST_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


def olap_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi-join: orders that have at least one high-
    quantity line item (left_semi keeps the big side unduplicated —
    no fan-out, one shuffle on the join key)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hot = li.filter(F.col("l_quantity") >= 45.0).select("l_orderkey")
    return (
        orders.join(hot, orders.o_orderkey == hot.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


OLAP_SEMI_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45.0
)
GROUP BY o_orderpriority
"""


def olap_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-EXISTS anti-join: customers with no URGENT orders (the same
    plan shape as CDC delete application — SolrIndexTools.java:63,129)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.join(urgent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


OLAP_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def olap_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand: fact ⋈ broadcast part dim."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
            ).cast("double").alias("revenue"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


OLAP_BRAND_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       count(DISTINCT p_partkey) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def olap_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier with nation name (two broadcast dims)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


OLAP_SUPPLIER_SQL = """
SELECT s_suppkey, s_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY s_suppkey, s_name, n_name
"""


# --------------------------------------------------------------------------
# OLAP: three more TPC-H-pattern star queries (README.md:6 "conventional
# aggregate statistics" over the indexed wide table)
# --------------------------------------------------------------------------


def olap_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by line status × order-priority
    class for a ship-date year — the fact-fact join (lineitem⋈orders
    on the order key) with conditional counts. At 100 TB both facts
    bucket on the order key so this join is co-located."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


OLAP_PRIORITY_SQL = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def olap_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items in an order-date year. Fact-fact shuffle on the order key;
    customer⋈nation dims broadcast; top-k via per-partition heaps."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dims = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


OLAP_RETURNED_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def olap_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the revenue share attributable
    to ASIA-nation customers. Numerator and denominator are exact
    decimal sums in ONE aggregation pass (conditional agg, not two
    scans); the single double division happens at the end."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    asia_vol = F.when(F.col("r_name") == "ASIA", vol).otherwise(F.lit(0).cast("decimal(30,6)"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(asia_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("asia_share")
        )
        .orderBy("o_year")
    )


OLAP_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN r_name = 'ASIA'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                       ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE),
         6) AS asia_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def olap_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the correlated scalar subquery (``l_quantity <
    0.2 * (SELECT avg(l_quantity) ... same part)``), decorrelated the
    way Catalyst plans it: a per-part avg aggregate joined back to the
    probe on the part key. Both the aggregate and the probe shuffle on
    l_partkey — at 100 TB one bucketed layout serves both sides and the
    join is co-located. The brand filter broadcasts part keys so the
    probe scan prunes before the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avg_q = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    brand_keys = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        li.join(F.broadcast(brand_keys), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


OLAP_SMALL_QTY_SQL = """
WITH a AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN a USING (l_partkey)
WHERE p_brand = 'Brand#12' AND l_quantity < 0.2 * avg_qty
"""


def olap_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — ``HAVING SUM(l_quantity) > N`` as an IN
    subquery over a grouped fact: the qualifying order keys come from
    one hash agg on the fact table, then orders/customer attach. The
    agg and the orders join share the order-key shuffle; the qualifying
    keyset is tiny (heavy-tailed orders) so AQE broadcasts it."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("sum_qty")
        )
        .filter(F.col("sum_qty") > 250.0)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
    )


OLAP_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) > 250.0
)
SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def olap_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery (corpus-wide positive-balance
    average) + NOT EXISTS anti join: per market segment, the count and
    total balance of above-average customers with no URGENT order. The
    1-row average broadcasts via cross join (never collected to the
    driver); the anti join's probe side is keys-only."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double"), 2
            ).alias("total_bal"),
        )
    )


OLAP_IDLE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_cust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE), 2) AS total_bal
FROM customer c
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    broadcast into orders, fact-fact join on orderkey, revenue top-10.
    The date filters push into both fact scans; the only wide exchange
    is the orderkey join + the (orderkey, date, priority) agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    cutoff = "1997-06-01"
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(keys), orders.o_custkey == keys.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


OLAP_SHIP_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1997-06-01'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def olap_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter +
    single-row aggregate — every predicate pushes into the parquet
    scan, zero joins, zero wide exchanges beyond the 1-row final."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


OLAP_FORECAST_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def olap_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade revenue
    between two nations (NATION_3 / NATION_8 — both sides of the pair hold suppliers at every sf) by ship year. Both nation lookups broadcast
    into the fact scan; the only wide exchange is the
    lineitem ⋈ orders orderkey join + the 3-key agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    pair = nation.filter(F.col("n_name").isin("NATION_3", "NATION_8"))
    supp_n = supp.join(
        F.broadcast(pair), supp.s_nationkey == pair.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(pair), cust.c_nationkey == pair.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


OLAP_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         date_part('year', l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name IN ('NATION_3', 'NATION_8')
    AND nc.n_name IN ('NATION_3', 'NATION_8')
    AND ns.n_name <> nc.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def olap_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    PROMO-part revenue sold into AFRICA, by order year. Every
    dimension (part filter, customer-region, supplier-nation) is a
    broadcast; the share is a conditional aggregate over one
    fact-fact join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    parts = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    africa_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "AFRICA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    cust_keys = cust.join(
        F.broadcast(africa_nations), cust.c_nationkey == africa_nations.n_nationkey
    ).select("c_custkey")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust_keys), orders.o_custkey == cust_keys.c_custkey, "left_semi")
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(30,6)"))).alias("_nat"),
            F.sum(vol).alias("_all"),
        )
        .select(
            "o_year",
            F.round(F.col("_nat").cast("double") / F.col("_all").cast("double"), 6).alias(
                "mkt_share"
            ),
            F.col("_all").cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


OLAP_MKT_SHARE_SQL = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_revenue
FROM (
  SELECT date_part('year', o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region ON nc.n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA')
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


def olap_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of revenue from
    PROMO-type parts within a ship-date month band. Part dimension
    broadcasts into the filtered fact scan; one conditional decimal
    agg, 1-row result."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(30,6)"))).alias("_promo"),
            F.sum(vol).alias("_all"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("_promo").cast("double") / F.col("_all").cast("double"), 6
            ).alias("promo_revenue_pct"),
            F.col("_all").cast("double").alias("total_revenue"),
        )
    )


OLAP_PROMO_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                 ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE),
             6) AS promo_revenue_pct,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-03-01'
"""


def olap_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    an OR of three (brand × size-band × quantity-band) conjunctions
    spanning two tables. Catalyst pushes the single-table residues of
    the DNF into both scans (part: brand ∈ {...} ∧ size bounds;
    lineitem: quantity bounds) and evaluates the cross-table OR after
    the broadcast join — the standard Q19 plan a warehouse wants."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == part.p_partkey,
    )
    q = F.col("l_quantity")
    clause1 = (F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 15)) & q.between(1, 20)
    clause2 = (F.col("p_brand") == "Brand#20") & (F.col("p_size").between(1, 25)) & q.between(5, 30)
    clause3 = (F.col("p_brand") == "Brand#9") & (F.col("p_size").between(10, 50)) & q.between(10, 40)
    return j.filter(clause1 | clause2 | clause3).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


OLAP_DISJUNCTIVE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 30)
   OR (p_brand = 'Brand#9'  AND p_size BETWEEN 10 AND 50 AND l_quantity BETWEEN 10 AND 40)
"""


def olap_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): lineitems
    late (shipdate > orderdate + 30 days) on multi-supplier orders
    where THIS supplier is late and SOME OTHER supplier on the same
    order is not — the classic EXISTS / NOT EXISTS pair, decorrelated
    to per-order aggregates: one groupBy(orderkey) computes total and
    late supplier counts, and the exists-pair becomes two predicates
    on those counts joined back to the late lines. One orderkey
    shuffle; supplier/nation dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")

    lo = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        li.l_orderkey == orders.o_orderkey,
    ).withColumn(
        "_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ).cast("int"),
    )
    per_order = lo.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_lines = (
        lo.filter((F.col("_late") == 1) & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey", "l_suppkey")
        .distinct()
    )
    qualifying = late_lines.join(
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
        "o_orderkey",
    )
    return (
        qualifying.join(F.broadcast(supp), qualifying.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


OLAP_WAITING_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, o_orderstatus,
         CAST(l_shipdate > o_orderdate + INTERVAL 30 DAY AS INT) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY 1
),
late_lines AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lo
  WHERE late = 1 AND o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM late_lines
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


def olap_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter
    with at least one late line (l_shipdate > o_orderdate + 60 days —
    the fixtures carry no commit/receipt dates), counted per priority.
    The EXISTS decorrelates to a left-semi join on orderkey; the date
    band is pushed into both scans."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    band = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    late = li.join(
        band.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        band.join(late.select("o_orderkey").distinct(), "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy(F.col("o_orderpriority").asc())
    )


OLAP_PRIORITY_CHECK_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority ASC
"""


def olap_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers
    placed k orders, INCLUDING the zero-order bucket — the left outer
    join keeps order-less customers, the double aggregation is two
    hash aggs whose second input is already tiny (one row per
    customer)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


OLAP_CUSTDIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def olap_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue in a
    quarter; return the supplier(s) achieving the max. The scalar
    max rides a 1-row broadcast join against the revenue frame — the
    view is computed once (Catalyst reuses the exchange), never
    re-scanned per comparison."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                exact_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6), 2
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        sup.join(
            revenue.join(F.broadcast(mx), revenue.total_revenue == F.col("_mx")),
            sup.s_suppkey == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("s_suppkey").asc())
    )


OLAP_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey ASC
"""
