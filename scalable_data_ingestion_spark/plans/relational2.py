"""Relational surface II: correlated subqueries (Catalyst
decorrelation), outer joins, conditional-ratio and distribution
queries (TPC-H Q7/Q13/Q14/Q18/Q22 shapes adapted to the test schema).

Correlated-subquery queries go through ``spark.sql`` over the
registered views — the SQL frontend and DataFrame API converge to the
same Catalyst plans, and scalar-subquery correlation is SQL-native.
Decorrelation turns each correlated subquery into an aggregate + join,
so nothing here executes per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views, table
from ..registry import register


# --------------------------------------------------------------------------
# correlated scalar subquery: customers above their nation's average.
# --------------------------------------------------------------------------
@register(
    "corr_above_nation_avg",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer c1
    WHERE c_acctbal > (
      SELECT avg(c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c1.c_nationkey
    )
    """,
)
def corr_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
        FROM customer c1
        WHERE c_acctbal > (
          SELECT avg(c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c1.c_nationkey
        )
        """
    )


# --------------------------------------------------------------------------
# Q7 shape: trade volume between nation pairs by year (6-way join).
# --------------------------------------------------------------------------
@register(
    "q07_nation_trade",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q07_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: order-count distribution over customers (LEFT OUTER join).
# --------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional aggregate ratio).
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 6).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q18 shape: large orders via IN over a grouped HAVING subquery.
# --------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 120
    )
    GROUP BY c_custkey, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 120
        )
        GROUP BY c_custkey, o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Q22 shape: above-average-balance customers with no recent orders
# (uncorrelated scalar subquery + NOT EXISTS anti join).
# --------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01'
          )
        GROUP BY c_nationkey
        """
    )


# --------------------------------------------------------------------------
# FULL OUTER join: daily order activity vs shipment activity.
# --------------------------------------------------------------------------
@register(
    "fo_daily_order_vs_ship",
    oracle="""
    WITH od AS (
      SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    sd AS (
      SELECT date_trunc('day', l_shipdate) AS d, count(*) AS n_ships
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(od.d, sd.d) AS d,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_ships, 0) AS n_ships
    FROM od FULL OUTER JOIN sd ON od.d = sd.d
    """,
)
def fo_daily_order_vs_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("DAY", "o_orderdate").alias("od"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    sd = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("DAY", "l_shipdate").alias("sd"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    return od.join(sd, od.od == sd.sd, "full_outer").select(
        F.coalesce("od", "sd").alias("d"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
    )
