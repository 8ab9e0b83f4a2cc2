"""Set operations and semi/anti joins.

Reference surface: union-with-missing-columns (U1, src/ingestion.py:256,
329,412 via pd.concat), distinct (U2, src/transformation.py:54-62), key
dedup (U3, src/ingestion.py:415-417). Intersect/except are absent from
the reference (SURVEY.md §2.7) but free Spark built-ins; semi/anti joins
round out the EXISTS/NOT EXISTS surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --------------------------------------------------------------------------
# UNION (distinct) of two projections with aligned columns (U1 analog).
# --------------------------------------------------------------------------
@register(
    "u_active_party_nations",
    oracle="""
    SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION
    SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def u_active_party_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    cust_nations = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
    )
    supp_nations = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
    )
    return cust_nations.union(supp_nations).distinct()


# --------------------------------------------------------------------------
# INTERSECT: customers ordering in both 1995 and 1996.
# --------------------------------------------------------------------------
@register(
    "i_repeat_customers_95_96",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def i_repeat_customers_95_96(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def year_custs(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year_custs(1995).intersect(year_custs(1996))


# --------------------------------------------------------------------------
# EXCEPT: customers with orders but none finalized ('F').
# --------------------------------------------------------------------------
@register(
    "e_customers_no_finalized",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def e_customers_no_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity).
    return orders.select("o_custkey").subtract(
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


# --------------------------------------------------------------------------
# left-semi join: customers that have at least one order (EXISTS).
# --------------------------------------------------------------------------
@register(
    "sj_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def sj_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# left-anti join: parts with no shipments in 2001 (NOT EXISTS).
# --------------------------------------------------------------------------
@register(
    "aj_parts_not_shipped_2001",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01'
    )
    """,
)
def aj_parts_not_shipped_2001(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("l_partkey")
    )
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# --------------------------------------------------------------------------
# distinct over composite key (U2 analog).
# --------------------------------------------------------------------------
@register(
    "d_status_priority_pairs",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def d_status_priority_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# unionByName with missing columns (U1's pandas-concat NaN-fill semantics:
# src/ingestion.py:356-444): supplier + customer directory with
# side-specific columns null-filled.
# --------------------------------------------------------------------------
@register(
    "u_party_directory",
    oracle="""
    SELECT 'customer' AS party_type, c_custkey AS party_key, c_name AS party_name,
           round(c_acctbal, 2) AS acctbal, c_mktsegment AS mktsegment
    FROM customer
    UNION ALL
    SELECT 'supplier' AS party_type, s_suppkey AS party_key, s_name AS party_name,
           round(s_acctbal, 2) AS acctbal, NULL AS mktsegment
    FROM supplier
    """,
)
def u_party_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party_type"),
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party_type"),
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    # unionByName(allowMissingColumns=True) NULL-fills `mktsegment`,
    # mirroring pandas concat's NaN-fill for missing columns.
    return cust.unionByName(supp, allowMissingColumns=True)
