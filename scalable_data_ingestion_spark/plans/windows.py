"""Window-function queries.

The reference has no window functions (SURVEY.md §2.5); its closest
construct is a global sequence number (src/transformation.py:323-325).
This module supplies the engine's analytic-window surface: ranking,
running totals, frames, lag/lead, ntile.

Scale notes: every window here partitions by a key (custkey) — never an
unpartitioned global window, which would funnel 100 TB through one
task. Rank/row_number orderings always include a unique key so results
are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --------------------------------------------------------------------------
# running revenue per customer (frame: unbounded preceding .. current).
# --------------------------------------------------------------------------
@register(
    "w_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def w_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# latest-N per group via row_number (dedup-keep-first pattern, U3 analog:
# the reference's keep-first dedup src/ingestion.py:415-417 generalizes to
# row_number over an explicit order + filter rn=1).
# --------------------------------------------------------------------------
@register(
    "w_latest_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def w_latest_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# moving average over a bounded row frame.
# --------------------------------------------------------------------------
@register(
    "w_moving_avg_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM orders
    """,
)
def w_moving_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg"),
    )


# --------------------------------------------------------------------------
# lag/lead: order-over-order delta per customer.
# --------------------------------------------------------------------------
@register(
    "w_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
           round(o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS spend_delta
    FROM orders
    """,
)
def w_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev_date).cast("bigint").alias("days_since_prev"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("spend_delta"),
    )


# --------------------------------------------------------------------------
# rank + dense_rank on aggregated revenue per nation.
# --------------------------------------------------------------------------
@register(
    "w_nation_revenue_rank",
    oracle="""
    WITH nat_rev AS (
      SELECT n_name, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue,
           CAST(rank()       OVER (ORDER BY revenue DESC, n_name) AS INTEGER) AS rev_rank,
           CAST(dense_rank() OVER (ORDER BY revenue DESC, n_name) AS INTEGER) AS rev_dense_rank
    FROM nat_rev
    """,
)
def w_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    nat_rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    # 25 nations max — single-partition window over an aggregate is fine.
    w = W.orderBy(F.col("revenue").desc(), F.col("n_name"))
    return nat_rev.select(
        "n_name",
        "revenue",
        F.rank().over(w).alias("rev_rank"),
        F.dense_rank().over(w).alias("rev_dense_rank"),
    )


# --------------------------------------------------------------------------
# ntile: quartiles of customers by account balance within segment.
# --------------------------------------------------------------------------
@register(
    "w_acctbal_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS c_acctbal,
           CAST(ntile(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile
    FROM customer
    """,
)
def w_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("balance_quartile"),
    )


# --------------------------------------------------------------------------
# global sequence number (the reference's record_id = range(1, n+1),
# src/transformation.py:323-325) — row_number over an explicit total
# order; documented replacement for monotonically_increasing_id.
# --------------------------------------------------------------------------
@register(
    "w_global_record_id",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS record_id,
           o_orderkey
    FROM orders
    """,
)
def w_global_record_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity op: the reference's global sequence number, computed the
    scalable way — ``global_rank``'s zipWithIndex-style per-partition
    offsets (range shuffle + partitions-sized count collect +
    partition-local row_number), never one single-task sort
    (SURVEY.md §2.5, VERDICT r3 #3)."""
    from ..functions.ranking import global_rank

    orders = table(spark, sf_dir, "orders")
    return global_rank(
        orders.select("o_orderkey"), [F.col("o_orderkey")], "record_id"
    ).select(F.col("record_id").cast("bigint").alias("record_id"), "o_orderkey")


# --------------------------------------------------------------------------
# first/last value over a full-partition frame: each customer's first and
# most recent order value side by side.
# --------------------------------------------------------------------------
@register(
    "w_first_last_order_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_order_value,
           round(last_value(o_totalprice) OVER w, 2)  AS last_order_value
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def w_first_last_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_order_value"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_order_value"),
    ).distinct()


# --------------------------------------------------------------------------
# distribution analytics: percent_rank + cume_dist of order values.
# --------------------------------------------------------------------------
@register(
    "w_order_value_distribution",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           round(cume_dist()    OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cume
    FROM orders
    """,
)
def w_order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distribution ranks. The order key (o_totalprice,
    o_orderkey) is a TOTAL order (orderkey unique), so
    percent_rank == (rn-1)/(n-1) and cume_dist == rn/n with rn from the
    range-partitioned ``global_rank`` and n folded in as a literal —
    no single-partition sort window."""
    from ..functions.ranking import global_rank

    orders = table(spark, sf_dir, "orders")
    ranked = global_rank(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
        "_rn",
    )
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    rn = F.col("_rn").cast("double")
    return ranked.crossJoin(F.broadcast(n)).select(
        "o_orderkey",
        F.round((rn - 1) / (F.col("_n") - 1), 6).alias("pct_rank"),
        F.round(rn / F.col("_n"), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# RANGE frame (value-based, not row-based): per-customer trailing-30-day
# spend at each order. The frame is keyed on epoch seconds so peers with
# equal timestamps are included symmetrically in both engines; the sum
# uses floor-cent arithmetic (exact integer-valued summands).
# --------------------------------------------------------------------------
@register(
    "w_trailing_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           sum(floor(o_totalprice * 100 + 0.5))
             OVER (PARTITION BY o_custkey
                   ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) / 100
             AS spend_30d,
           CAST(count(*) OVER (PARTITION BY o_custkey
                               ORDER BY epoch(o_orderdate)
                               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_orders_30d
    FROM orders
    """,
)
def w_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w) / 100).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


# --------------------------------------------------------------------------
# lead + nth_value: forward-looking analytics with an explicit full
# frame (default frames differ subtly across engines; pin it).
# --------------------------------------------------------------------------
@register(
    "w_next_order_preview",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           round(nth_value(o_totalprice, 3) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS third_order_value
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_next_order_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    order_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full_frame = order_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_orderkey").over(order_w).alias("next_orderkey"),
        F.round(F.nth_value("o_totalprice", 3).over(full_frame), 2).alias(
            "third_order_value"
        ),
    )
