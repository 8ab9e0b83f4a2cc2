"""A1-shaped orders projection from the TPC-H star schema.

FIXTURES.md §B: reference-parity operators should be exercised by
projecting an A1-shaped orders table out of ``orders``/``customer`` so
pipeline-stage checks stay oracle-comparable. All derivations are
deterministic functions of ``o_orderkey``/``o_custkey`` so Spark and
DuckDB agree bit-for-bit.

The shape mirrors the reference's order record (src/ingestion.py:131-149):
order_id, customer_name, customer_email, product, quantity, price,
discount, total_amount, order_date, source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table, widen_if_narrow

PRODUCTS = (
    "iPhone 15",
    "MacBook Pro",
    "AirPods Pro",
    "Samsung Galaxy S24",
    "Nintendo Switch",
    "Sony Headphones",
    "iPad Air",
    "Kindle Paperwhite",
)

DOMAINS = ("example.com", "company.com", "gmail.com", "corp.com")

SOURCES = ("api_rest", "file_csv", "file_json")


def base_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A1-shaped orders built from orders x customer."""
    # The derivation below is expression-heavy (format_string, initcap,
    # regexp_replace, long CASE chains) and fuses into the scan stage —
    # widen the single-row-group local scan so it uses every core.
    o = widen_if_narrow(table(spark, sf_dir, "orders"))
    c = table(spark, sf_dir, "customer")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)

    qty = (F.col("o_orderkey") % 5 + 1).cast("bigint")
    # floor-based cents: bit-identical across engines (round() diverges at
    # .005 boundaries — Spark rounds the decimal repr, DuckDB the raw double)
    price = F.floor(F.col("o_totalprice") * 100 / qty) / 100
    discount = (F.col("o_orderkey") % 4).cast("double") * 2.5

    product = F.when(F.lit(False), "")
    for i, p in enumerate(PRODUCTS):
        product = product.when(F.col("o_orderkey") % len(PRODUCTS) == i, p)
    product = product.otherwise(PRODUCTS[0])

    domain = F.when(F.lit(False), "")
    for i, d in enumerate(DOMAINS):
        domain = domain.when(F.col("o_custkey") % len(DOMAINS) == i, d)
    domain = domain.otherwise(DOMAINS[0])

    source = F.when(F.lit(False), "")
    for i, s in enumerate(SOURCES):
        source = source.when(F.col("o_orderkey") % len(SOURCES) == i, s)
    source = source.otherwise(SOURCES[0])

    return df.select(
        F.format_string("API-%04d", F.col("o_orderkey")).alias("order_id"),
        F.initcap(F.lower(F.col("c_name"))).alias("customer_name"),
        F.concat(
            F.regexp_replace(F.lower(F.col("c_name")), "#", ""), F.lit("@"), domain
        ).alias("customer_email"),
        product.alias("product"),
        qty.alias("quantity"),
        price.alias("price"),
        discount.alias("discount"),
        F.round(price * qty - discount, 2).alias("total_amount"),
        # Keep the parquet timestamp type: DuckDB's fetchdf renders DATE as
        # midnight datetime64 anyway, so a date-typed Spark result would
        # value-mismatch under strict comparison harnesses.
        F.col("o_orderdate").alias("order_date"),
        source.alias("source"),
    )


def messy_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base_orders with deterministic corruptions keyed on the numeric
    order id — the oracle-comparable analog of the reference's
    `orders_imperfect` fixture (FIXTURES.md §A3): invalid emails,
    negative prices, NULL quantities/names, lowercased ids, plus exact
    duplicate rows. Feeds the quality engine + cleaning-stage queries.
    """
    base = base_orders(spark, sf_dir)
    k = F.substring(F.col("order_id"), 5, 16).cast("bigint")
    messy = base.select(
        F.when(k % 23 == 0, F.lower(F.col("order_id"))).otherwise(F.col("order_id")).alias(
            "order_id"
        ),
        F.when(k % 19 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("customer_name"))
        .alias("customer_name"),
        F.when(k % 10 == 0, "invalid-email").otherwise(F.col("customer_email")).alias(
            "customer_email"
        ),
        F.col("product"),
        F.when(k % 17 == 0, F.lit(None).cast("bigint")).otherwise(F.col("quantity")).alias(
            "quantity"
        ),
        F.when(k % 13 == 0, -F.col("price")).otherwise(F.col("price")).alias("price"),
        F.col("discount"),
        F.col("total_amount"),
        F.col("order_date"),
        F.col("source"),
    )
    # Duplicate every 50th row via explode instead of self-union: a
    # union of two branches over the same base would recompute the whole
    # scan+join+derivation subtree twice (Spark has no automatic common
    # subtree reuse outside AQE exchange reuse); the explode emits the
    # extra copy in the same single pass.
    copies = F.when(k % 50 == 0, F.array(F.lit(1), F.lit(2))).otherwise(F.array(F.lit(1)))
    return (
        messy.withColumn("_copy", F.explode(copies))
        .drop("_copy")
    )


# SQL twin of messy_orders(), layered over BASE_ORDERS_CTE.
MESSY_ORDERS_CTE = """
messy0 AS (
  SELECT CASE WHEN k % 23 = 0 THEN lower(order_id) ELSE order_id END AS order_id,
         CASE WHEN k % 19 = 0 THEN NULL ELSE customer_name END AS customer_name,
         CASE WHEN k % 10 = 0 THEN 'invalid-email' ELSE customer_email END AS customer_email,
         product,
         CASE WHEN k % 17 = 0 THEN NULL ELSE quantity END AS quantity,
         CASE WHEN k % 13 = 0 THEN -price ELSE price END AS price,
         discount, total_amount, order_date, source,
         k
  FROM (SELECT base.*, CAST(substr(order_id, 5, 16) AS BIGINT) AS k FROM base)
),
messy AS (
  SELECT order_id, customer_name, customer_email, product, quantity,
         price, discount, total_amount, order_date, source
  FROM messy0
  UNION ALL
  SELECT order_id, customer_name, customer_email, product, quantity,
         price, discount, total_amount, order_date, source
  FROM messy0 WHERE k % 50 = 0
)
"""


def _case(expr: str, n: int, values: tuple[str, ...]) -> str:
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE {expr} % {n} {whens} ELSE '{values[0]}' END"


# SQL twin of base_orders(), as a WITH-clause body for oracle queries.
BASE_ORDERS_CTE = f"""
base AS (
  SELECT printf('API-%04d', o_orderkey) AS order_id,
         upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2) AS customer_name,
         replace(lower(c_name), '#', '') || '@' || {_case('o_custkey', len(DOMAINS), DOMAINS)} AS customer_email,
         {_case('o_orderkey', len(PRODUCTS), PRODUCTS)} AS product,
         CAST(o_orderkey % 5 + 1 AS BIGINT) AS quantity,
         floor(o_totalprice * 100 / (o_orderkey % 5 + 1)) / 100 AS price,
         CAST(o_orderkey % 4 AS DOUBLE) * 2.5 AS discount,
         round(floor(o_totalprice * 100 / (o_orderkey % 5 + 1)) / 100 * (o_orderkey % 5 + 1)
               - CAST(o_orderkey % 4 AS DOUBLE) * 2.5, 2) AS total_amount,
         o_orderdate AS order_date,
         {_case('o_orderkey', len(SOURCES), SOURCES)} AS source
  FROM orders JOIN customer ON o_custkey = c_custkey
)
"""
