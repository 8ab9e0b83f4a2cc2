"""Oracle-checked queries for the parity pipeline stages (clean/enrich).

The SQL twins are *generated from the same constant tables* as the
Spark expressions (brand/category keyword dicts, cut bins) so the two
sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expressions import _BRANDS, _CATEGORIES, _BUSINESS_DOMAINS
from ..registry import register
from .cleaning import clean
from .enrichment import enrich
from .orders_base import BASE_ORDERS_CTE, MESSY_ORDERS_CTE, base_orders, messy_orders

# ---------------------------------------------------------------- SQL gen


def _kw_sql(col: str, chain: tuple, fallback: str) -> str:
    parts = [f"WHEN {col} IS NULL THEN 'Unknown'"]
    for label, kws in chain:
        cond = " OR ".join(f"lower({col}) LIKE '%{kw}%'" for kw in kws)
        parts.append(f"WHEN {cond} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{fallback}' END"


def _cut_sql(col: str, bins: list, labels: list[str]) -> str:
    sql = f"CASE WHEN {col} IS NULL OR {col} <= {bins[0]} THEN NULL"
    for i, label in enumerate(labels[:-1]):
        sql += f" WHEN {col} <= {bins[i + 1]} THEN '{label}'"
    return sql + f" ELSE '{labels[-1]}' END"


_SEGMENT_SQL = (
    "CASE WHEN total_amount >= 1000 THEN 'VIP' WHEN total_amount >= 500 THEN 'Premium' "
    "WHEN total_amount >= 100 THEN 'Standard' ELSE 'Budget' END"
)
_DOMAIN_SQL = "lower(substr(customer_email, strpos(customer_email, '@') + 1))"
_CTYPE_SQL = (
    "CASE WHEN customer_email IS NULL THEN 'Unknown' WHEN "
    + " OR ".join(f"{_DOMAIN_SQL} LIKE '%{d}%'" for d in _BUSINESS_DOMAINS)
    + " THEN 'Business' ELSE 'Individual' END"
)
_MARGIN_SQL = (
    "CAST(CASE WHEN price < 100 THEN 0.15 WHEN price < 500 THEN 0.20 "
    "WHEN price < 1000 THEN 0.25 ELSE 0.30 END AS DOUBLE)"
)
_SEASON_SQL = (
    "CASE WHEN month(order_date) IN (12, 1, 2) THEN 'Winter' "
    "WHEN month(order_date) IN (3, 4, 5) THEN 'Spring' "
    "WHEN month(order_date) IN (6, 7, 8) THEN 'Summer' ELSE 'Fall' END"
)
_RISK_SQL = (
    "least(100, (CASE WHEN total_amount > 1000 THEN 30 ELSE 0 END) + "
    "(CASE WHEN customer_name LIKE '%Unknown%' THEN 20 ELSE 0 END) + "
    "(CASE WHEN dayname(order_date) IN ('Saturday', 'Sunday') THEN 10 ELSE 0 END))"
)


# ---------------------------------------------------------------- queries


@register(
    "orders_base_projection",
    oracle=f"WITH {BASE_ORDERS_CTE} SELECT * FROM base",
)
def orders_base_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1-shaped projection itself (S2 analog: reshaping source rows
    into order records, src/ingestion.py:110-168)."""
    return base_orders(spark, sf_dir)


@register(
    "enriched_orders",
    oracle=f"""
    WITH {BASE_ORDERS_CTE}
    SELECT order_id,
           {_SEGMENT_SQL} AS customer_segment,
           {_cut_sql('total_amount', [0, 50, 200, 500, 1000], ['Low', 'Medium', 'High', 'Premium', 'VIP'])} AS customer_value_tier,
           {_CTYPE_SQL} AS customer_type,
           {_kw_sql('product', _BRANDS, 'Other')} AS product_brand,
           {_kw_sql('product', _CATEGORIES, 'Electronics')} AS product_category_detailed,
           {_cut_sql('price', [0, 100, 500, 1000, 2000], ['Budget', 'Mid-Range', 'Premium', 'Luxury', 'Ultra-Premium'])} AS product_price_tier,
           {_MARGIN_SQL} AS estimated_profit_margin,
           floor(total_amount * {_MARGIN_SQL} * 100 + 0.5) / 100 AS estimated_profit,
           {_cut_sql('total_amount', [0, 100, 300, 600, 1000], ['Low', 'Medium', 'High', 'Premium', 'Enterprise'])} AS revenue_tier,
           CAST(year(order_date) AS INTEGER)    AS order_year,
           CAST(month(order_date) AS INTEGER)   AS order_month,
           CAST(day(order_date) AS INTEGER)     AS order_day,
           dayname(order_date)                  AS order_weekday,
           CAST(quarter(order_date) AS INTEGER) AS order_quarter,
           {_SEASON_SQL} AS season,
           {_RISK_SQL} AS risk_score,
           CASE WHEN {_RISK_SQL} >= 50 THEN 'High' WHEN {_RISK_SQL} >= 25 THEN 'Medium' ELSE 'Low' END AS risk_level
    FROM base
    """,
)
def enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full enrichment stage output (keyed subset; days_since_order
    excluded from the oracle comparison because it references 'now')."""
    df = enrich(base_orders(spark, sf_dir), with_days_since=False)
    return df.select(
        "order_id",
        "customer_segment",
        "customer_value_tier",
        "customer_type",
        "product_brand",
        "product_category_detailed",
        "product_price_tier",
        "estimated_profit_margin",
        "estimated_profit",
        "revenue_tier",
        "order_year",
        "order_month",
        "order_day",
        "order_weekday",
        "order_quarter",
        "season",
        "risk_score",
        "risk_level",
    )


@register(
    "cleaned_messy_orders",
    oracle=f"""
    WITH {BASE_ORDERS_CTE}, {MESSY_ORDERS_CTE},
    dedup AS (SELECT DISTINCT * FROM messy)
    SELECT order_id,
           coalesce(
             upper(substr(trim(customer_name), 1, 1)) || substr(trim(customer_name), 2),
             'Unknown Customer') AS customer_name,
           lower(trim(customer_email)) AS customer_email,
           product,
           coalesce(quantity, 1) AS quantity,
           price, discount, total_amount, order_date,
           lower(trim(source)) AS source
    FROM dedup
    WHERE order_id IS NOT NULL AND product IS NOT NULL AND price IS NOT NULL
      AND price > 0 AND coalesce(quantity, 1) > 0
    """,
)
def cleaned_messy_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning stage over the corrupted variant: exact dedup, text
    normalization, null-fill, critical-field drop, positivity filters.

    The SQL twin's initcap is upper-first-char (names here are single
    tokens); deterministic because messy duplicates are exact rows, so
    key-dedup after DISTINCT is a no-op.
    """
    return clean(messy_orders(spark, sf_dir))


@register(
    "segment_brand_distribution",
    oracle=f"""
    WITH {BASE_ORDERS_CTE}
    SELECT {_SEGMENT_SQL} AS customer_segment,
           {_kw_sql('product', _BRANDS, 'Other')} AS product_brand,
           count(*) AS n_orders,
           round(sum(total_amount), 2) AS revenue
    FROM base
    GROUP BY 1, 2
    """,
)
def segment_brand_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregated view over two derived dimensions (the reference's BI
    frequency tables, src/storage.py:516-522)."""
    df = enrich(base_orders(spark, sf_dir), with_days_since=False)
    return df.groupBy("customer_segment", "product_brand").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("total_amount"), 2).alias("revenue"),
    )
