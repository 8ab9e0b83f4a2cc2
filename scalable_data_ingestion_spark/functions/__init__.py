"""Scalar expression library (SURVEY.md §2.8 F1-F22).

Every "UDF" in the reference is a pure function of scalar inputs
(SURVEY.md §2.10) — re-expressed here as Spark Column expressions so
the whole enrichment pipeline stays inside whole-stage codegen with no
Python boundary.
"""

from .expressions import (  # noqa: F401
    clean_email,
    clean_name,
    customer_segment,
    customer_type,
    customer_value_tier,
    days_since_order,
    estimated_profit_margin,
    product_brand,
    product_category,
    product_price_tier,
    revenue_tier,
    risk_level,
    risk_score,
    safe_divide,
    season,
    valid_date_expr,
    valid_email_expr,
    valid_order_id_expr,
)
