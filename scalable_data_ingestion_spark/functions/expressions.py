"""Column-expression implementations of the reference's scalar functions.

Reference semantics (cited per function) come from
`/root/reference/src/transformation.py` and `src/validation.py`; all are
re-expressed as Catalyst expressions (no Python UDFs — SURVEY.md §2.10).

Documented divergences (SURVEY.md §7 "semantics to watch"):
- `initcap` splits words on whitespace only, while pandas
  ``str.title()`` capitalizes after any non-alphanumeric
  ("o'brien" -> "O'Brien" in pandas, "O'brien" in Spark). Accepted.
- pd.cut bins are right-closed/left-open with NULL outside (0, inf);
  the `F.when` chains below mirror that exactly, including NULL for
  values <= 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# F1-F3: text cleaning (src/transformation.py:151-167, 610-631)
# --------------------------------------------------------------------------
def clean_name(col: Column | str) -> Column:
    """trim + title-case (ref: str.strip().str.title())."""
    return F.initcap(F.trim(_c(col)))


def clean_email(col: Column | str) -> Column:
    """trim + lowercase (ref: str.strip().str.lower())."""
    return F.lower(F.trim(_c(col)))


# --------------------------------------------------------------------------
# F21: safe divide (src/utils.py:120-125)
# --------------------------------------------------------------------------
def safe_divide(n: Column, d: Column, default: float = 0.0) -> Column:
    return F.when(d != 0, n / d).otherwise(F.lit(default))


# --------------------------------------------------------------------------
# F9: customer segmentation (src/transformation.py:338-349)
# --------------------------------------------------------------------------
def customer_segment(total_amount: Column | str) -> Column:
    t = _c(total_amount)
    return (
        F.when(t >= 1000, "VIP")
        .when(t >= 500, "Premium")
        .when(t >= 100, "Standard")
        .otherwise("Budget")
    )


# --------------------------------------------------------------------------
# F10: pd.cut banding — right-closed bins, NULL outside (0, inf)
# (src/transformation.py:353-359, 437-443, 476-482)
# --------------------------------------------------------------------------
def _cut(col: Column, bins: list[float], labels: list[str]) -> Column:
    """pd.cut(col, bins=[b0..bn], labels): (b0,b1] -> l0, ... NULL outside."""
    c = _c(col)
    expr = F.when(c.isNull() | (c <= bins[0]) | (c > bins[-1]), F.lit(None).cast("string"))
    for lo_idx, label in enumerate(labels):
        expr = expr.when(c <= bins[lo_idx + 1], label)
    return expr


_INF = float("inf")


def customer_value_tier(total_amount: Column | str) -> Column:
    return _cut(
        _c(total_amount),
        [0, 50, 200, 500, 1000, _INF],
        ["Low", "Medium", "High", "Premium", "VIP"],
    )


def product_price_tier(price: Column | str) -> Column:
    return _cut(
        _c(price),
        [0, 100, 500, 1000, 2000, _INF],
        ["Budget", "Mid-Range", "Premium", "Luxury", "Ultra-Premium"],
    )


def revenue_tier(total_amount: Column | str) -> Column:
    return _cut(
        _c(total_amount),
        [0, 100, 300, 600, 1000, _INF],
        ["Low", "Medium", "High", "Premium", "Enterprise"],
    )


# --------------------------------------------------------------------------
# F6: customer type from email domain (src/transformation.py:362-374)
# --------------------------------------------------------------------------
_BUSINESS_DOMAINS = ("company.com", "corp.com", "business.com")


def customer_type(email: Column | str) -> Column:
    e = _c(email)
    domain = F.lower(F.substring_index(e, "@", -1))
    is_business = F.lit(False)
    for bd in _BUSINESS_DOMAINS:
        is_business = is_business | domain.contains(bd)
    return (
        F.when(e.isNull(), "Unknown").when(is_business, "Business").otherwise("Individual")
    )


# --------------------------------------------------------------------------
# F7: brand extraction — ordered keyword dict, first match wins
# (src/transformation.py:387-408; dict order matters: 'apple watch'
# must hit Apple before 'watch'-keyed rules elsewhere)
# --------------------------------------------------------------------------
_BRANDS = (
    ("Apple", ("iphone", "ipad", "macbook", "airpods", "apple watch")),
    ("Samsung", ("galaxy", "samsung")),
    ("Nintendo", ("nintendo", "switch")),
    ("Amazon", ("kindle", "echo", "alexa")),
    ("Sony", ("playstation", "sony")),
    ("Microsoft", ("xbox", "surface")),
)


def _keyword_chain(col: Column, table: tuple, fallback: str) -> Column:
    lowered = F.lower(col)
    expr = F.when(col.isNull(), "Unknown")
    for label, keywords in table:
        cond = F.lit(False)
        for kw in keywords:
            cond = cond | lowered.contains(kw)
        expr = expr.when(cond, label)
    return expr.otherwise(fallback)


def product_brand(product: Column | str) -> Column:
    return _keyword_chain(_c(product), _BRANDS, "Other")


# --------------------------------------------------------------------------
# F8: product category (src/transformation.py:411-434; ordered dict —
# 'iphone' hits Mobile before Wearable's 'watch')
# --------------------------------------------------------------------------
_CATEGORIES = (
    ("Mobile", ("iphone", "phone", "mobile")),
    ("Computer", ("macbook", "laptop", "computer", "surface")),
    ("Audio", ("airpods", "headphones", "speaker", "echo")),
    ("Gaming", ("nintendo", "xbox", "playstation", "switch")),
    ("Tablet", ("ipad", "tablet")),
    ("Wearable", ("watch", "fitness")),
    ("E-Reader", ("kindle", "reader")),
)


def product_category(product: Column | str) -> Column:
    return _keyword_chain(_c(product), _CATEGORIES, "Electronics")


# --------------------------------------------------------------------------
# F11: profit-margin banding (src/transformation.py:456-468)
# --------------------------------------------------------------------------
def estimated_profit_margin(price: Column | str) -> Column:
    p = _c(price)
    return (
        F.when(p < 100, 0.15).when(p < 500, 0.20).when(p < 1000, 0.25).otherwise(0.30)
    )


# --------------------------------------------------------------------------
# F16: season from month (src/transformation.py:508-519)
# --------------------------------------------------------------------------
def season(month: Column | str) -> Column:
    m = _c(month)
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Fall")
    )


# --------------------------------------------------------------------------
# F17: days since order (src/transformation.py:522)
# --------------------------------------------------------------------------
def days_since_order(order_date: Column | str) -> Column:
    return F.datediff(F.current_date(), _c(order_date))


# --------------------------------------------------------------------------
# F18/F19: additive risk score + banding (src/transformation.py:538-569)
# — pure expression replacing the reference's row-wise apply(axis=1).
# --------------------------------------------------------------------------
def risk_score(
    total_amount: Column | str, customer_name: Column | str, order_weekday: Column | str
) -> Column:
    score = (
        F.when(_c(total_amount) > 1000, 30).otherwise(0)
        + F.when(_c(customer_name).contains("Unknown"), 20).otherwise(0)
        + F.when(_c(order_weekday).isin("Saturday", "Sunday"), 10).otherwise(0)
    )
    return F.least(F.lit(100), score)


def risk_level(score: Column | str) -> Column:
    s = _c(score)
    return F.when(s >= 50, "High").when(s >= 25, "Medium").otherwise("Low")


# --------------------------------------------------------------------------
# A2 validity predicates (src/validation.py:114-154)
# --------------------------------------------------------------------------
ORDER_ID_PATTERN = r"^[A-Z]{3}-[0-9]{4}$|^API-[0-9]{4}$"
EMAIL_PATTERN = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"


def valid_order_id_expr(col: Column | str) -> Column:
    return F.coalesce(_c(col).rlike(ORDER_ID_PATTERN), F.lit(False))


def valid_email_expr(col: Column | str) -> Column:
    return F.coalesce(_c(col).rlike(EMAIL_PATTERN), F.lit(False))


def valid_date_expr(col: Column | str) -> Column:
    """Parseable date (ref: pd.to_datetime(errors='coerce').notna())."""
    c = _c(col)
    return F.coalesce(c.try_cast("date").isNotNull(), F.lit(False))
