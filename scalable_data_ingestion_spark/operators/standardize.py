"""Standardization stage (src/transformation.py:584-657).

Upper-case order ids, title-case names, lower+trim emails, lower
source, round money fields to 2dp — all pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MONEY_FIELDS = ("price", "total_amount", "estimated_profit")


def standardize(df: DataFrame) -> DataFrame:
    if "order_id" in df.columns:
        df = df.withColumn("order_id", F.upper("order_id"))
    if "customer_name" in df.columns:
        df = df.withColumn("customer_name", F.initcap("customer_name"))
    if "customer_email" in df.columns:
        df = df.withColumn("customer_email", F.lower(F.trim("customer_email")))
    if "source" in df.columns:
        df = df.withColumn("source", F.lower("source"))
    for field in MONEY_FIELDS:
        if field in df.columns:
            df = df.withColumn(field, F.round(field, 2))
    return df
