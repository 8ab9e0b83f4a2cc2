"""Sketch-based approximate aggregates: HLL++ distinct counts and
quantile sketches.

At 100 TB, exact ``COUNT(DISTINCT ...)`` and exact percentiles force a
full shuffle of the key stream (or a giant sort); production OLAP
engines answer these with mergeable sketches instead. Spark ships both
natively and they are the right default at scale:

- ``approx_count_distinct`` — HyperLogLog++ (Heule et al. 2013).
  Fixed-size (kilobytes) sketch per group, merged associatively across
  partitions: the shuffle carries sketches, not keys. Default rsd=5%;
  we request 2%.
- ``percentile_approx`` — a mergeable quantile sketch (Greenwald-Khanna
  variant). Same property: per-partition sketches merge without ever
  materializing the sorted stream.

These are **approximate and engine-specific by design**, so they are
registered WITHOUT a DuckDB oracle (the driver records rows-only): a
value-hash against another engine's different sketch would be
meaningless. Instead ``tests/test_corpus_ops.py`` asserts the hard
semantic property — each approximate answer lands within the published
error bound of the exact answer computed by the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

HLL_RSD = 0.02  # requested relative standard deviation for HLL++
PCTS = [0.5, 0.9, 0.99]


@register("sk_approx_event_profile")
def sk_approx_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate profile: HLL++ distinct users and
    sketch-based value percentiles.

    One hash aggregate; the shuffle carries one HLL sketch + one
    quantile sketch per (partition, event_type) — size independent of
    user cardinality or row count, which is the whole point at 100 TB.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", HLL_RSD).alias("approx_users"),
        F.percentile_approx("value", PCTS, 10000).alias("value_pcts"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ).select(
        "event_type",
        "approx_users",
        F.col("value_pcts")[0].alias("approx_p50"),
        F.col("value_pcts")[1].alias("approx_p90"),
        F.col("value_pcts")[2].alias("approx_p99"),
        "n_events",
    )


@register("sk_approx_order_quantiles")
def sk_approx_order_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantile sketch per order priority — the skewed-key
    companion (priorities are few and heavy). Exact distinct customer
    count would shuffle every o_custkey; the sketch shuffles kilobytes."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_custkey"
    )
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", HLL_RSD).alias("approx_customers"),
        F.percentile_approx("o_totalprice", PCTS, 10000).alias("pcts"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    ).select(
        "o_orderpriority",
        "approx_customers",
        F.col("pcts")[0].alias("approx_p50"),
        F.col("pcts")[1].alias("approx_p90"),
        F.col("pcts")[2].alias("approx_p99"),
        "n_orders",
    )
