"""Event-log queries: JSON extraction, temporal bucketing, frequency.

Exercises the semi-structured surface the reference never had (its only
group-by is a top-10 value_counts, src/storage.py:509 — mirrored here as
`ev_top_event_types`) plus `events.props` JSON extraction (SURVEY.md
§2.8 note: from_json/get_json_object are the natural fit).

Scale notes: `get_json_object` stays JVM-side (codegen'd Jackson parse);
time bucketing via date_trunc is a pure expression so the groupBy
shuffles pre-aggregated partials only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --------------------------------------------------------------------------
# top-10 value frequency (A8/O2: value_counts().head(10),
# src/storage.py:509) with deterministic tiebreak.
# --------------------------------------------------------------------------
@register(
    "ev_top_event_types",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT 10
    """,
)
def ev_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("event_type"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# JSON scalar extraction from the props column.
# --------------------------------------------------------------------------
@register(
    "ev_json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def ev_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# tumbling daily buckets via date_trunc (batch analog of the streaming
# tumbling window; streaming variant lives in streaming/windows.py).
# --------------------------------------------------------------------------
@register(
    "ev_daily_activity",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 6) AS avg_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def ev_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# per-user behavioral profile: conditional aggregation (pivot-style).
# --------------------------------------------------------------------------
@register(
    "ev_user_profiles",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS n_errors,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    GROUP BY user_id
    """,
)
def ev_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_purchase = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    is_error = F.when(F.col("event_type") == "error", 1).otherwise(0)
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_purchase).cast("bigint").alias("n_purchases"),
        F.sum(is_error).cast("bigint").alias("n_errors"),
        F.round(F.sum(purchase_value), 2).alias("purchase_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


# --------------------------------------------------------------------------
# sessionization in batch: 30-minute-gap sessions per user via windows
# (lag -> gap flag -> running session id). SQL-expressible end to end.
# --------------------------------------------------------------------------
@register(
    "ev_user_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR date_diff('second',
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                            ts) > 1800
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def ev_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0).alias("new_session"),
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(run).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --------------------------------------------------------------------------
# from_json -> typed struct (schema-declared parse; the companion to
# ev_json_props_stats' path-based get_json_object).
# --------------------------------------------------------------------------
@register(
    "ev_props_struct_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0
    """,
)
def ev_props_struct_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return (
        ev.select("event_id", parsed.getField("k").alias("k_val"))
        .filter(F.col("k_val") % 7 == 0)
    )


# --------------------------------------------------------------------------
# Spark-4 VARIANT path for semi-structured props: parse the JSON ONCE
# into the binary Variant encoding, then extract typed fields with
# variant_get — the modern engine-native alternative to
# get_json_object (which re-parses the JSON string per extraction
# expression; with V extracted fields the string path parses V times,
# the variant path once). Output: per-type exact percentiles of the
# payload metric, complementing ev_json_props_stats' sums.
# --------------------------------------------------------------------------
@register(
    "ev_variant_props_percentiles",
    oracle="""
    WITH k AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(k) AS INTEGER) AS min_k,
           round(quantile_cont(k, 0.5), 6) AS p50_k,
           round(quantile_cont(k, 0.9), 6) AS p90_k,
           CAST(max(k) AS INTEGER) AS max_k
    FROM k GROUP BY event_type
    """,
)
def ev_variant_props_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction through VariantType (parse_json once,
    variant_get per field) + exact per-type percentiles."""
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    base = ev.select("event_type", k.alias("k"))
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("k").cast("int").alias("min_k"),
        F.round(F.percentile("k", F.lit(0.5)), 6).alias("p50_k"),
        F.round(F.percentile("k", F.lit(0.9)), 6).alias("p90_k"),
        F.max("k").cast("int").alias("max_k"),
    )
