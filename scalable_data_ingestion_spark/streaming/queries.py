"""Event-time window aggregations, registered in batch mode.

``F.window`` / ``F.session_window`` produce identical results in batch
and streaming (same expressions, same Catalyst operators) — the
streaming variants in ``windows.py`` reuse these builders over a
readStream source with a watermark. Registering the batch form keeps
them oracle-checkable (the driver records rows-only checks for
streaming-only ops; these get full value checks).

Window alignment: Spark tumbling/sliding windows are epoch-aligned;
DuckDB ``time_bucket`` origin (2000-01-03 00:00) is also :00-aligned
for sub-hour buckets, so starts coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows; shared by batch + streaming paths."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """1h windows sliding every 30m — each event lands in 2 windows."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "st_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(table(spark, sf_dir, "events"))


@register(
    "st_sliding_1h_30m",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
      FROM events
    )
    SELECT window_start,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM assigned
    GROUP BY window_start
    """,
)
def st_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(table(spark, sf_dir, "events"))


@register(
    "st_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond',
                            lag(ts) OVER w, ts) >= 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window semantics: a gap of exactly >= 30min starts a new
    session (window is [start, last+gap)); the oracle mirrors with a
    microsecond-precision lag/cumsum sessionization."""
    return session_agg(table(spark, sf_dir, "events"))
