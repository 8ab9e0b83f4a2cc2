"""Feature-store style training-matrix construction over the event log.

The supervised-learning data-prep shape: pick a cutoff time C, compute
per-entity features STRICTLY BEFORE C (trailing activity windows,
recency), and a label STRICTLY AFTER C (did the user return within the
horizon) — the leakage rule the point-in-time join
(operators/scd.py pit_orders_with_priority_version) enforces for
dimension attributes, applied here to aggregate features.

The cutoff is DATA-DERIVED (max event date minus the label horizon) so
the operator is a pure function of the table, reproducible across
engines; a production run passes C explicitly.

Exactness: every feature is an integer count or an integer day
difference; the label is a boolean conditional max. One user-keyed
groupBy computes features AND label in a single pass (conditional
aggregation over ts ranges) — no self-join of the event log, no second
scan.

Scale (100 TB log): one shuffle on user_id with map-side partial
aggregation; the cutoff is a broadcast one-row aggregate. Trailing
windows are CASE predicates inside the same aggregation, so adding
features adds columns, not passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

FEAT_LABEL_HORIZON_DAYS = 7
FEAT_SHORT_WINDOW_DAYS = 7
FEAT_LONG_WINDOW_DAYS = 30


@register(
    "feat_user_activity_matrix",
    oracle=f"""
    WITH cut AS (
      SELECT max(CAST(ts AS DATE)) - INTERVAL {FEAT_LABEL_HORIZON_DAYS} DAY
                 AS c
      FROM events
    ),
    feats AS (
      SELECT user_id,
             CAST(sum(CASE WHEN CAST(ts AS DATE) <= c
                            AND CAST(ts AS DATE) > c - INTERVAL {FEAT_SHORT_WINDOW_DAYS} DAY
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_events_7d,
             CAST(sum(CASE WHEN CAST(ts AS DATE) <= c
                            AND CAST(ts AS DATE) > c - INTERVAL {FEAT_LONG_WINDOW_DAYS} DAY
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_events_30d,
             CAST(sum(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) <= c
                            AND CAST(ts AS DATE) > c - INTERVAL {FEAT_LONG_WINDOW_DAYS} DAY
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases_30d,
             CAST(date_diff('day',
                            max(CASE WHEN CAST(ts AS DATE) <= c
                                     THEN CAST(ts AS DATE) END),
                            max(c)) AS BIGINT) AS days_since_last,
             CAST(max(CASE WHEN CAST(ts AS DATE) > c THEN 1 ELSE 0 END)
                  AS INTEGER) AS label_active_next_7d
      FROM events CROSS JOIN cut
      GROUP BY user_id
    )
    SELECT * FROM feats WHERE days_since_last IS NOT NULL
    """,
)
def feat_user_activity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user leakage-free training matrix at cutoff C = max event
    date - {FEAT_LABEL_HORIZON_DAYS}d: trailing activity features
    before C, return label after C. Users with no pre-cutoff activity
    are excluded (no features to learn from)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d"), "event_type"
    )
    cut = ev.agg(
        F.date_sub(F.max("d"), FEAT_LABEL_HORIZON_DAYS).alias("c")
    )
    base = ev.crossJoin(F.broadcast(cut))
    before = F.col("d") <= F.col("c")
    in_short = before & (
        F.col("d") > F.date_sub(F.col("c"), FEAT_SHORT_WINDOW_DAYS)
    )
    in_long = before & (
        F.col("d") > F.date_sub(F.col("c"), FEAT_LONG_WINDOW_DAYS)
    )
    feats = base.groupBy("user_id").agg(
        F.sum(F.when(in_short, 1).otherwise(0)).cast("bigint").alias("n_events_7d"),
        F.sum(F.when(in_long, 1).otherwise(0)).cast("bigint").alias("n_events_30d"),
        F.sum(F.when(in_long & (F.col("event_type") == "purchase"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases_30d"),
        F.datediff(F.max("c"), F.max(F.when(before, F.col("d"))))
        .cast("bigint")
        .alias("days_since_last"),
        F.max(F.when(F.col("d") > F.col("c"), 1).otherwise(0))
        .cast("int")
        .alias("label_active_next_7d"),
    )
    return feats.filter(F.col("days_since_last").isNotNull())
