"""Stream-stream join: click → purchase attribution within a horizon.

The last Structured Streaming surface the engine exposes (alongside
windows, stateful ops, and cross-batch dedup): joining two *unbounded*
sides. Both inputs carry a watermark and the join condition carries an
event-time range, so each side's state store holds only rows inside
``watermark + horizon`` — the bounded-state requirement for unbounded
inputs.

One builder serves batch and streaming (the windows.py pattern): the
batch result is oracle-checked (``ssj_click_purchase_pairs``), which
certifies the join semantics; the streaming test replays the same
events and must produce exactly the batch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

HORIZON = "2 hours"


def click_purchase_pairs(
    events: DataFrame, streaming: bool = False, watermark: str = "1 day"
) -> DataFrame:
    """Pairs (click, later purchase by the same user within HORIZON)."""
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    if streaming:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {HORIZON}")
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("secs_to_purchase"),
    )


@register(
    "ssj_click_purchase_pairs",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('second', c.ts, p.ts) AS secs_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 2 HOUR
    """,
)
def ssj_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return click_purchase_pairs(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Stream-static join: enrich the unbounded event stream with the
# static customer dimension (user_id == c_custkey in this fixture).
# The canonical streaming-enrichment pattern — the static side needs
# NO watermark and holds no state (each micro-batch hash-joins against
# the broadcast dimension; Spark re-reads the static side per batch,
# so slowly-changing dimensions pick up updates between batches).
# One builder serves batch and streaming; the batch twin is
# oracle-checked and the streaming test must reproduce it exactly.
# ---------------------------------------------------------------------------
def enrich_events_with_segment(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Row-level enrichment: every event annotated with the customer's
    market segment (stream-safe — a plain broadcast hash join, no
    state; works identically on batch and streaming inputs)."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return events.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )


@register(
    "sst_events_by_segment",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def sst_events_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = enrich_events_with_segment(
        table(spark, sf_dir, "events"), table(spark, sf_dir, "customer")
    )
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# LEFT OUTER stream-stream join — the semantically hard variant: a
# click with no purchase inside HORIZON must STILL emit (with null
# purchase columns), but only once Spark can PROVE no match is coming,
# i.e. when the watermark passes click_ts + HORIZON and the click's
# state is evicted. Inner rows emit as matches arrive; null rows emit
# on state expiry — so in a live stream the "did not convert" signal
# trails real time by watermark + horizon, which is the correctness/
# latency trade every outer streaming join makes. The batch twin is
# a plain LEFT JOIN (oracle-checked); the streaming test replays the
# same history in two triggers with a far-future watermark-pusher file
# and must reproduce the batch rows EXACTLY, nulls included
# (tests/test_streaming.py::test_stream_stream_outer_join_equals_batch).
# State sizing at 100 TB: per-key state holds only clicks younger than
# watermark + HORIZON — bounded by click rate x horizon, independent
# of history length.
# ---------------------------------------------------------------------------
def click_purchase_pairs_outer(
    events: DataFrame, streaming: bool = False, watermark: str = "1 day"
) -> DataFrame:
    """Every click paired with each purchase by the same user within
    HORIZON, or with nulls if none arrived (left-outer semantics)."""
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    if streaming:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {HORIZON}")
        ),
        "left_outer",
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("secs_to_purchase"),
    )


@register(
    "ssj_click_purchase_outer",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('second', c.ts, p.ts) AS secs_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 2 HOUR
    """,
)
def ssj_click_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return click_purchase_pairs_outer(table(spark, sf_dir, "events"))
