"""Behavioral analytics over the event log: ordered conversion funnels
and cohort retention.

The reference has no event analytics at all (its only aggregate surface
is whole-table descriptive stats, SURVEY.md §2.4); these two operators
cover the sequence-analysis family a product/training-data pipeline
runs over clickstream-shaped data:

- **Ordered conversion funnel** (``ev_conversion_funnel``): for each
  user, the first ``view``, the first ``click`` strictly after that
  view, and the first ``purchase`` strictly after that click — i.e. the
  stages must happen in order, not merely all happen. Rolls up to
  per-stage user counts and conversion rates. This is the
  MATCH_RECOGNIZE/funnel idiom expressed with conditional min-over-
  window, no pattern-matching engine needed.
- **Cohort retention** (``ev_retention_cohorts``): users are cohorted
  by their first active day; for every (cohort day, day offset) cell,
  the fraction of the cohort active that day. The classic triangle
  retention matrix.

Scale notes (100 TB event log):
- Both operators shuffle **once** on ``user_id`` (the funnel's three
  stage timestamps are stacked window functions over the same
  partitioning — Catalyst plans a single Exchange; the cohort's
  per-user first day is a partial-aggregating groupBy). Everything
  after the per-user reduction is dimension-sized (stages × 1,
  days × offsets) and hash-aggregates map-side.
- No self-joins on the raw event log: the naive funnel formulation
  (events JOIN events JOIN events per user) explodes on power users;
  conditional window minima are O(events) regardless of per-user
  fan-out. Skewed users cost one partition's sort, bounded by
  per-user event counts, not pairs.
- The retention matrix's ``count(DISTINCT user_id)`` is keyed by
  (cohort_day, offset) after a per-(user, day) dedup — the dedup is
  the same shuffle as the cohort assignment, so the distinct is exact
  without a second corpus-wide pass.

Cache lifecycle: builders here persist() multi-referenced relations
(e.g. the survival/Nelson-Aalen labeled-spells frame) and deliberately
never unpersist — the returned plan still references them. Library
consumers own the drop via ``registry.cache_scope`` /
``spark.catalog.clearCache()``; see the registry module docstring
(same convention as operators/dedup.py and operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._branches import explode_branches

FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "ev_conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT count(*) FROM v) AS n1,
             (SELECT count(*) FROM c) AS n2,
             (SELECT count(*) FROM p) AS n3
    )
    SELECT s.stage, s.n_users,
           round(s.n_users * 1.0 / n.n1, 6) AS conv_from_start,
           round(s.n_users * 1.0 / s.n_prev, 6) AS conv_from_prev
    FROM n, (
      SELECT '1_view' AS stage, n1 AS n_users, n1 AS n_prev FROM n
      UNION ALL SELECT '2_click', n2, n1 FROM n
      UNION ALL SELECT '3_purchase', n3, n2 FROM n
    ) s
    """,
)
def ev_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel with per-stage user
    counts and step conversion rates.

    Stage timestamps are conditional minima stacked over ONE window
    partitioning (user_id): ``t1 = min(ts) where view``, ``t2 = min(ts)
    where click and ts > t1``, ``t3 = min(ts) where purchase and
    ts > t2``. Catalyst plans the three Window operators over a single
    Exchange, so the whole funnel costs one shuffle of the event log —
    no event-log self-joins (the naive 3-way join is quadratic per
    power user).
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    per_ev = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    per_ev = per_ev.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
        )
    ).over(w)
    per_user = (
        per_ev.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_view").alias("stage"),
                    F.col("n1").alias("n_users"),
                    F.col("n1").alias("n_prev"),
                    F.col("n1").alias("n_start"),
                ),
                F.struct(
                    F.lit("2_click").alias("stage"),
                    F.col("n2").alias("n_users"),
                    F.col("n1").alias("n_prev"),
                    F.col("n1").alias("n_start"),
                ),
                F.struct(
                    F.lit("3_purchase").alias("stage"),
                    F.col("n3").alias("n_users"),
                    F.col("n2").alias("n_prev"),
                    F.col("n1").alias("n_start"),
                ),
            )
        ).alias("s")
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("s.n_start"), 6).alias("conv_from_start"),
        F.round(F.col("s.n_users") / F.col("s.n_prev"), 6).alias("conv_from_prev"),
    )


@register(
    "ev_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    coh AS (
      SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
    ),
    cells AS (
      SELECT c.cohort_day,
             CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS offset_days,
             count(DISTINCT a.user_id) AS n_active
      FROM act a JOIN coh c USING (user_id)
      GROUP BY 1, 2
    ),
    base AS (
      SELECT cohort_day, n_active AS cohort_size FROM cells WHERE offset_days = 0
    )
    SELECT c.cohort_day, c.offset_days,
           CAST(c.n_active AS BIGINT) AS n_active,
           round(c.n_active * 1.0 / b.cohort_size, 6) AS retention
    FROM cells c JOIN base b USING (cohort_day)
    """,
)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle retention matrix: cohort users by first active day,
    then the active fraction of each cohort at every day offset.

    One shuffle keyed on user_id covers the (user, day) dedup AND the
    per-user cohort min (the cohort join is on the same key, so AQE
    reuses the partitioning); the (cohort, offset) matrix is at most
    days^2 cells — dimension-sized regardless of event volume, so the
    final aggregate and the offset-0 self-join are broadcast-cheap.
    """
    ev = table(spark, sf_dir, "events")
    # (user, day)-sized and referenced by the cohort min AND the cell
    # join — persist so the events scan + distinct runs once (the two
    # references shuffle differently downstream, so exchange reuse
    # alone does not cover it).
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct().persist()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cells = (
        act.join(coh, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("int").alias("offset_days"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    base = cells.filter(F.col("offset_days") == 0).select(
        "cohort_day", F.col("n_active").alias("cohort_size")
    )
    return cells.join(F.broadcast(base), "cohort_day").select(
        "cohort_day",
        "offset_days",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


# --------------------------------------------------------------------------
# Multi-touch attribution: linear credit over the pre-purchase touch
# window. For every purchase, the view/click touches by the same user
# in the trailing 7 days share the conversion credit equally. The
# marketing-analytics staple the funnel above doesn't cover (the funnel
# asks "did the user convert"; attribution asks "which touchpoints get
# paid").
#
# Exactness policy: per-touch credit is the INTEGER micro-credit
# 1_000_000 DIV n_touches, so the per-channel rollup is a BIGINT sum —
# no 1/3-style float shares accumulate (the DIV remainder is reported,
# not redistributed, and both engines truncate identically).
#
# Scale (100 TB event log): the purchase-touch pairing is a user-keyed
# equi-join with a residual time-range predicate — both sides shuffle
# once on user_id and the pair fan-out is bounded by touches-per-user
# within the window (the same shape as the stream-stream join,
# streaming/joins.py). The per-purchase touch count is a window over
# the purchase key on the already-joined relation (no second pass),
# and the final per-channel rollup is dimension-sized.
# --------------------------------------------------------------------------
ATTR_WINDOW_DAYS = 7
ATTR_TOUCH_TYPES = ("view", "click")
ATTR_MICRO = 1_000_000


@register(
    "ev_attribution_linear",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS touch_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    paired AS (
      SELECT p.purchase_id, t.touch_id, t.event_type
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
    ),
    credited AS (
      SELECT purchase_id, touch_id, event_type,
             {ATTR_MICRO} // count(*) OVER (PARTITION BY purchase_id)
                 AS credit_micro
      FROM paired
    )
    SELECT event_type,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total,
           round(CAST(sum(credit_micro) AS DOUBLE) / {ATTR_MICRO}, 6)
               AS credit
    FROM credited
    GROUP BY event_type
    """,
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchases to the trailing
    {ATTR_WINDOW_DAYS}-day view/click touches, in exact micro-credits."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    paired = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")),
    ).select("purchase_id", "touch_id", "event_type")
    credited = paired.withColumn(
        "credit_micro",
        F.expr(
            f"CAST({ATTR_MICRO} AS BIGINT) DIV "
            "count(*) OVER (PARTITION BY purchase_id)"
        ),
    )
    return credited.groupBy("event_type").agg(
        F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("credit_micro").cast("bigint").alias("credit_micro_total"),
        F.round(
            F.sum("credit_micro").cast("double") / ATTR_MICRO, 6
        ).alias("credit"),
    )


# --------------------------------------------------------------------------
# RFM segmentation: the classic customer-value quartile grid.
# Recency (days since last order, vs the corpus max date so the
# operator is a pure function of the data), Frequency (order count),
# Monetary (lifetime spend in exact BIGINT cents — float sums of
# o_totalprice would be order-dependent and hash-fragile). Each
# dimension is scored into quartiles by ntile(4) under a total order
# (custkey tiebreak), so both engines assign identical scores.
#
# Scale: the per-customer reduce is one custkey-keyed partial
# aggregation. The three ntile windows are global sorts over the
# CUSTOMER DIMENSION (not the order fact) — at extreme customer counts
# the same quartiles come from approx-percentile cut points; at
# dimension scale the exact sort is the right plan.
# --------------------------------------------------------------------------
@register(
    "cust_rfm_segments",
    oracle="""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
    base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)),
                       (SELECT ref_date FROM ref)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, recency_days, frequency, monetary_cents,
             5 - ntile(4) OVER (ORDER BY recency_days, custkey) AS r_score,
             5 - ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             5 - ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
      FROM base
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days, frequency,
           monetary_cents,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS rfm
    FROM scored
    """,
)
def cust_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quartile scores (4 = best) and the concatenated
    RFM cell label.

    Each quartile assignment is ``global_ntile`` — the range-partitioned
    ntile (offset ranking + literal total, standard first-tiles-long
    semantics) — because every customer needs a score and the customer
    dimension grows with the data: no single-partition ntile windows."""
    from ..functions.ranking import global_ntile

    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    ref = orders.agg(F.max(d).alias("ref_date"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(d).alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff("ref_date", "last_order").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    tiled = global_ntile(
        base, [F.col("recency_days"), F.col("custkey")], 4, "_rt"
    )
    tiled = global_ntile(
        tiled, [F.col("frequency").desc(), F.col("custkey")], 4, "_ft"
    )
    tiled = global_ntile(
        tiled, [F.col("monetary_cents").desc(), F.col("custkey")], 4, "_mt"
    )
    scored = tiled.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        (5 - F.col("_rt")).cast("int").alias("r_score"),
        (5 - F.col("_ft")).cast("int").alias("f_score"),
        (5 - F.col("_mt")).cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve: customers cohorted by first-order month; for each
# (cohort month, months since first order) cell, the cumulative
# revenue per cohort member so far. THE unit-economics chart (how fast
# does a cohort pay back, do newer cohorts monetize faster) — the
# revenue counterpart of ev_retention_cohorts' activity triangle.
#
# Exactness: revenue in BIGINT cents; month arithmetic as integer
# (year*12 + month) differences; the cumulative sum is an integer
# window over the (cohort, offset) matrix (dimension-sized), not the
# order fact.
#
# Scale: one custkey-keyed first-order reduce (partial agg), one
# (cohort, offset) aggregation of the fact, then windows over the
# matrix.
# --------------------------------------------------------------------------
@register(
    "ev_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    csize AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_customers
      FROM firsts GROUP BY cohort
    ),
    facts AS (
      SELECT f.cohort,
             (year(CAST(o.o_orderdate AS DATE)) * 12
              + month(CAST(o.o_orderdate AS DATE)))
             - (year(f.cohort) * 12 + month(f.cohort)) AS offset_months,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    cells AS (
      SELECT cohort, offset_months,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM facts GROUP BY cohort, offset_months
    ),
    cum AS (
      SELECT cohort, offset_months, revenue_cents,
             CAST(sum(revenue_cents) OVER (
               PARTITION BY cohort ORDER BY offset_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_revenue_cents
      FROM cells
    )
    SELECT CAST(c.cohort AS DATE) AS cohort,
           CAST(c.offset_months AS INTEGER) AS offset_months,
           s.cohort_customers,
           c.revenue_cents,
           c.cum_revenue_cents,
           round(((c.cum_revenue_cents * 10000) // s.cohort_customers)
                 / 1000000.0, 6) AS cum_ltv_per_customer
    FROM cum c JOIN csize s ON s.cohort = c.cohort
    """,
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per cohort member by (first-order cohort
    month, months-since) — exact BIGINT cents throughout."""
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    firsts = orders.groupBy("o_custkey").agg(
        F.trunc(F.min(d), "month").alias("cohort")
    )
    csize = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_customers")
    )
    facts = orders.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year(d) * 12 + F.month(d))
            - (F.year("cohort") * 12 + F.month("cohort"))
        ).alias("offset_months"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cells = facts.groupBy("cohort", "offset_months").agg(
        F.sum("cents").cast("bigint").alias("revenue_cents")
    )
    cum = cells.withColumn(
        "cum_revenue_cents",
        F.sum("revenue_cents")
        .over(
            W.partitionBy("cohort")
            .orderBy("offset_months")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("bigint"),
    )
    return cum.join(F.broadcast(csize), "cohort").select(
        "cohort",
        F.col("offset_months").cast("int").alias("offset_months"),
        "cohort_customers",
        "revenue_cents",
        "cum_revenue_cents",
        F.round(
            F.expr("(cum_revenue_cents * 10000) DIV cohort_customers")
            / 1000000.0,
            6,
        ).alias("cum_ltv_per_customer"),
    )


# --------------------------------------------------------------------------
# Inter-arrival statistics: per-user event-gap percentiles rolled up
# per event type — the engagement-rhythm profile (session timeout
# tuning pulls its threshold from exactly this distribution; compare
# ev_user_sessions' fixed 30-minute gap). Gaps are integer second
# differences from a lag over the (user, ts, event_id) sequence;
# percentiles are exact (quantile_cont / percentile over identical
# integer multisets).
# --------------------------------------------------------------------------
@register(
    "ev_interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events
    ),
    gaps AS (
      SELECT event_type,
             date_diff('second', prev_ts, ts) AS gap_s
      FROM seq WHERE prev_ts IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s,
           round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s
    FROM gaps GROUP BY event_type
    """,
)
def ev_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type percentiles of the user inter-event gap."""
    ev = table(spark, sf_dir, "events")
    seq = ev.withColumn(
        "prev_ts",
        F.lag("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id")),
    )
    gaps = seq.filter(F.col("prev_ts").isNotNull()).select(
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")).alias("gap_s"),
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("p50_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
    )


# --------------------------------------------------------------------------
# Session-duration percentiles: the engagement-depth profile over the
# 30-minute-gap sessionization (ev_user_sessions). Durations are
# integer second differences of per-session min/max timestamps; the
# percentile layer runs over the SESSION relation (one row per
# session), not the event log.
# --------------------------------------------------------------------------
SESSION_GAP_MIN = 30


@register(
    "ev_session_duration_stats",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts)
                          > {SESSION_GAP_MIN} * 60
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    durs AS (
      SELECT user_id, session_no,
             CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
                 AS duration_s,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, session_no
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single_event,
           round(quantile_cont(duration_s, 0.5), 6) AS p50_duration_s,
           round(quantile_cont(duration_s, 0.9), 6) AS p90_duration_s,
           CAST(max(duration_s) AS BIGINT) AS max_duration_s
    FROM durs
    """,
)
def ev_session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration percentiles over {SESSION_GAP_MIN}-minute-gap
    sessions (exact integer second durations)."""
    ev = table(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(seq).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(seq))
                > SESSION_GAP_MIN * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    durs = sess.groupBy("user_id", "session_no").agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("duration_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return durs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_single_event"),
        F.round(F.percentile("duration_s", F.lit(0.5)), 6).alias("p50_duration_s"),
        F.round(F.percentile("duration_s", F.lit(0.9)), 6).alias("p90_duration_s"),
        F.max("duration_s").cast("bigint").alias("max_duration_s"),
    )


# --------------------------------------------------------------------------
# Time-to-convert percentiles: for users whose first purchase follows
# their first view, the view->purchase latency distribution — the
# funnel's TIME dimension (ev_conversion_funnel counts WHO converts;
# this measures HOW LONG conversion takes, which prices retargeting
# windows and attribution horizons — cf. ATTR_WINDOW_DAYS).
# --------------------------------------------------------------------------
@register(
    "ev_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id,
             min(e.ts) AS first_purchase,
             max(f.first_view) AS first_view
      FROM firsts f
      JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts > f.first_view
      GROUP BY f.user_id
    ),
    lat AS (
      SELECT CAST(date_diff('second', first_view, first_purchase) AS BIGINT)
                 AS secs
      FROM conv
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(secs, 0.5), 6) AS p50_secs,
           round(quantile_cont(secs, 0.9), 6) AS p90_secs,
           CAST(max(secs) AS BIGINT) AS max_secs
    FROM lat
    """,
)
def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles of first-view -> first-subsequent-purchase latency
    across converting users (exact integer seconds)."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(
            purch,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("first_view")),
        )
        .groupBy("user_id")
        .agg(
            F.min("p_ts").alias("first_purchase"),
            F.max("first_view").alias("first_view"),
        )
    )
    lat = conv.select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).cast("bigint").alias("secs")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("secs", F.lit(0.5)), 6).alias("p50_secs"),
        F.round(F.percentile("secs", F.lit(0.9)), 6).alias("p90_secs"),
        F.max("secs").cast("bigint").alias("max_secs"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve over customer lifetimes — the
# right-censoring-aware churn/retention statistic (medical-trial
# estimator applied to customer analytics, where it is the standard
# lifetime-model baseline). A customer whose last order is more than
# KM_CHURN_GAP days before the corpus watermark is an observed churn
# EVENT at duration last-first; everyone else is CENSORED at duration
# watermark-first — dropping censored customers (what a naive
# "avg lifetime" does) biases survival low, which is exactly what KM
# corrects.
#
#   S(t) = prod over event durations s <= t of (1 - d_s / n_s)
#
# with n_s = customers still at risk (neither churned nor censored
# before s).
#
# Exactness: the product becomes a SUM of per-step ln terms quantized
# to BIGINT fixed-point before accumulation (markov/LM policy), so the
# curve is identical under any shuffle order. The at-risk counts are
# exclusive prefix sums over the duration axis — computed with
# ``global_running_sum`` (range-partitioned 2-pass scan), never a
# single-partition window; durations are day-grain so the relation is
# time-bounded, but the shape stays uniform with the scale gate.
# --------------------------------------------------------------------------
KM_CHURN_GAP = 90  # days without an order before the watermark = churn


@register(
    "cust_survival_km",
    oracle=f"""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS w FROM orders),
    cust AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS DATE)) AS first_d,
             max(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    labeled AS (
      SELECT o_custkey,
             CASE WHEN date_diff('day', last_d, ref.w) > {KM_CHURN_GAP}
                  THEN 1 ELSE 0 END AS event,
             CASE WHEN date_diff('day', last_d, ref.w) > {KM_CHURN_GAP}
                  THEN date_diff('day', first_d, last_d)
                  ELSE date_diff('day', first_d, ref.w) END AS duration
      FROM cust CROSS JOIN ref
    ),
    per_t AS (
      SELECT duration,
             CAST(sum(event) AS BIGINT) AS d,
             CAST(sum(1 - event) AS BIGINT) AS c
      FROM labeled GROUP BY duration
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM labeled),
    risk AS (
      SELECT duration, d, c,
             n.total - coalesce(sum(d + c) OVER (
               ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS at_risk
      FROM per_t CROSS JOIN n
    ),
    steps AS (
      SELECT duration, d, c, at_risk,
             CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                  WHEN d = at_risk THEN CAST(-100000000000 AS BIGINT)
                  ELSE CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / at_risk)
                                  * 1000000 + 0.5) AS BIGINT)
             END AS fx
      FROM risk
    )
    SELECT CAST(duration AS BIGINT) AS duration_days,
           d AS n_events, c AS n_censored,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           round(exp(sum(fx) OVER (
             ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) / 1000000.0), 6) AS survival
    FROM steps
    """,
)
def cust_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival S(t) over customer lifetimes with
    {KM_CHURN_GAP}-day churn definition and right-censoring at the
    corpus watermark."""
    from ..functions.ranking import bounded_running_sum

    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    ref = orders.agg(F.max(d).alias("w"))
    cust = orders.groupBy("o_custkey").agg(
        F.min(d).alias("first_d"), F.max(d).alias("last_d")
    )
    gap = F.datediff("w", "last_d")
    # customer-grain and referenced twice (per_t + the total count) —
    # persist so the full-orders groupBy runs ONCE (round-10: unpersisted,
    # the n/total branch re-aggregated the whole orders table and the
    # scan gate counted orders x4).
    labeled = cust.crossJoin(F.broadcast(ref)).select(
        F.when(gap > KM_CHURN_GAP, 1).otherwise(0).alias("event"),
        F.when(gap > KM_CHURN_GAP, F.datediff("last_d", "first_d"))
        .otherwise(F.datediff("w", "first_d"))
        .alias("duration"),
    ).persist()
    per_t = labeled.groupBy("duration").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    n = labeled.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    # exclusive prefix of leavers -> at-risk counts. The duration grain
    # is calendar-bounded (<= days spanned by the corpus, ~2.4k rows at
    # any SF), so the prefix sums run as bounded global windows —
    # allowlisted in test_plan_quality.py (round-10 optimization: the
    # two range-repartition passes + offset collects were pure overhead
    # on a dimension-sized relation).
    left_before = bounded_running_sum(
        per_t,
        [F.col("duration")],
        F.col("d") + F.col("c"),
        "_left",
        inclusive=False,
    )
    risk = left_before.crossJoin(F.broadcast(n)).select(
        "duration", "d", "c", (F.col("total") - F.col("_left")).alias("at_risk")
    )
    fx = (
        F.when(F.col("d") == 0, F.lit(0).cast("bigint"))
        .when(F.col("d") == F.col("at_risk"), F.lit(-100000000000).cast("bigint"))
        .otherwise(
            F.floor(
                F.log(1.0 - F.col("d").cast("double") / F.col("at_risk")) * 1000000
                + 0.5
            ).cast("bigint")
        )
    )
    steps = risk.withColumn("fx", fx)
    # inclusive prefix of the ln terms -> survival at each duration
    curve = bounded_running_sum(
        steps, [F.col("duration")], F.col("fx"), "_cum", inclusive=True
    )
    return curve.select(
        F.col("duration").cast("bigint").alias("duration_days"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.col("at_risk").cast("bigint").alias("n_at_risk"),
        F.round(F.exp(F.col("_cum") / 1000000.0), 6).alias("survival"),
    )


# --------------------------------------------------------------------------
# DAU/MAU stickiness: per month, the average daily-active-user count
# over the days the product was live divided by the monthly-active
# count — the standard engagement-density ratio (a stickiness of 1.0
# means every monthly user shows up every day).
#
# Scale shape: ONE (month, day, user) dedup shuffle feeds both legs —
# the per-day DAU counts and the per-month distinct-user counts reuse
# the same deduplicated relation, and everything above the dedup is
# dimension-sized (days, months). No corpus-wide count(DISTINCT)
# without a preceding key-grain reduction.
# --------------------------------------------------------------------------
@register(
    "ev_stickiness_dau_mau",
    oracle="""
    WITH triple AS (
      SELECT DISTINCT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(ts AS DATE) AS day, user_id
      FROM events
    ),
    dau AS (
      SELECT month, day, CAST(count(*) AS BIGINT) AS dau
      FROM triple GROUP BY month, day
    ),
    by_month AS (
      SELECT month,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dau) AS BIGINT) AS user_days
      FROM dau GROUP BY month
    ),
    mau AS (
      SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM triple GROUP BY month
    )
    SELECT b.month, b.n_days, m.mau,
           round(b.user_days * 1.0 / b.n_days, 2) AS avg_dau,
           round(b.user_days * 1.0 / b.n_days / m.mau, 6) AS stickiness
    FROM by_month b JOIN mau m ON b.month = m.month
    """,
)
def ev_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly DAU/MAU stickiness from one (month, day, user) dedup."""
    ev = table(spark, sf_dir, "events")
    triple = ev.select(
        F.date_trunc("month", "ts").cast("date").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    ).distinct().persist()
    dau = triple.groupBy("month", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    by_month = dau.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("user_days"),
    )
    mau = triple.groupBy("month").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    j = by_month.join(mau, "month")
    avg_dau = F.col("user_days") * 1.0 / F.col("n_days")
    return j.select(
        "month",
        "n_days",
        "mau",
        F.round(avg_dau, 2).alias("avg_dau"),
        F.round(avg_dau / F.col("mau"), 6).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# Pareto concentration of event volume: users deciled by activity
# (heaviest first), with each decile's share and cumulative share of
# total events — the "what fraction of traffic is the top 10%?" audit
# that decides whether per-user salting is needed downstream.
#
# Scale shape: per-user counts (one map-side-combining shuffle), then
# the decile assignment through ``global_ntile`` (range-partitioned
# offset ranking — NEVER an unpartitioned ntile window). The cumulative
# share runs as a triangular join over the 10-row decile rollup —
# bounded, windowless, gate-clean.
# --------------------------------------------------------------------------
PARETO_TILES = 10


@register(
    "ev_pareto_user_share",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    tiled AS (
      SELECT n, ntile({PARETO_TILES}) OVER (ORDER BY n DESC, user_id) AS tile
      FROM per_user
    ),
    per_tile AS (
      SELECT tile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n) AS BIGINT) AS n_events
      FROM tiled GROUP BY tile
    ),
    tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM per_tile)
    SELECT CAST(t.tile AS INTEGER) AS tile, t.n_users, t.n_events,
           round(t.n_events * 1.0 / tot.total, 6) AS share,
           round(sum(t2.n_events) * 1.0 / tot.total, 6) AS cum_share
    FROM per_tile t
    JOIN per_tile t2 ON t2.tile <= t.tile, tot
    GROUP BY t.tile, t.n_users, t.n_events, tot.total
    """,
)
def ev_pareto_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-volume share per activity decile with cumulative share."""
    from ..functions.ranking import global_ntile

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tiled = global_ntile(
        per_user, [F.col("n").desc(), F.col("user_id")], PARETO_TILES, "tile"
    )
    per_tile = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    ).persist()
    tot = per_tile.agg(F.sum("n_events").cast("bigint").alias("total"))
    t, t2 = per_tile.alias("t"), per_tile.alias("t2")
    cum = (
        t.join(F.broadcast(t2), F.col("t2.tile") <= F.col("t.tile"))
        .groupBy("t.tile", "t.n_users", "t.n_events")
        .agg(F.sum("t2.n_events").cast("bigint").alias("cum_events"))
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("tile").cast("int").alias("tile"),
        "n_users",
        "n_events",
        F.round(F.col("n_events") * 1.0 / F.col("total"), 6).alias("share"),
        F.round(F.col("cum_events") * 1.0 / F.col("total"), 6).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Two-proportion z-test on an A/B assignment: users hash-split into
# variants (md5 of user_id — deterministic, engine-independent, no
# RNG), outcome = "ever purchased", pooled-variance z on the rate
# difference. The experimentation readout every event pipeline ships
# next to its funnel: not just the two rates, but whether the gap
# clears sampling noise.
#
# Scale shape: ONE user-grain reduction (max of a purchase indicator
# per user — map-side-combining), then a 2-row conditional-sum
# aggregate; the z arithmetic runs on exact integer counts. No joins,
# no windows, no second pass.
# --------------------------------------------------------------------------
AB_Z_CRIT = 1.959964


@register(
    "ev_ab_proportion_ztest",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 1 ELSE 0 END AS in_a,
             converted
      FROM per_user
    ),
    counts AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
             CAST(sum(1 - in_a) AS BIGINT) AS n_b,
             CAST(sum(in_a * converted) AS BIGINT) AS conv_a,
             CAST(sum((1 - in_a) * converted) AS BIGINT) AS conv_b
      FROM tagged
    ),
    stats AS (
      SELECT n_a, n_b, conv_a, conv_b,
             conv_a * 1.0 / n_a AS rate_a,
             conv_b * 1.0 / n_b AS rate_b,
             (conv_a + conv_b) * 1.0 / (n_a + n_b) AS pooled
      FROM counts
    ),
    with_se AS (
      SELECT *, sqrt(pooled * (1 - pooled) * (1.0 / n_a + 1.0 / n_b)) AS se
      FROM stats
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(rate_a, 6) AS rate_a,
           round(rate_b, 6) AS rate_b,
           CASE WHEN se > 0 THEN round((rate_a - rate_b) / se, 6) END AS z_score,
           CASE WHEN se > 0
                THEN abs((rate_a - rate_b) / se) > {AB_Z_CRIT}
                ELSE FALSE END AS significant
    FROM with_se
    """,
)
def ev_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of purchase conversion between
    md5-hash-assigned user variants."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    tagged = per_user.select(
        ((bucket % 2) == 0).cast("int").alias("in_a"), "converted"
    )
    counts = tagged.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum(F.col("in_a") * F.col("converted")).cast("bigint").alias("conv_a"),
        F.sum((F.lit(1) - F.col("in_a")) * F.col("converted"))
        .cast("bigint")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a") * 1.0 / F.col("n_a")
    rate_b = F.col("conv_b") * 1.0 / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    # Degenerate pools (everyone converts, or nobody does) make the pooled
    # standard error 0; under ANSI mode the raw division would throw
    # DIVIDE_BY_ZERO, so the z-score is defined only when se > 0.
    se = F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = F.when(se > 0, (rate_a - rate_b) / se)
    return counts.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        F.when(se > 0, F.abs(z) > AB_Z_CRIT).otherwise(F.lit(False)).alias("significant"),
    )


# --------------------------------------------------------------------------
# CUPED variance reduction — the experimentation-platform companion to
# the A/B z-test above: adjust each user's post-period outcome by
# their PRE-period covariate (theta = cov(x,y)/var(x)), shrinking
# metric variance without biasing the treatment effect. The adjusted
# variance has the closed form var(y) - cov^2/var(x), so the whole
# readout needs exactly ONE user-grain reduction + one 5-sum
# aggregate: n, sum(x), sum(y), sum(x^2), sum(y^2), sum(xy) — all
# exact BIGINTs (counts of events), making theta and both variances
# bit-deterministic cross-engine.
# --------------------------------------------------------------------------
CUPED_SPLIT = "2024-01-16"


@register(
    "ev_cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'view'
                            AND ts < TIMESTAMP '{CUPED_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase'
                            AND ts >= TIMESTAMP '{CUPED_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per_user
    ),
    m AS (
      SELECT n,
             (sxx - sx * 1.0 * sx / n) / n AS var_x,
             (syy - sy * 1.0 * sy / n) / n AS var_y,
             (sxy - sx * 1.0 * sy / n) / n AS cov_xy
      FROM s
    )
    SELECT n AS n_users,
           round(var_y, 6) AS var_y,
           CASE WHEN var_x > 0 THEN round(cov_xy / var_x, 6) END AS theta,
           CASE WHEN var_x > 0
                THEN round(var_y - cov_xy * cov_xy / var_x, 6)
                ELSE round(var_y, 6) END AS var_adjusted,
           CASE WHEN var_x > 0 AND var_y > 0
                THEN round(100.0 * (cov_xy * cov_xy / var_x) / var_y, 6)
                ELSE 0.0 END AS var_reduction_pct
    FROM m
    """,
)
def ev_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED readout: theta and the closed-form adjusted metric
    variance, from pre-period views vs post-period purchases."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            ((F.col("event_type") == "view") & (F.col("ts") < split)).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            (
                (F.col("event_type") == "purchase") & (F.col("ts") >= split)
            ).cast("int")
        )
        .cast("bigint")
        .alias("y"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    var_x = (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n")) / F.col("n")
    var_y = (F.col("syy") - F.col("sy") * 1.0 * F.col("sy") / F.col("n")) / F.col("n")
    cov = (F.col("sxy") - F.col("sx") * 1.0 * F.col("sy") / F.col("n")) / F.col("n")
    m = s.select(F.col("n").alias("n_users"), var_x.alias("var_x"),
                 var_y.alias("var_y"), cov.alias("cov_xy"))
    return m.select(
        "n_users",
        F.round("var_y", 6).alias("var_y"),
        F.when(F.col("var_x") > 0, F.round(F.col("cov_xy") / F.col("var_x"), 6))
        .alias("theta"),
        F.when(
            F.col("var_x") > 0,
            F.round(
                F.col("var_y")
                - F.col("cov_xy") * F.col("cov_xy") / F.col("var_x"),
                6,
            ),
        )
        .otherwise(F.round(F.col("var_y"), 6))
        .alias("var_adjusted"),
        F.when(
            (F.col("var_x") > 0) & (F.col("var_y") > 0),
            F.round(
                100.0
                * (F.col("cov_xy") * F.col("cov_xy") / F.col("var_x"))
                / F.col("var_y"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("var_reduction_pct"),
    )


# --------------------------------------------------------------------------
# Frequent contiguous event trigrams — sequence-pattern mining over the
# clickstream (the PrefixSpan-lite readout: which 3-step paths do users
# actually take, ranked by how many distinct users take them). The
# companion to the Markov path likelihood: that scores GIVEN paths,
# this DISCOVERS the dominant ones.
#
# Scale shape: trigram extraction is two lead() columns over the one
# user-keyed shuffle every per-user timeline needs (NO self-joins on
# the event log — the naive events³ join explodes on power users;
# lead() is O(events) regardless of fan-out). Support counting is a
# (trigram, user) dedup that partial-aggregates map-side, then a
# trigram-keyed count; the key space is |event_type|³-bounded, so the
# final aggregate is dimension-sized. Top-k is TakeOrderedAndProject.
# --------------------------------------------------------------------------
TRIGRAM_TOPK = 20


@register(
    "ev_frequent_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT user_id, event_type || '>' || e2 || '>' || e3 AS trigram
      FROM seq WHERE e3 IS NOT NULL
    ),
    agg AS (
      SELECT trigram,
             CAST(count(DISTINCT user_id) AS BIGINT) AS support_users,
             CAST(count(*) AS BIGINT) AS occurrences
      FROM tri GROUP BY trigram
    )
    SELECT CAST(rnk AS INTEGER) AS rnk, trigram, support_users, occurrences
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY support_users DESC, occurrences DESC, trigram) AS rnk
      FROM agg
    ) WHERE rnk <= {TRIGRAM_TOPK}
    """,
)
def ev_frequent_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRIGRAM_TOPK} contiguous 3-event paths by distinct-user
    support (ties: total occurrences, then trigram)."""
    from ..functions.ranking import take_ordered_ranked

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    tri = seq.select(
        "user_id",
        F.concat_ws(">", "event_type", "e2", "e3").alias("trigram"),
    )
    agg = tri.groupBy("trigram").agg(
        F.countDistinct("user_id").cast("bigint").alias("support_users"),
        F.count(F.lit(1)).cast("bigint").alias("occurrences"),
    )
    ranked = take_ordered_ranked(
        agg,
        [
            F.col("support_users").desc(),
            F.col("occurrences").desc(),
            F.col("trigram"),
        ],
        TRIGRAM_TOPK,
        "rnk",
    )
    return ranked.select(
        F.col("rnk").cast("int").alias("rnk"),
        "trigram",
        "support_users",
        "occurrences",
    )


# --------------------------------------------------------------------------
# Difference-in-differences — the experimentation readout when the
# treatment turns on at a known date instead of by randomization alone:
# compare each group's post-minus-pre change, so any shared time trend
# (seasonality, platform growth) differences out. Completes the
# platform set next to the z-test (binary outcome) and CUPED
# (covariate adjustment).
#
# Cells are exact: event values quantize to 1e6 fixed point BEFORE the
# sums (unordered float addition never happens), group/period tags are
# md5-hash / date-literal expressions, and the four cell means are
# single correctly-rounded divisions of exact integers. ONE pass over
# the event log: conditional sums + conditional distinct-user counts
# in a single aggregate, no joins, no windows.
# --------------------------------------------------------------------------
DID_CUTOFF = "2024-01-16"
DID_FX = 10**6


@register(
    "ev_did_estimate",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 1 ELSE 0 END AS treat,
             CASE WHEN ts < TIMESTAMP '{DID_CUTOFF}' THEN 1 ELSE 0 END AS pre,
             user_id,
             CAST(floor(value * {DID_FX} + 0.5) AS BIGINT) AS fx
      FROM events
    ),
    cells AS (
      SELECT CAST(count(DISTINCT CASE WHEN treat = 1 THEN user_id END) AS BIGINT) AS n_treat,
             CAST(count(DISTINCT CASE WHEN treat = 0 THEN user_id END) AS BIGINT) AS n_control,
             CAST(sum(CASE WHEN treat = 1 AND pre = 1 THEN fx ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN treat = 1 AND pre = 0 THEN fx ELSE 0 END) AS BIGINT) AS tq,
             CAST(sum(CASE WHEN treat = 0 AND pre = 1 THEN fx ELSE 0 END) AS BIGINT) AS cp,
             CAST(sum(CASE WHEN treat = 0 AND pre = 0 THEN fx ELSE 0 END) AS BIGINT) AS cq
      FROM tagged
    )
    SELECT n_treat, n_control,
           round(tp / ({DID_FX}.0 * n_treat), 6) AS pre_treat_mean,
           round(tq / ({DID_FX}.0 * n_treat), 6) AS post_treat_mean,
           round(cp / ({DID_FX}.0 * n_control), 6) AS pre_control_mean,
           round(cq / ({DID_FX}.0 * n_control), 6) AS post_control_mean,
           round((tq / ({DID_FX}.0 * n_treat) - tp / ({DID_FX}.0 * n_treat))
                 - (cq / ({DID_FX}.0 * n_control) - cp / ({DID_FX}.0 * n_control)),
                 6) AS did_estimate
    FROM cells
    """,
)
def ev_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences of per-user mean event value around
    the {DID_CUTOFF} cutoff, hash-assigned treatment vs control."""
    ev = table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    treat = (bucket % 2) == 0
    pre = F.col("ts") < F.lit(DID_CUTOFF).cast("timestamp")
    fx = F.floor(F.col("value") * DID_FX + 0.5).cast("bigint")
    tagged = ev.select(
        treat.alias("treat"), pre.alias("pre"), "user_id", fx.alias("fx")
    )
    cells = tagged.agg(
        F.countDistinct(F.when(F.col("treat"), F.col("user_id")))
        .cast("bigint")
        .alias("n_treat"),
        F.countDistinct(F.when(~F.col("treat"), F.col("user_id")))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("treat") & F.col("pre"), F.col("fx")).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("treat") & ~F.col("pre"), F.col("fx")).otherwise(0))
        .cast("bigint")
        .alias("tq"),
        F.sum(F.when(~F.col("treat") & F.col("pre"), F.col("fx")).otherwise(0))
        .cast("bigint")
        .alias("cp"),
        F.sum(F.when(~F.col("treat") & ~F.col("pre"), F.col("fx")).otherwise(0))
        .cast("bigint")
        .alias("cq"),
    )
    scale = float(DID_FX)
    pre_t = F.col("tp") / (scale * F.col("n_treat"))
    post_t = F.col("tq") / (scale * F.col("n_treat"))
    pre_c = F.col("cp") / (scale * F.col("n_control"))
    post_c = F.col("cq") / (scale * F.col("n_control"))
    return cells.select(
        "n_treat",
        "n_control",
        F.round(pre_t, 6).alias("pre_treat_mean"),
        F.round(post_t, 6).alias("post_treat_mean"),
        F.round(pre_c, 6).alias("pre_control_mean"),
        F.round(post_c, 6).alias("post_control_mean"),
        F.round((post_t - pre_t) - (post_c - pre_c), 6).alias("did_estimate"),
    )


# --------------------------------------------------------------------------
# A/B power analysis — the pre-readout design check next to the z-test:
# given the CURRENT hash-split sample sizes and base conversion rate,
# (a) the minimum detectable absolute effect at alpha = .05 / power
# = .80, and (b) the per-arm sample size needed to detect a +2 pp
# lift. Tells the experimenter whether the readout can possibly
# conclude anything BEFORE they stare at the z-score. Conversion here
# is a high-value purchase (value >= PWR_VALUE_MIN), chosen to be
# non-degenerate (~0.8) at every test SF.
#
# Shape: the same ONE user-grain reduction + one 1-row conditional
# aggregate as the z-test; the power arithmetic is scalar IEEE ops on
# exact integer counts, so it is bit-identical cross-engine.
# --------------------------------------------------------------------------
PWR_VALUE_MIN = 95
PWR_Z_ALPHA = 1.959964  # two-sided alpha = .05
PWR_Z_BETA = 0.841621  # power = .80
PWR_LIFT = 0.02  # +2 pp target lift


@register(
    "ev_ab_power_analysis",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value >= {PWR_VALUE_MIN}
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 1 ELSE 0 END AS in_a,
             converted
      FROM per_user
    ),
    counts AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
             CAST(sum(1 - in_a) AS BIGINT) AS n_b,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM tagged
    ),
    stats AS (
      SELECT n_a, n_b, conv * 1.0 / (n_a + n_b) AS p FROM counts
    )
    SELECT n_a, n_b,
           round(p, 6) AS pooled_rate,
           CASE WHEN p > 0 AND p < 1 THEN
             round(({PWR_Z_ALPHA} + {PWR_Z_BETA})
                   * sqrt(p * (1 - p) * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS mde_abs,
           CASE WHEN p > 0 AND p < 1 THEN
             CAST(ceil(({PWR_Z_ALPHA} + {PWR_Z_BETA}) * ({PWR_Z_ALPHA} + {PWR_Z_BETA})
                  * (p * (1 - p) + (p + {PWR_LIFT}) * (1 - p - {PWR_LIFT}))
                  / ({PWR_LIFT} * {PWR_LIFT})) AS BIGINT)
           END AS n_per_arm_2pp
    FROM stats
    """,
)
def ev_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the current hash split and the
    per-arm n needed for a +{PWR_LIFT:.0%} lift (alpha .05, power .80)."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= PWR_VALUE_MIN)
            ).cast("int")
        ).alias("converted")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    tagged = per_user.select(
        ((bucket % 2) == 0).cast("int").alias("in_a"), "converted"
    )
    counts = tagged.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    p = F.col("conv") * 1.0 / (F.col("n_a") + F.col("n_b"))
    z2 = PWR_Z_ALPHA + PWR_Z_BETA
    ok = (p > 0) & (p < 1)
    mde = z2 * F.sqrt(p * (1 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    n_req = F.ceil(
        z2 * z2 * (p * (1 - p) + (p + PWR_LIFT) * (1 - p - PWR_LIFT))
        / (PWR_LIFT * PWR_LIFT)
    ).cast("bigint")
    return counts.select(
        "n_a",
        "n_b",
        F.round(p, 6).alias("pooled_rate"),
        F.when(ok, F.round(mde, 6)).alias("mde_abs"),
        F.when(ok, n_req).alias("n_per_arm_2pp"),
    )


# --------------------------------------------------------------------------
# Sequential probability ratio test (SPRT) monitor — the always-valid
# alternative to the fixed-horizon z-test above: as users arrive, the
# cumulative Bernoulli log-likelihood ratio between a design baseline
# p0 and a target lift p1 is compared against Wald's thresholds
# ln((1-beta)/alpha) / ln(beta/(1-alpha)); the experiment may stop the
# day the path crosses either bound. This is the daily readout an
# experimentation platform renders as the "sequential monitoring"
# chart.
#
# Determinism: users sequence by their FIRST activity day; daily
# conversion counts are integers; the LLR is (two scalar ln constants)
# x (exact cumulative integer counts) — every product and sum is a
# correctly-rounded scalar op, no unordered float accumulation. The
# cumulative window runs over the POST-AGGREGATION daily series
# (calendar-bounded; documented policy).
# --------------------------------------------------------------------------
SPRT_P0 = 0.05  # design baseline daily conversion propensity
SPRT_P1 = 0.07  # smallest daily-propensity lift worth detecting
SPRT_ALPHA = 0.025
SPRT_BETA = 0.05


@register(
    "ev_sprt_monitor",
    oracle=f"""
    WITH per_user_day AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'purchase' AND value >= {PWR_VALUE_MIN}
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    daily AS (
      SELECT day,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_conv
      FROM per_user_day GROUP BY day
    ),
    cum AS (
      SELECT day, n_users, n_conv,
             CAST(sum(n_users) OVER w AS BIGINT) AS cum_users,
             CAST(sum(n_conv) OVER w AS BIGINT) AS cum_conv
      FROM daily WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT day, n_users, cum_users, cum_conv,
           round(cum_conv * ln({SPRT_P1} / {SPRT_P0})
                 + (cum_users - cum_conv)
                   * ln({1 - SPRT_P1} / {1 - SPRT_P0}), 6) AS llr,
           CASE
             WHEN cum_conv * ln({SPRT_P1} / {SPRT_P0})
                  + (cum_users - cum_conv) * ln({1 - SPRT_P1} / {1 - SPRT_P0})
                  >= ln({(1 - SPRT_BETA)} / {SPRT_ALPHA}) THEN 'accept_h1'
             WHEN cum_conv * ln({SPRT_P1} / {SPRT_P0})
                  + (cum_users - cum_conv) * ln({1 - SPRT_P1} / {1 - SPRT_P0})
                  <= ln({SPRT_BETA} / {(1 - SPRT_ALPHA)}) THEN 'accept_h0'
             ELSE 'continue'
           END AS decision
    FROM cum
    """,
)
def ev_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Wald-SPRT path of (user, day) high-value-conversion
    trials against the p0={SPRT_P0} / p1={SPRT_P1} design, with the
    stop/continue decision per day."""
    ev = table(spark, sf_dir, "events")
    per_user_day = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= PWR_VALUE_MIN)
            ).cast("int")
        ).alias("converted"),
    )
    daily = per_user_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "day",
        "n_users",
        F.sum("n_users").over(w).cast("bigint").alias("cum_users"),
        F.sum("n_conv").over(w).cast("bigint").alias("cum_conv"),
    )
    import math as _math

    l1 = _math.log(SPRT_P1 / SPRT_P0)
    l0 = _math.log((1 - SPRT_P1) / (1 - SPRT_P0))
    llr = F.col("cum_conv") * l1 + (F.col("cum_users") - F.col("cum_conv")) * l0
    hi = _math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    lo = _math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    return cum.select(
        "day",
        "n_users",
        "cum_users",
        "cum_conv",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= hi, "accept_h1")
        .when(llr <= lo, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


# --------------------------------------------------------------------------
# Session sequence-pattern classification — MATCH_RECOGNIZE emulation.
# Spark has no MATCH_RECOGNIZE clause (Flink/Oracle do); the
# distributed equivalent is: sessionize, reduce each session to its
# ordered event-initial string (one char per event: c/e/p/s/v), and
# run ordinary regexps over that session-sized string. Each session's
# row-pattern predicate is then a scalar expression, and the
# cross-session rollup is a plain grouped count — the whole
# MATCH_RECOGNIZE surface at a per-session string cost.
#
# Patterns: full funnel (view ... click ... purchase, gaps allowed =
# PATTERN(V ANY* C ANY* P)), adjacent view->purchase (impulse
# conversion), and error-with-no-subsequent-purchase (interrupted).
#
# Scale: the only wide ops are the user-keyed sessionization window
# (same layout every session query shares) and a collect_list bounded
# by session length — sessions are gap-bounded, so per-group state is
# small by construction. The rollup output is <= 2^4 rows.
# --------------------------------------------------------------------------
@register(
    "ev_session_pattern_match",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             substr(event_type, 1, 1) AS initial,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, initial,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts)
                          > {SESSION_GAP_MIN} * 60
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    sess AS (
      SELECT user_id, ts, event_id, initial,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    strings AS (
      SELECT user_id, session_no,
             string_agg(initial, '' ORDER BY ts, event_id) AS s,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, session_no
    ),
    flagged AS (
      SELECT user_id, n_events,
             contains(s, 'p') AS converted,
             regexp_matches(s, 'v.*c.*p') AS full_funnel,
             contains(s, 'vp') AS direct_purchase,
             regexp_matches(s, 'e[^p]*$') AS error_interrupted
      FROM strings
    )
    SELECT converted, full_funnel, direct_purchase, error_interrupted,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM flagged GROUP BY 1, 2, 3, 4
    """,
)
def ev_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern (MATCH_RECOGNIZE-style) classification of
    {SESSION_GAP_MIN}-minute-gap sessions via per-session ordered
    initial strings and regexp predicates."""
    ev = table(spark, sf_dir, "events").withColumn(
        "initial", F.substring("event_type", 1, 1)
    )
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(seq).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(seq))
                > SESSION_GAP_MIN * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(seq.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    strings = sess.groupBy("user_id", "session_no").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "initial"))),
                lambda x: x["initial"],
            ),
        ).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    flagged = strings.select(
        "user_id",
        "n_events",
        F.col("s").contains("p").alias("converted"),
        F.col("s").rlike("v.*c.*p").alias("full_funnel"),
        F.col("s").contains("vp").alias("direct_purchase"),
        F.col("s").rlike("e[^p]*$").alias("error_interrupted"),
    )
    return flagged.groupBy(
        "converted", "full_funnel", "direct_purchase", "error_interrupted"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: per-user activity streaks. The classic SQL
# pattern — group a user's distinct active days into maximal runs of
# consecutive calendar days with the day_index - row_number trick
# (constant within a run, jumps at every gap), no self-join, no
# iteration. Output is the per-user streak profile (islands, longest
# streak, active days, span) — the engagement-consistency features a
# retention model consumes.
#
# Exactness: day indexes and row numbers are integers; every output
# is a BIGINT count/max. Scale: one user-keyed distinct + one
# user-keyed window — the same single-shuffle layout every session
# query shares; islands aggregate map-side after the grouping.
# --------------------------------------------------------------------------
@register(
    "ev_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2001-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS di
      FROM events
    ),
    tagged AS (
      SELECT user_id, di,
             di - row_number() OVER (PARTITION BY user_id ORDER BY di)
                 AS island
      FROM days
    ),
    islands AS (
      SELECT user_id, island,
             CAST(count(*) AS BIGINT) AS len,
             CAST(min(di) AS BIGINT) AS start_di,
             CAST(max(di) AS BIGINT) AS end_di
      FROM tagged GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days,
           CAST(max(end_di) - min(start_di) + 1 AS BIGINT) AS span_days
    FROM islands GROUP BY user_id
    """,
)
def ev_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal consecutive-day activity runs per user via the
    day-index-minus-row-number islands trick (one window, no joins)."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2001-01-01").cast("date")
        ).alias("di"),
    ).distinct()
    tagged = days.withColumn(
        "island",
        F.col("di")
        - F.row_number().over(W.partitionBy("user_id").orderBy("di")),
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("di").cast("bigint").alias("start_di"),
        F.max("di").cast("bigint").alias("end_di"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("active_days"),
        (F.max("end_di") - F.min("start_di") + 1).cast("bigint").alias("span_days"),
    )


# --------------------------------------------------------------------------
# Off-policy evaluation by replay — inverse-propensity scoring. The
# logged policy is the uniform md5 hash split (propensity exactly 1/2
# per arm — known by construction, the ideal IPS setting); the target
# policy is a deterministic rule ("users whose FIRST event is a view
# get A, everyone else B"). IPS reweights logged conversions of users
# whose logged arm AGREES with the target arm by 1/propensity; SNIPS
# self-normalizes away the weight to cut variance. This answers "what
# conversion rate WOULD the rule-based policy get?" from purely
# logged data — the counterfactual readout next to the factual z-test
# (ev_ab_proportion_ztest) and the causal panel (ev_did_estimate).
#
# Exactness: propensity is the rational 1/2; IPS/SNIPS are ratios of
# exact BIGINT counts (matched conversions, matched users), so no
# float enters until the final rounded report.
#
# Scale: one user-grain reduction (first event via min(struct), max
# purchase flag) — the same single-shuffle shape as the z-test; the
# policy arithmetic is a 1-row aggregate.
# --------------------------------------------------------------------------
@register(
    "ev_ips_policy_value",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             arg_min(event_type, ts || '|' ||
                     lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_event,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 'A' ELSE 'B' END AS logged_arm,
             CASE WHEN first_event = 'view' THEN 'A' ELSE 'B' END
                 AS target_arm,
             converted
      FROM per_user
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted,
             CAST(sum(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN logged_arm = target_arm THEN converted
                           ELSE 0 END) AS BIGINT) AS matched_conv
      FROM tagged
    )
    SELECT n_users, n_matched, n_converted, matched_conv,
           round(n_converted * 1.0 / n_users, 6) AS logged_value,
           round(2.0 * matched_conv / n_users, 6) AS ips_value,
           round(matched_conv * 1.0 / n_matched, 6) AS snips_value
    FROM counts
    """,
)
def ev_ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS and SNIPS estimates of the rule-based target policy's
    conversion value from the uniformly-logged hash split."""
    ev = table(spark, sf_dir, "events")
    first_key = F.concat(
        F.col("ts").cast("string"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min_by("event_type", first_key).alias("first_event"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    tagged = per_user.select(
        F.when(bucket % 2 == 0, "A").otherwise("B").alias("logged_arm"),
        F.when(F.col("first_event") == "view", "A").otherwise("B").alias(
            "target_arm"
        ),
        "converted",
    )
    matched = (F.col("logged_arm") == F.col("target_arm")).cast("bigint")
    counts = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.sum(matched).cast("bigint").alias("n_matched"),
        F.sum(matched * F.col("converted")).cast("bigint").alias("matched_conv"),
    )
    return counts.select(
        "n_users",
        "n_matched",
        "n_converted",
        "matched_conv",
        F.round(F.col("n_converted") * 1.0 / F.col("n_users"), 6).alias(
            "logged_value"
        ),
        F.round(2.0 * F.col("matched_conv") / F.col("n_users"), 6).alias(
            "ips_value"
        ),
        F.round(F.col("matched_conv") * 1.0 / F.col("n_matched"), 6).alias(
            "snips_value"
        ),
    )


# --------------------------------------------------------------------------
# Per-user engagement trend — an OLS slope of event value against the
# user's own event sequence index, one slope per user (the churn
# feature: negative slope = declining engagement). Unlike the global
# regressions (stat_price_qty_regression, stat_theil_sen_slope) this
# is a GROUPED regression: five integer moment sums per user in one
# map-side-combining aggregate after the sequence-index window — no
# per-user iteration, millions of regressions in one pass.
#
# Exactness: y quantizes to BIGINT cents, x is the 1-based row index;
# all five moments are exact integer sums; the slope is one scalar
# division per user, rounded once.
# --------------------------------------------------------------------------
EV_TREND_MIN_EVENTS = 5


@register(
    "ev_user_value_trend",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    mom AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM seq GROUP BY user_id
      HAVING count(*) >= {EV_TREND_MIN_EVENTS}
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy) * 1.0
                 / ((n * sxx - sx * sx) * 100.0), 6) AS slope_per_event,
           round(sy / (100.0 * n), 6) AS mean_value,
           CAST((n * sxy - sx * sy) < 0 AS BOOLEAN) AS declining
    FROM mom
    """,
)
def ev_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of event value over the user's sequence
    index (grouped regression from exact integer moments)."""
    ev = table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    mom = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
        .filter(F.col("n") >= EV_TREND_MIN_EVENTS)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.select(
        "user_id",
        "n",
        F.round(num * 1.0 / (den * 100.0), 6).alias("slope_per_event"),
        F.round(F.col("sy") / (100.0 * F.col("n")), 6).alias("mean_value"),
        (num < 0).alias("declining"),
    )


# --------------------------------------------------------------------------
# Doubly-robust ATE — the estimator an experimentation platform
# publishes when either the outcome model OR the propensity model may
# be misspecified: per-arm linear outcome models (y ~ pre-period
# views, closed-form OLS) combined with stratum-level empirical
# propensities (pre-view buckets), via the augmented-IPW form. With
# exact per-stratum sums the per-unit residual terms collapse
# algebraically to stratum totals, so the whole estimator is a
# dimension-sized combination of ONE user-grain reduction.
#
# Exactness: every input sum (counts, view/purchase sums, cross
# products) is an exact BIGINT; the OLS coefficients are fixed double
# expressions of them; the final sum over the ~5 strata folds a
# stratum-sorted array left-to-right so even that double addition has
# a fixed order in both engines.
# --------------------------------------------------------------------------
DR_STRATA_CAP = 4  # pre-view count buckets 0,1,2,3,4+


@register(
    "ev_doubly_robust_ate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'view'
                            AND ts < TIMESTAMP '{CUPED_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase'
                            AND ts >= TIMESTAMP '{CUPED_SPLIT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 1 ELSE 0 END AS t,
             x, y, least(x, {DR_STRATA_CAP}) AS s
      FROM per_user
    ),
    arm AS (
      SELECT t,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM tagged GROUP BY t
    ),
    model AS (
      SELECT
        max(CASE WHEN t = 1 THEN n_t END) AS n1,
        max(CASE WHEN t = 0 THEN n_t END) AS n0,
        max(CASE WHEN t = 1 THEN
          CASE WHEN n_t * sxx - sx * sx > 0
               THEN (n_t * 1.0 * sxy - sx * 1.0 * sy)
                    / (n_t * 1.0 * sxx - sx * 1.0 * sx)
               ELSE 0.0 END END) AS b1,
        max(CASE WHEN t = 0 THEN
          CASE WHEN n_t * sxx - sx * sx > 0
               THEN (n_t * 1.0 * sxy - sx * 1.0 * sy)
                    / (n_t * 1.0 * sxx - sx * 1.0 * sx)
               ELSE 0.0 END END) AS b0,
        max(CASE WHEN t = 1 THEN sy END) AS sy1,
        max(CASE WHEN t = 0 THEN sy END) AS sy0,
        max(CASE WHEN t = 1 THEN sx END) AS sx1,
        max(CASE WHEN t = 0 THEN sx END) AS sx0
      FROM arm
    ),
    coefs AS (
      SELECT n1, n0, b1, b0, sy1, sy0,
             (sy1 - b1 * sx1) / n1 AS a1,
             (sy0 - b0 * sx0) / n0 AS a0
      FROM model
    ),
    strat AS (
      SELECT s,
             CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(t) AS BIGINT) AS n1_s,
             CAST(sum(1 - t) AS BIGINT) AS n0_s,
             CAST(sum(x) AS BIGINT) AS sx_s,
             CAST(sum(t * x) AS BIGINT) AS sx1_s,
             CAST(sum((1 - t) * x) AS BIGINT) AS sx0_s,
             CAST(sum(t * y) AS BIGINT) AS sy1_s,
             CAST(sum((1 - t) * y) AS BIGINT) AS sy0_s
      FROM tagged GROUP BY s
    ),
    terms AS (
      SELECT s,
             n_s * (a1 - a0) + (b1 - b0) * sx_s
             + CASE WHEN n1_s > 0 AND n0_s > 0 THEN
                 (CAST(n_s AS DOUBLE) / n1_s)
                   * (sy1_s - n1_s * a1 - b1 * sx1_s)
                 - (CAST(n_s AS DOUBLE) / n0_s)
                   * (sy0_s - n0_s * a0 - b0 * sx0_s)
               ELSE 0.0 END AS term
      FROM strat, coefs
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY s)),
               (a, b) -> a + b) AS total
      FROM terms
    )
    SELECT n1 + n0 AS n_users,
           round(total / (n1 + n0), 6) AS ate_dr,
           round(sy1 * 1.0 / n1 - sy0 * 1.0 / n0, 6) AS ate_naive,
           round(b1, 6) AS slope_treated,
           round(b0, 6) AS slope_control
    FROM folded, coefs
    """,
)
def ev_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust (AIPW) average treatment effect of the md5-hash
    variant on post-period purchases, with per-arm linear outcome
    models over pre-period views and pre-view-bucket propensities."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            ((F.col("event_type") == "view") & (F.col("ts") < split)).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            (
                (F.col("event_type") == "purchase") & (F.col("ts") >= split)
            ).cast("int")
        )
        .cast("bigint")
        .alias("y"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    tagged = per_user.select(
        ((bucket % 2) == 0).cast("int").alias("t"),
        "x",
        "y",
        F.least(F.col("x"), F.lit(DR_STRATA_CAP)).alias("s"),
    ).persist()
    arm = tagged.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    slope = F.when(
        F.col("n_t") * F.col("sxx") - F.col("sx") * F.col("sx") > 0,
        (F.col("n_t") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
        / (F.col("n_t") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx")),
    ).otherwise(F.lit(0.0))
    model = arm.withColumn("b_t", slope).agg(
        F.max(F.when(F.col("t") == 1, F.col("n_t"))).alias("n1"),
        F.max(F.when(F.col("t") == 0, F.col("n_t"))).alias("n0"),
        F.max(F.when(F.col("t") == 1, F.col("b_t"))).alias("b1"),
        F.max(F.when(F.col("t") == 0, F.col("b_t"))).alias("b0"),
        F.max(F.when(F.col("t") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("t") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("t") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("t") == 0, F.col("sx"))).alias("sx0"),
    )
    coefs = model.select(
        "n1",
        "n0",
        "b1",
        "b0",
        "sy1",
        "sy0",
        ((F.col("sy1") - F.col("b1") * F.col("sx1")) / F.col("n1")).alias("a1"),
        ((F.col("sy0") - F.col("b0") * F.col("sx0")) / F.col("n0")).alias("a0"),
    )
    strat = tagged.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("t").cast("bigint").alias("n1_s"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n0_s"),
        F.sum("x").cast("bigint").alias("sx_s"),
        F.sum(F.col("t") * F.col("x")).cast("bigint").alias("sx1_s"),
        F.sum((F.lit(1) - F.col("t")) * F.col("x")).cast("bigint").alias("sx0_s"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sy1_s"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("bigint").alias("sy0_s"),
    )
    term = (
        F.col("n_s") * (F.col("a1") - F.col("a0"))
        + (F.col("b1") - F.col("b0")) * F.col("sx_s")
        + F.when(
            (F.col("n1_s") > 0) & (F.col("n0_s") > 0),
            (F.col("n_s").cast("double") / F.col("n1_s"))
            * (
                F.col("sy1_s")
                - F.col("n1_s") * F.col("a1")
                - F.col("b1") * F.col("sx1_s")
            )
            - (F.col("n_s").cast("double") / F.col("n0_s"))
            * (
                F.col("sy0_s")
                - F.col("n0_s") * F.col("a0")
                - F.col("b0") * F.col("sx0_s")
            ),
        ).otherwise(F.lit(0.0))
    )
    terms = strat.crossJoin(F.broadcast(coefs)).select(
        "s", term.alias("term"), "n1", "n0", "sy1", "sy0", "b1", "b0"
    )
    folded = terms.groupBy("n1", "n0", "sy1", "sy0", "b1", "b0").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("s", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("total")
    )
    return folded.select(
        (F.col("n1") + F.col("n0")).alias("n_users"),
        F.round(F.col("total") / (F.col("n1") + F.col("n0")), 6).alias(
            "ate_dr"
        ),
        F.round(
            F.col("sy1") * 1.0 / F.col("n1")
            - F.col("sy0") * 1.0 / F.col("n0"),
            6,
        ).alias("ate_naive"),
        F.round("b1", 6).alias("slope_treated"),
        F.round("b0", 6).alias("slope_control"),
    )


# --------------------------------------------------------------------------
# Qini / uplift-by-decile curve — the targeting-model evaluation an
# experimentation platform runs on top of its A/B machinery: users
# deciled by a targeting score (activity volume), and within each
# decile the INCREMENTAL conversion of treated over control, plus the
# cumulative Qini statistic Q(k) = convT_cum - convC_cum * nT_cum /
# nC_cum. A flat uplift curve says the score does not identify
# persuadable users; Qini's area is the standard uplift model metric.
#
# Scale shape: one user-grain reduction, decile assignment through
# global_ntile (range-partitioned offset ranking — never a global
# ntile window), then a 10-row rollup with a triangular cumulative
# join. Exactness: every output is BIGINT — the uplift rate and the
# Qini statistic ship as exact integer rationals (num/den via
# cross-multiplication), so no double division or rounding exists
# anywhere in either engine (uplift = uplift_num/uplift_den, Qini =
# qini_num/qini_den; hardened after a driver-side hash contest on the
# float-rounded variant that never reproduced locally).
# --------------------------------------------------------------------------
QINI_TILES = 10


@register(
    "ev_qini_uplift",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT user_id, n_events, converted,
             CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 1 ELSE 0 END AS t
      FROM per_user
    ),
    tiled AS (
      SELECT t, converted,
             ntile({QINI_TILES}) OVER (ORDER BY n_events DESC, user_id)
                 AS tile
      FROM tagged
    ),
    per_tile AS (
      SELECT tile,
             CAST(sum(t) AS BIGINT) AS n_t,
             CAST(sum(1 - t) AS BIGINT) AS n_c,
             CAST(sum(t * converted) AS BIGINT) AS conv_t,
             CAST(sum((1 - t) * converted) AS BIGINT) AS conv_c
      FROM tiled GROUP BY tile
    )
    SELECT CAST(p.tile AS INTEGER) AS tile,
           p.n_t, p.n_c, p.conv_t, p.conv_c,
           CAST(p.conv_t * p.n_c - p.conv_c * p.n_t AS BIGINT)
               AS uplift_num,
           CAST(p.n_t * p.n_c AS BIGINT) AS uplift_den,
           CAST(CAST(sum(p2.conv_t) AS BIGINT)
                  * CAST(sum(p2.n_c) AS BIGINT)
                - CAST(sum(p2.conv_c) AS BIGINT)
                  * CAST(sum(p2.n_t) AS BIGINT) AS BIGINT) AS qini_num,
           CAST(sum(p2.n_c) AS BIGINT) AS qini_den
    FROM per_tile p JOIN per_tile p2 ON p2.tile <= p.tile
    GROUP BY p.tile, p.n_t, p.n_c, p.conv_t, p.conv_c
    """,
)
def ev_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift and cumulative Qini by activity-score decile for the
    md5-hash treatment assignment."""
    from ..functions.ranking import global_ntile

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "converted"
        ),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    tagged = per_user.select(
        "user_id",
        "n_events",
        "converted",
        ((bucket % 2) == 0).cast("int").alias("t"),
    )
    tiled = global_ntile(
        tagged,
        [F.col("n_events").desc(), F.col("user_id")],
        QINI_TILES,
        "tile",
    )
    per_tile = (
        tiled.groupBy("tile")
        .agg(
            F.sum("t").cast("bigint").alias("n_t"),
            F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n_c"),
            F.sum(F.col("t") * F.col("converted"))
            .cast("bigint")
            .alias("conv_t"),
            F.sum((F.lit(1) - F.col("t")) * F.col("converted"))
            .cast("bigint")
            .alias("conv_c"),
        )
        .persist()
    )
    p, p2 = per_tile.alias("p"), per_tile.alias("p2")
    return (
        p.join(F.broadcast(p2), F.col("p2.tile") <= F.col("p.tile"))
        .groupBy("p.tile", "p.n_t", "p.n_c", "p.conv_t", "p.conv_c")
        .agg(
            F.sum("p2.conv_t").cast("bigint").alias("ct_cum"),
            F.sum("p2.conv_c").cast("bigint").alias("cc_cum"),
            F.sum("p2.n_t").cast("bigint").alias("nt_cum"),
            F.sum("p2.n_c").cast("bigint").alias("nc_cum"),
        )
        .select(
            F.col("tile").cast("int").alias("tile"),
            "n_t",
            "n_c",
            "conv_t",
            "conv_c",
            (
                F.col("conv_t") * F.col("n_c")
                - F.col("conv_c") * F.col("n_t")
            )
            .cast("bigint")
            .alias("uplift_num"),
            (F.col("n_t") * F.col("n_c")).cast("bigint").alias("uplift_den"),
            (
                F.col("ct_cum") * F.col("nc_cum")
                - F.col("cc_cum") * F.col("nt_cum")
            )
            .cast("bigint")
            .alias("qini_num"),
            F.col("nc_cum").alias("qini_den"),
        )
    )


# --------------------------------------------------------------------------
# Synthetic control — the observational-causal companion to the DiD
# estimator: reconstruct the treated region's PRE-period daily
# revenue as an affine combination of two donor regions (closed-form
# centered OLS, the ml_ridge_path machinery at lambda=0), then read
# the average post-period gap between actual and synthetic as the
# treatment effect. The whole estimator is TWO aggregates over the
# calendar-bounded 3-region daily relation: one pre-period moment
# pass, one post-period sum pass (the synthetic series is linear, so
# its post-period mean needs only the donor column sums).
#
# Exactness: daily cents are BIGINT; cross-moment sums run in
# decimal(38)/HUGEINT with one deterministic rounding to double; the
# 2x2 solve, intercept, pre-R^2 and ATT are fixed double expressions.
# --------------------------------------------------------------------------
SC_TREATED = "ASIA"
SC_DONOR_A = "EUROPE"
SC_DONOR_B = "AMERICA"
SC_SPLIT = "1996-01-01"


@register(
    "ev_synthetic_control",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CASE WHEN r_name = '{SC_TREATED}'
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y,
             CAST(sum(CASE WHEN r_name = '{SC_DONOR_A}'
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN r_name = '{SC_DONOR_B}'
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x2
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('{SC_TREATED}', '{SC_DONOR_A}', '{SC_DONOR_B}')
      GROUP BY 1
    ),
    pre AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1) AS BIGINT) AS s1,
             CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM daily WHERE day < DATE '{SC_SPLIT}'
    ),
    post AS (
      SELECT CAST(count(*) AS BIGINT) AS n_p,
             CAST(sum(y) AS BIGINT) AS sy_p,
             CAST(sum(x1) AS BIGINT) AS s1_p,
             CAST(sum(x2) AS BIGINT) AS s2_p
      FROM daily WHERE day >= DATE '{SC_SPLIT}'
    ),
    cen AS (
      SELECT n,
             s11 - (s1 * 1.0 / n) * s1 AS c11,
             s12 - (s1 * 1.0 / n) * s2 AS c12,
             s22 - (s2 * 1.0 / n) * s2 AS c22,
             s1y - (s1 * 1.0 / n) * sy AS c1y,
             s2y - (s2 * 1.0 / n) * sy AS c2y,
             syy - (sy * 1.0 / n) * sy AS cyy,
             s1 * 1.0 / n AS m1, s2 * 1.0 / n AS m2, sy * 1.0 / n AS my
      FROM pre
    ),
    fit AS (
      SELECT n, cyy, c1y, c2y, m1, m2, my,
             (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS w1,
             (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS w2
      FROM cen
    )
    SELECT n AS n_pre_days, n_p AS n_post_days,
           round(w1, 6) AS w_{SC_DONOR_A.lower()},
           round(w2, 6) AS w_{SC_DONOR_B.lower()},
           round((my - w1 * m1 - w2 * m2) / 100.0, 4) AS intercept_usd,
           round((w1 * c1y + w2 * c2y) / cyy, 6) AS pre_r2,
           round((sy_p - (my - w1 * m1 - w2 * m2) * n_p
                  - w1 * s1_p - w2 * s2_p) / (100.0 * n_p), 4)
               AS att_daily_usd
    FROM fit, post
    """,
)
def ev_synthetic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-control ATT for {SC_TREATED} daily revenue with
    {SC_DONOR_A}/{SC_DONOR_B} donors, split at {SC_SPLIT}."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin(SC_TREATED, SC_DONOR_A, SC_DONOR_B))
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("r_name") == SC_TREATED, cents).otherwise(0))
            .cast("bigint")
            .alias("y"),
            F.sum(F.when(F.col("r_name") == SC_DONOR_A, cents).otherwise(0))
            .cast("bigint")
            .alias("x1"),
            F.sum(F.when(F.col("r_name") == SC_DONOR_B, cents).otherwise(0))
            .cast("bigint")
            .alias("x2"),
        )
        .persist()
    )
    split = F.lit(SC_SPLIT).cast("date")
    d1 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pre = daily.filter(F.col("day") < split).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(d1("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(d1("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(d1("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(d1("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(d1("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(d1("y") * F.col("y")).cast("double").alias("syy"),
    )
    post = daily.filter(F.col("day") >= split).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p"),
        F.sum("y").cast("bigint").alias("sy_p"),
        F.sum("x1").cast("bigint").alias("s1_p"),
        F.sum("x2").cast("bigint").alias("s2_p"),
    )
    n = F.col("n")
    cen = pre.select(
        "n",
        (F.col("s11") - (F.col("s1") * 1.0 / n) * F.col("s1")).alias("c11"),
        (F.col("s12") - (F.col("s1") * 1.0 / n) * F.col("s2")).alias("c12"),
        (F.col("s22") - (F.col("s2") * 1.0 / n) * F.col("s2")).alias("c22"),
        (F.col("s1y") - (F.col("s1") * 1.0 / n) * F.col("sy")).alias("c1y"),
        (F.col("s2y") - (F.col("s2") * 1.0 / n) * F.col("sy")).alias("c2y"),
        (F.col("syy") - (F.col("sy") * 1.0 / n) * F.col("sy")).alias("cyy"),
        (F.col("s1") * 1.0 / n).alias("m1"),
        (F.col("s2") * 1.0 / n).alias("m2"),
        (F.col("sy") * 1.0 / n).alias("my"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    fit = cen.select(
        "n", "cyy", "c1y", "c2y", "m1", "m2", "my",
        ((F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det).alias("w1"),
        ((F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det).alias("w2"),
    )
    icept = F.col("my") - F.col("w1") * F.col("m1") - F.col("w2") * F.col("m2")
    return fit.crossJoin(F.broadcast(post)).select(
        F.col("n").alias("n_pre_days"),
        F.col("n_p").alias("n_post_days"),
        F.round("w1", 6).alias(f"w_{SC_DONOR_A.lower()}"),
        F.round("w2", 6).alias(f"w_{SC_DONOR_B.lower()}"),
        F.round(icept / 100.0, 4).alias("intercept_usd"),
        F.round(
            (F.col("w1") * F.col("c1y") + F.col("w2") * F.col("c2y"))
            / F.col("cyy"),
            6,
        ).alias("pre_r2"),
        F.round(
            (
                F.col("sy_p")
                - icept * F.col("n_p")
                - F.col("w1") * F.col("s1_p")
                - F.col("w2") * F.col("s2_p")
            )
            / (100.0 * F.col("n_p")),
            4,
        ).alias("att_daily_usd"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution — credit each purchase to the user's most
# recent non-purchase interaction within a 3-day lookback (interval
# arithmetic on the NTZ timestamps — timezone-free in both engines;
# else 'direct'), then roll credited purchase counts and credited
# value up per channel. The marketing-analytics staple a behavioral pipeline
# ships next to its funnel: the funnel says WHERE users drop, this
# says WHICH interaction gets revenue credit.
#
# Scale shape: ONE user-keyed window (ordered by ts, event_id) carries
# the last non-purchase (ts, type) forward via last(ignorenulls) —
# no self-join of purchases against events; then a 6-row channel
# rollup. Purchase value quantizes to cents BEFORE the channel sum so
# the credited-value totals are exact under any shuffle order.
# --------------------------------------------------------------------------


@register(
    "ev_last_touch_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS prev_ts,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type
                             END IGNORE NULLS) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    credited AS (
      SELECT CASE WHEN prev_ts IS NOT NULL
                   AND ts - prev_ts <= INTERVAL 3 DAY
                  THEN prev_type ELSE 'direct' END AS channel,
             cents
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(cents) / 100.0, 2) AS credited_value
    FROM credited GROUP BY channel
    """,
)
def ev_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch channel attribution of purchases (3-day lookback,
    'direct' when no prior interaction qualifies)."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    nonp_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    nonp_type = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.last(nonp_ts, ignorenulls=True).over(w).alias("prev_ts"),
        F.last(nonp_type, ignorenulls=True).over(w).alias("prev_type"),
    )
    credited = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prev_ts").isNotNull()
            & (
                F.col("ts") - F.col("prev_ts")
                <= F.expr("INTERVAL 3 DAYS")
            ),
            F.col("prev_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "cents",
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(F.sum("cents") / 100.0, 2).alias("credited_value"),
    )


# --------------------------------------------------------------------------
# Repeat-purchase rate per brand — of the (customer, part) purchase
# events, what share see the SAME customer reorder the SAME part
# within 30 / 90 days? The retention-merchandising readout (which
# brands are replenishment goods vs one-offs) that prices retargeting
# spend.
#
# Scale shape: one (custkey, partkey)-keyed window (ordered by order
# date + orderkey tiebreak) computes each purchase's gap to the next
# same-pair purchase; the brand rollup is a broadcast part join +
# conditional counts. Exact integer day gaps and counts throughout.
# --------------------------------------------------------------------------
@register(
    "ev_repeat_purchase_rate",
    oracle="""
    WITH purchases AS (
      SELECT o_custkey AS cust, l_partkey AS part,
             CAST(o_orderdate AS DATE) AS d, o_orderkey AS ok
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    gaps AS (
      SELECT cust, part,
             date_diff('day', d,
               lead(d) OVER (PARTITION BY cust, part
                             ORDER BY d, ok)) AS gap_days
      FROM purchases
    ),
    labeled AS (
      SELECT g.part, g.gap_days FROM gaps g
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN gap_days IS NOT NULL
                         AND gap_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS repeats_30d,
           CAST(sum(CASE WHEN gap_days IS NOT NULL
                         AND gap_days <= 90 THEN 1 ELSE 0 END) AS BIGINT)
               AS repeats_90d,
           round(sum(CASE WHEN gap_days IS NOT NULL
                          AND gap_days <= 30 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS repeat_rate_30d,
           round(sum(CASE WHEN gap_days IS NOT NULL
                          AND gap_days <= 90 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS repeat_rate_90d
    FROM labeled JOIN part ON part = p_partkey
    GROUP BY p_brand
    """,
)
def ev_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of purchases re-ordered by the same customer within
    30/90 days, per brand."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    purchases = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("cust"),
        F.col("l_partkey").alias("part"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.col("o_orderkey").alias("ok"),
    )
    w = W.partitionBy("cust", "part").orderBy("d", "ok")
    gaps = purchases.select(
        "part",
        F.datediff(F.lead("d").over(w), F.col("d")).alias("gap_days"),
    )
    rep = lambda days: F.sum(  # noqa: E731
        (
            F.col("gap_days").isNotNull() & (F.col("gap_days") <= days)
        ).cast("int")
    )
    return (
        gaps.join(F.broadcast(part), gaps.part == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            rep(30).cast("bigint").alias("repeats_30d"),
            rep(90).cast("bigint").alias("repeats_90d"),
            F.round(rep(30) * 1.0 / F.count(F.lit(1)), 6).alias(
                "repeat_rate_30d"
            ),
            F.round(rep(90) * 1.0 / F.count(F.lit(1)), 6).alias(
                "repeat_rate_90d"
            ),
        )
    )


# --------------------------------------------------------------------------
# Cohort net revenue retention (NRR) — for each first-purchase
# cohort, quarter over quarter: of the customers who spent in quarter
# q-1, what fraction of that revenue do the SAME customers spend in
# q? The SaaS-finance staple that separates expansion from churn —
# the revenue-weighted companion to ev_retention_cohorts' user
# counts.
#
# Scale shape: one (customer, quarter) revenue rollup, a cohort-min
# reduction, then a q->q+1 self-join on the (customer, quarter) grain
# (equi-join on the arithmetic quarter index — no window, no
# calendar table). Exact BIGINT cents; NRR is one fixed ratio.
# --------------------------------------------------------------------------
@register(
    "fin_cohort_nrr",
    oracle="""
    WITH cq AS (
      SELECT o_custkey AS cust,
             CAST(year(CAST(o_orderdate AS DATE)) * 4
                  + quarter(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS qi,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1, 2
    ),
    cohort AS (SELECT cust, CAST(min(qi) AS BIGINT) AS c0 FROM cq GROUP BY cust),
    pairs AS (
      SELECT p.cust, c.c0, p.qi + 1 AS qi,
             p.cents AS prev_cents,
             CAST(coalesce(n.cents, 0) AS BIGINT) AS cur_cents
      FROM cq p
      JOIN cohort c ON c.cust = p.cust
      LEFT JOIN cq n ON n.cust = p.cust AND n.qi = p.qi + 1
    )
    SELECT CAST(c0 // 4 AS BIGINT) * 100 + (c0 % 4 + 1) AS cohort_q,
           CAST(qi // 4 AS BIGINT) * 100 + (qi % 4 + 1) AS quarter,
           CAST(count(*) AS BIGINT) AS n_base,
           round(sum(prev_cents) / 100.0, 2) AS base_revenue,
           round(sum(cur_cents) / 100.0, 2) AS retained_revenue,
           round(sum(cur_cents) * 1.0 / sum(prev_cents), 6) AS nrr
    FROM pairs GROUP BY c0, qi
    """,
)
def fin_cohort_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter net revenue retention per first-purchase
    cohort (yyyyqq keys: e.g. 199302 = 1993 Q2)."""
    orders = table(spark, sf_dir, "orders")
    qi = (
        F.year(F.col("o_orderdate").cast("date")) * 4
        + F.quarter(F.col("o_orderdate").cast("date"))
        - 1
    ).cast("bigint")
    cq = orders.groupBy(
        F.col("o_custkey").alias("cust"), qi.alias("qi")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).persist()
    cohort = cq.groupBy("cust").agg(F.min("qi").cast("bigint").alias("c0"))
    p, n = cq.alias("p"), cq.alias("n")
    pairs = (
        p.join(cohort, "cust")
        .join(
            n,
            (F.col("n.cust") == F.col("p.cust"))
            & (F.col("n.qi") == F.col("p.qi") + 1),
            "left",
        )
        .select(
            "c0",
            (F.col("p.qi") + 1).alias("qi"),
            F.col("p.cents").alias("prev_cents"),
            F.coalesce(F.col("n.cents"), F.lit(0))
            .cast("bigint")
            .alias("cur_cents"),
        )
    )
    qlabel = lambda c: (  # noqa: E731
        (F.col(c) / 4).cast("bigint") * 100 + (F.col(c) % 4 + 1)
    )
    return pairs.groupBy("c0", "qi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        F.round(F.sum("prev_cents") / 100.0, 2).alias("base_revenue"),
        F.round(F.sum("cur_cents") / 100.0, 2).alias("retained_revenue"),
        F.round(F.sum("cur_cents") * 1.0 / F.sum("prev_cents"), 6).alias(
            "nrr"
        ),
    ).select(
        qlabel("c0").alias("cohort_q"),
        qlabel("qi").alias("quarter"),
        "n_base",
        "base_revenue",
        "retained_revenue",
        "nrr",
    )


# --------------------------------------------------------------------------
# Conversion-window sensitivity — the funnel's conversion rate as a
# FUNCTION of the attribution window (1h / 1d / 3d / 7d): the design
# choice every growth team argues about, answered from one relation
# (how much "conversion" is really just long-delay noise?).
#
# Scale shape: one user-grain reduction for the first view, one
# fact-to-aggregate equi-join to find the first purchase at or after
# it, then ONE conditional aggregate stacked across the four interval
# literals. Interval arithmetic on NTZ timestamps (timezone-free in
# both engines); all counts exact.
# --------------------------------------------------------------------------
CONV_WINDOWS = (("1h", "1 HOUR"), ("1d", "1 DAY"), ("3d", "3 DAY"), ("7d", "7 DAY"))


@register(
    "ev_conversion_window_sensitivity",
    oracle=f"""
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT f.user_id, f.first_view, min(e.ts) AS first_purchase
      FROM fv f LEFT JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts >= f.first_view
      GROUP BY f.user_id, f.first_view
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_viewers,
             {", ".join(
                 f"CAST(sum(CASE WHEN first_purchase IS NOT NULL AND "
                 f"first_purchase - first_view <= INTERVAL {iv} "
                 f"THEN 1 ELSE 0 END) AS BIGINT) AS c_{lbl}"
                 for lbl, iv in CONV_WINDOWS)}
      FROM fp
    )
    {" UNION ALL ".join(
        f"SELECT '{lbl}' AS attribution_window, n_viewers,"
        f" c_{lbl} AS n_converted,"
        f" round(c_{lbl} * 1.0 / n_viewers, 6) AS conversion_rate"
        f" FROM counts"
        for lbl, _ in CONV_WINDOWS)}
    """,
)
def ev_conversion_window_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """View->purchase conversion rate at 1h/1d/3d/7d attribution
    windows."""
    ev = table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    fp = (
        fv.join(
            p,
            (F.col("pu") == F.col("user_id"))
            & (F.col("pts") >= F.col("first_view")),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("pts").alias("first_purchase"))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_viewers")]
    for lbl, iv in CONV_WINDOWS:
        aggs.append(
            F.sum(
                (
                    F.col("first_purchase").isNotNull()
                    & (
                        F.col("first_purchase") - F.col("first_view")
                        <= F.expr(f"INTERVAL {iv}")
                    )
                ).cast("int")
            )
            .cast("bigint")
            .alias(f"c_{lbl}")
        )
    counts = fp.agg(*aggs)
    # One-row aggregate fanned out with a single reference (a union of
    # per-window selects would re-run the first-view/first-purchase
    # join once per attribution window).
    return explode_branches(
        counts,
        [
            F.struct(
                F.lit(lbl).alias("attribution_window"),
                F.col("n_viewers"),
                F.col(f"c_{lbl}").alias("n_converted"),
                F.round(
                    F.col(f"c_{lbl}") * 1.0 / F.col("n_viewers"), 6
                ).alias("conversion_rate"),
            )
            for lbl, _ in CONV_WINDOWS
        ],
    )


# --------------------------------------------------------------------------
# Lorenz curve by customer-revenue decile — the distribution curve
# behind stat_revenue_gini's single number: decile d's share and
# cumulative share of total revenue, customer-count weighted. The
# account-concentration report ("the top decile is 40% of revenue")
# sales ops reads directly.
#
# Scale shape: one customer-grain reduction, global_ntile decile
# assignment (range-partitioned — never a global ntile window), a
# 10-row rollup and triangular cumulative join. Exact cents.
# --------------------------------------------------------------------------
LORENZ_TILES = 10


@register(
    "ev_lorenz_deciles",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT cents, ntile({LORENZ_TILES}) OVER (
               ORDER BY cents, o_custkey) AS tile
      FROM per_cust
    ),
    per_tile AS (
      SELECT tile, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM tiled GROUP BY tile
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_tile)
    SELECT CAST(t.tile AS INTEGER) AS tile, t.n_customers,
           round(t.cents / 100.0, 2) AS revenue,
           round(t.cents * 1.0 / tot.total, 6) AS share,
           round(sum(t2.cents) * 1.0 / tot.total, 6) AS cum_share
    FROM per_tile t JOIN per_tile t2 ON t2.tile <= t.tile, tot
    GROUP BY t.tile, t.n_customers, t.cents, tot.total
    """,
)
def ev_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve (share + cumulative share of revenue) by customer
    revenue decile, poorest decile first."""
    from ..functions.ranking import global_ntile

    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tiled = global_ntile(
        per_cust, [F.col("cents"), F.col("o_custkey")], LORENZ_TILES, "tile"
    )
    per_tile = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("cents"),
    ).persist()
    tot = per_tile.agg(F.sum("cents").cast("bigint").alias("total"))
    t, t2 = per_tile.alias("t"), per_tile.alias("t2")
    return (
        t.join(F.broadcast(t2), F.col("t2.tile") <= F.col("t.tile"))
        .groupBy("t.tile", "t.n_customers", "t.cents")
        .agg(F.sum("t2.cents").cast("bigint").alias("cum_cents"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("tile").cast("int").alias("tile"),
            "n_customers",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") * 1.0 / F.col("total"), 6).alias("share"),
            F.round(F.col("cum_cents") * 1.0 / F.col("total"), 6).alias(
                "cum_share"
            ),
        )
    )


# --------------------------------------------------------------------------
# Time-to-convert percentiles per A/B variant — p50/p90 of the delay
# between a user's first view and first subsequent purchase, split by
# the md5 hash variant: the latency companion to the conversion-rate
# z-test (a variant can win on rate and lose on time-to-value).
#
# Exactness: delays are exact integer epoch-microsecond differences;
# percentiles interpolate identically cross-engine (Spark percentile
# == DuckDB quantile_cont) on that integer grid.
# --------------------------------------------------------------------------
@register(
    "ev_time_to_convert_percentiles",
    oracle=f"""
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT f.user_id, f.first_view, min(e.ts) AS first_purchase
      FROM fv f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts >= f.first_view
      GROUP BY f.user_id, f.first_view
    ),
    delays AS (
      SELECT CASE WHEN (CASE substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        {" ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))}
                        END) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             epoch_us(first_purchase) - epoch_us(first_view) AS delay_us
      FROM fp
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_converters,
           round(quantile_cont(delay_us, 0.5) / 3600e6, 6) AS p50_hours,
           round(quantile_cont(delay_us, 0.9) / 3600e6, 6) AS p90_hours
    FROM delays GROUP BY variant
    """,
)
def ev_time_to_convert_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p50/p90 first-view -> first-purchase delay per hash variant."""
    ev = table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    fp = (
        fv.join(
            p,
            (F.col("pu") == F.col("user_id"))
            & (F.col("pts") >= F.col("first_view")),
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("pts").alias("first_purchase"))
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    # NTZ timestamps: the delay must be timezone-free, so derive it
    # from the day-time INTERVAL (first_purchase - first_view) itself —
    # never a to_utc_timestamp round-trip, which is only correct when
    # the session timezone is UTC and would shift DST-straddling delays
    # under a user-built session. CAST(interval AS BIGINT) truncates to
    # whole seconds; extract(SECOND) carries the exact fractional
    # microseconds as decimal(8,6); their recombination is exact for
    # the non-negative delays the join guarantees (pts >= first_view).
    iv = F.col("first_purchase") - F.col("first_view")
    delay_us = iv.cast("bigint") * F.lit(1000000).cast("bigint") + (
        (F.expr("extract(SECOND FROM (first_purchase - first_view))") * 1000000)
        .cast("bigint")
        % 1000000
    )
    delays = fp.select(
        F.when((bucket % 2) == 0, "A").otherwise("B").alias("variant"),
        delay_us.alias("delay_us"),
    )
    return delays.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.round(F.percentile("delay_us", F.lit(0.5)) / 3600e6, 6).alias(
            "p50_hours"
        ),
        F.round(F.percentile("delay_us", F.lit(0.9)) / 3600e6, 6).alias(
            "p90_hours"
        ),
    )


# --------------------------------------------------------------------------
# Round-6 attribution batch: the three remaining industry-standard
# multi-touch models, completing the family next to linear
# (ev_attribution_linear), last-touch (ev_last_touch_attribution) and
# Markov removal-effect (ev_markov_*). All three share the linear
# model's scale shape — one time-range join (purchase x trailing-window
# touches, co-partitioned on user_id), per-purchase window credit
# arithmetic in exact integers, dimension-sized channel rollup — and
# the repo's exactness rule: no float division before the final
# display-rounding column.
#
# Channels here are ALL non-purchase event types (view/click/signup/
# error), not just view/click: Shapley and position models are about
# comparing channels, so the full set is the interesting input.
# --------------------------------------------------------------------------
SHAPLEY_LCM = 12  # lcm(1..4): 4 channels -> |S| in 1..4 divides 12


@register(
    "ev_shapley_attribution",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    touched AS (
      SELECT DISTINCT p.purchase_id, t.event_type
      FROM purchases p
      JOIN events t
        ON t.user_id = p.user_id
       AND t.event_type <> 'purchase'
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
    ),
    credited AS (
      SELECT purchase_id, event_type,
             {SHAPLEY_LCM} // count(*) OVER (PARTITION BY purchase_id)
                 AS credit_twelfths
      FROM touched
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(credit_twelfths) AS BIGINT) AS credit_twelfths_total,
           round(CAST(sum(credit_twelfths) AS DOUBLE) / {SHAPLEY_LCM}, 6)
               AS credit
    FROM credited
    GROUP BY event_type
    """,
)
def ev_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution over channel PRESENCE sets.

    Each purchase's coalition is the set S of distinct channels touched
    in the trailing window; under the standard symmetric one-conversion
    game (v(T)=1 iff T intersects S) every member's Shapley value is
    exactly 1/|S|. With 4 possible channels, |S| divides 12, so credits
    are exact integer twelfths — no float division anywhere.

    Differs from ev_attribution_linear (per-TOUCH credit: a channel
    with 3 touches earns 3/n) — Shapley is per-CHANNEL: presence earns
    1/|S| regardless of frequency.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    touched = (
        purchases.join(
            touches,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            ),
        )
        .select("purchase_id", "event_type")
        .distinct()
    )
    credited = touched.withColumn(
        "credit_twelfths",
        F.expr(f"{SHAPLEY_LCM} DIV count(*) OVER (PARTITION BY purchase_id)"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("credit_twelfths").cast("bigint").alias("credit_twelfths_total"),
        F.round(
            F.sum("credit_twelfths").cast("double") / SHAPLEY_LCM, 6
        ).alias("credit"),
    )


# Position-based (U-shaped) attribution: 40% first touch, 40% last
# touch, 20% split evenly across the middle. Middle credit uses
# floor-division micro-units (200000 DIV (n-2)) — deterministic and
# identical cross-engine; the flooring remainder is deliberately
# dropped, never redistributed (documented display convention).
POS_MICRO = 1_000_000
POS_ENDS = 400_000
POS_MID_POOL = 200_000


@register(
    "ev_position_based_attribution",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    paired AS (
      SELECT p.purchase_id, t.event_id AS touch_id, t.event_type,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY t.ts, t.event_id) AS pos,
             count(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM purchases p
      JOIN events t
        ON t.user_id = p.user_id
       AND t.event_type <> 'purchase'
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
    ),
    credited AS (
      SELECT purchase_id, event_type,
             CASE
               WHEN n = 1 THEN {POS_MICRO}
               WHEN pos = 1 OR pos = n THEN
                 CASE WHEN n = 2 THEN {POS_MICRO} // 2 ELSE {POS_ENDS} END
               ELSE {POS_MID_POOL} // (n - 2)
             END AS credit_micro
      FROM paired
    )
    SELECT event_type,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total,
           round(CAST(sum(credit_micro) AS DOUBLE) / {POS_MICRO}, 6)
               AS credit
    FROM credited
    GROUP BY event_type
    """,
)
def ev_position_based_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U-shaped (40/20/40) positional attribution with exact
    floor-division micro-credits; total order within a purchase is
    (ts, event_id) so both engines rank identically."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    w = W.partitionBy("purchase_id")
    paired = (
        purchases.join(
            touches,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            ),
        )
        .select("purchase_id", "touch_id", "t_ts", "event_type")
        .withColumn(
            "pos", F.row_number().over(w.orderBy("t_ts", "touch_id"))
        )
        .withColumn("n", F.count(F.lit(1)).over(w))
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(POS_MICRO))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
            F.when(F.col("n") == 2, F.lit(POS_MICRO // 2)).otherwise(
                F.lit(POS_ENDS)
            ),
        )
        .otherwise(
            F.expr(f"CAST({POS_MID_POOL} AS BIGINT) DIV (n - 2)")
        )
        .cast("bigint")
    )
    return (
        paired.withColumn("credit_micro", credit)
        .groupBy("event_type")
        .agg(
            F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_micro").cast("bigint").alias("credit_micro_total"),
            F.round(
                F.sum("credit_micro").cast("double") / POS_MICRO, 6
            ).alias("credit"),
        )
    )


# Time-decay attribution with a 1-day half-life over the 7-day window:
# a touch aged d whole days carries weight 2^(7-d) — exact powers of
# two, so per-purchase shares are integer-ratio and the micro-credit
# floor division is deterministic cross-engine. Whole-day age comes
# from NTZ interval seconds (never a to_utc_timestamp round-trip).
DECAY_MICRO = 1_000_000


@register(
    "ev_time_decay_attribution",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    paired AS (
      SELECT p.purchase_id, t.event_type,
             (epoch_us(p.ts) - epoch_us(t.ts)) // 86400000000 AS age_days
      FROM purchases p
      JOIN events t
        ON t.user_id = p.user_id
       AND t.event_type <> 'purchase'
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
    ),
    weighted AS (
      SELECT purchase_id, event_type,
             CAST(1 AS BIGINT) << (7 - age_days) AS w
      FROM paired
    ),
    credited AS (
      SELECT purchase_id, event_type,
             (w * {DECAY_MICRO}) // sum(w) OVER (PARTITION BY purchase_id)
                 AS credit_micro
      FROM weighted
    )
    SELECT event_type,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total,
           round(CAST(sum(credit_micro) AS DOUBLE) / {DECAY_MICRO}, 6)
               AS credit
    FROM credited
    GROUP BY event_type
    """,
)
def ev_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay attribution (1-day half-life, 7-day
    window) in exact power-of-two weights and floor-division
    micro-credits."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    paired = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        ),
    ).select(
        "purchase_id",
        "event_type",
        # whole-day age from the NTZ day-time interval itself:
        # CAST(interval AS BIGINT) is total whole seconds (timezone-free)
        ((F.col("p_ts") - F.col("t_ts")).cast("bigint") / F.lit(86400))
        .cast("bigint")
        .alias("age_days"),
    )
    weighted = paired.select(
        "purchase_id",
        "event_type",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(7 - age_days AS INT))").alias("w"),
    )
    credited = weighted.withColumn(
        "credit_micro",
        F.expr(
            f"(w * CAST({DECAY_MICRO} AS BIGINT)) DIV "
            "sum(w) OVER (PARTITION BY purchase_id)"
        ),
    )
    return credited.groupBy("event_type").agg(
        F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("credit_micro").cast("bigint").alias("credit_micro_total"),
        F.round(
            F.sum("credit_micro").cast("double") / DECAY_MICRO, 6
        ).alias("credit"),
    )


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard — the nonparametric companion to
# cust_survival_km over the SAME labeled lifetimes (identical churn
# definition, censoring, at-risk prefix machinery):
#
#   H(t) = sum over event durations s <= t of d_s / n_s
#
# Where KM must quantize ln-terms to make its product shuffle-stable,
# the NA estimator is a plain SUM, so it gets the stronger guarantee:
# each step is the exact integer floor-division (d * 1e6) DIV n and the
# cumulative hazard is an exact BIGINT in micro-units — no float enters
# until the display column. Same scale shape as KM: customer-grain
# reduction, day-grain series, range-partitioned running sums.
# --------------------------------------------------------------------------
@register(
    "cust_nelson_aalen",
    oracle=f"""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS w FROM orders),
    cust AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS DATE)) AS first_d,
             max(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    labeled AS (
      SELECT o_custkey,
             CASE WHEN date_diff('day', last_d, ref.w) > {KM_CHURN_GAP}
                  THEN 1 ELSE 0 END AS event,
             CASE WHEN date_diff('day', last_d, ref.w) > {KM_CHURN_GAP}
                  THEN date_diff('day', first_d, last_d)
                  ELSE date_diff('day', first_d, ref.w) END AS duration
      FROM cust CROSS JOIN ref
    ),
    per_t AS (
      SELECT duration,
             CAST(sum(event) AS BIGINT) AS d,
             CAST(sum(1 - event) AS BIGINT) AS c
      FROM labeled GROUP BY duration
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM labeled),
    risk AS (
      SELECT duration, d, c,
             n.total - coalesce(sum(d + c) OVER (
               ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS at_risk
      FROM per_t CROSS JOIN n
    )
    SELECT CAST(duration AS BIGINT) AS duration_days,
           d AS n_events, c AS n_censored,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           CAST(sum((d * 1000000) // at_risk) OVER (
             ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS BIGINT) AS cum_hazard_micro,
           round(sum((d * 1000000) // at_risk) OVER (
             ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) / 1000000.0, 6) AS cum_hazard
    FROM risk
    """,
)
def cust_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over customer lifetimes — exact
    BIGINT micro-unit steps (d*1e6 DIV n), cumulated over the
    calendar-bounded duration grain (bounded global window, same
    allowlist class as cust_survival_km)."""
    from ..functions.ranking import bounded_running_sum

    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    ref = orders.agg(F.max(d).alias("w"))
    cust = orders.groupBy("o_custkey").agg(
        F.min(d).alias("first_d"), F.max(d).alias("last_d")
    )
    gap = F.datediff("w", "last_d")
    # customer-grain and referenced twice (per_t + the total count) —
    # persist so the full-orders groupBy runs ONCE (round-10: unpersisted,
    # the n/total branch re-aggregated the whole orders table and the
    # scan gate counted orders x4).
    labeled = cust.crossJoin(F.broadcast(ref)).select(
        F.when(gap > KM_CHURN_GAP, 1).otherwise(0).alias("event"),
        F.when(gap > KM_CHURN_GAP, F.datediff("last_d", "first_d"))
        .otherwise(F.datediff("w", "first_d"))
        .alias("duration"),
    ).persist()
    per_t = labeled.groupBy("duration").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    n = labeled.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    left_before = bounded_running_sum(
        per_t,
        [F.col("duration")],
        F.col("d") + F.col("c"),
        "_left",
        inclusive=False,
    )
    risk = left_before.crossJoin(F.broadcast(n)).select(
        "duration",
        "d",
        "c",
        (F.col("total") - F.col("_left")).alias("at_risk"),
    )
    steps = risk.withColumn(
        "hz_micro",
        F.expr("(d * CAST(1000000 AS BIGINT)) DIV at_risk"),
    )
    curve = bounded_running_sum(
        steps, [F.col("duration")], F.col("hz_micro"), "_cum", inclusive=True
    )
    return curve.select(
        F.col("duration").cast("bigint").alias("duration_days"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.col("at_risk").cast("bigint").alias("n_at_risk"),
        F.col("_cum").cast("bigint").alias("cum_hazard_micro"),
        F.round(F.col("_cum") / 1000000.0, 6).alias("cum_hazard"),
    )


# --------------------------------------------------------------------------
# Bot-likeness heuristics per user — the standard traffic-quality
# screens every event pipeline runs before analytics or training-data
# extraction: burst rate (max events in one calendar minute),
# minimum interarrival gap, night-hour activity share, and event-type
# variety. All metrics are exact integers (interval-second gaps, ppm
# floor divisions); the output is the deterministically-ordered
# suspect list, not a score no one can reproduce.
#
# Scale shape: one user/minute reduction + one user-grain window pass
# (lag over (user, ts) — key-partitioned, no global window), then a
# top-N with a total order. Event-linear, shuffle on user_id only.
# --------------------------------------------------------------------------
BOT_MIN_EVENTS = 5
BOT_BURST_MIN = 2  # >= this many events in one minute
BOT_FAST_GAP_S = 60  # or a gap this short
BOT_TOP_N = 200


@register(
    "ev_bot_burst_score",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    gaps AS (
      SELECT user_id, ts, event_type,
             (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS gap_s
      FROM seq
    ),
    per_min AS (
      SELECT user_id, date_trunc('minute', ts) AS m, count(*) AS n_min
      FROM events GROUP BY 1, 2
    ),
    burst AS (
      SELECT user_id, CAST(max(n_min) AS BIGINT) AS max_per_min
      FROM per_min GROUP BY user_id
    ),
    prof AS (
      SELECT g.user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(g.gap_s) AS BIGINT) AS min_gap_s,
             CAST(count(DISTINCT g.event_type) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN hour(g.ts) < 6 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_night
      FROM gaps g GROUP BY g.user_id
    )
    SELECT p.user_id, p.n_events, b.max_per_min, p.min_gap_s, p.n_types,
           p.n_night * 1000000 // p.n_events AS night_ppm
    FROM prof p JOIN burst b USING (user_id)
    WHERE p.n_events >= {BOT_MIN_EVENTS}
      AND (b.max_per_min >= {BOT_BURST_MIN} OR p.min_gap_s <= {BOT_FAST_GAP_S})
    ORDER BY b.max_per_min DESC, p.n_events DESC, p.user_id
    LIMIT {BOT_TOP_N}
    """,
)
def ev_bot_burst_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bot-likeness suspect list: burst rate, minimum
    interarrival gap (NTZ interval seconds), night share, type variety."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_ts", F.lag("ts").over(w))
    gaps = seq.withColumn(
        "gap_s", (F.col("ts") - F.col("prev_ts")).cast("bigint")
    )
    burst = (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_min"))
        .groupBy("user_id")
        .agg(F.max("n_min").cast("bigint").alias("max_per_min"))
    )
    prof = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.sum(F.when(F.hour("ts") < 6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_night"),
    )
    out = (
        prof.join(burst, "user_id")
        .filter(
            (F.col("n_events") >= BOT_MIN_EVENTS)
            & (
                (F.col("max_per_min") >= BOT_BURST_MIN)
                | (F.col("min_gap_s") <= BOT_FAST_GAP_S)
            )
        )
        .select(
            "user_id",
            "n_events",
            "max_per_min",
            "min_gap_s",
            "n_types",
            F.expr("n_night * CAST(1000000 AS BIGINT) DIV n_events").alias(
                "night_ppm"
            ),
        )
    )
    return out.orderBy(
        F.desc("max_per_min"), F.desc("n_events"), "user_id"
    ).limit(BOT_TOP_N)


# --------------------------------------------------------------------------
# Order-velocity burst flags — the fraud-ops twin of the bot screen on
# the transactional side: customers placing VEL_MIN_ORDERS or more
# orders inside any trailing 7-day window. Implemented as a RANGE
# window over the integer day axis (key-partitioned per customer, no
# self-join, no pair explosion) — the canonical "sliding count over
# event time" shape that generalizes to any velocity rule.
# --------------------------------------------------------------------------
VEL_WINDOW_DAYS = 7
VEL_MIN_ORDERS = 2


@register(
    "ev_order_velocity_flags",
    oracle=f"""
    WITH days AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                 AS day_ix
      FROM orders
    ),
    counted AS (
      SELECT o_custkey, o_orderkey, d,
             CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY day_ix
               RANGE BETWEEN {VEL_WINDOW_DAYS - 1} PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_7d
      FROM days
    )
    SELECT o_custkey, o_orderkey, d AS window_end, n_7d
    FROM counted WHERE n_7d >= {VEL_MIN_ORDERS}
    """,
)
def ev_order_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders that complete a >= {VEL_MIN_ORDERS}-orders-in-7-days burst
    for their customer, via a RANGE frame on the integer day axis."""
    orders = table(spark, sf_dir, "orders")
    days = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day_ix"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day_ix")
        .rangeBetween(-(VEL_WINDOW_DAYS - 1), 0)
    )
    counted = days.withColumn(
        "n_7d", F.count(F.lit(1)).over(w).cast("bigint")
    )
    return counted.filter(F.col("n_7d") >= VEL_MIN_ORDERS).select(
        "o_custkey", "o_orderkey", F.col("d").alias("window_end"), "n_7d"
    )


# --------------------------------------------------------------------------
# Customer activity-tier migration matrix — the cohort-movement report
# behind retention planning: bucket every known customer by order
# count in era A and era B (none / one / light 2-3 / heavy 4+) and
# count the 4x4 transitions. Pure integer tiering (no quantile
# boundaries to disagree on), two conditional aggregations at customer
# grain, one dimension-sized rollup; row share in exact ppm.
# --------------------------------------------------------------------------
TIER_YEAR_A = 1994
TIER_YEAR_B = 1995
_TIER_CASE = (
    "CASE WHEN {n} >= 4 THEN 'heavy' WHEN {n} >= 2 THEN 'light' "
    "WHEN {n} = 1 THEN 'one' ELSE 'none' END"
)


@register(
    "cust_tier_migration",
    oracle=f"""
    WITH counts AS (
      SELECT c.c_custkey,
             CAST(coalesce(sum(CASE WHEN year(o.o_orderdate) = {TIER_YEAR_A}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(CASE WHEN year(o.o_orderdate) = {TIER_YEAR_B}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    tiered AS (
      SELECT {_TIER_CASE.format(n="n_a")} AS tier_from,
             {_TIER_CASE.format(n="n_b")} AS tier_to
      FROM counts
    ),
    cells AS (
      SELECT tier_from, tier_to, CAST(count(*) AS BIGINT) AS n_customers
      FROM tiered GROUP BY tier_from, tier_to
    ),
    rowtot AS (
      SELECT tier_from, CAST(sum(n_customers) AS BIGINT) AS row_total
      FROM cells GROUP BY tier_from
    )
    SELECT c.tier_from, c.tier_to, c.n_customers,
           c.n_customers * 1000000 // r.row_total AS row_share_ppm
    FROM cells c JOIN rowtot r USING (tier_from)
    """,
)
def cust_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{TIER_YEAR_A}->{TIER_YEAR_B} activity-tier transition matrix over
    all customers (none/one/light/heavy), with exact ppm row shares."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    yr = F.year("o_orderdate")
    counts = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", yr.alias("yr")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("yr") == TIER_YEAR_A, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_a"),
            F.coalesce(
                F.sum(F.when(F.col("yr") == TIER_YEAR_B, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_b"),
        )
    )

    def tier(col):
        return (
            F.when(F.col(col) >= 4, "heavy")
            .when(F.col(col) >= 2, "light")
            .when(F.col(col) == 1, "one")
            .otherwise("none")
        )

    cells = (
        counts.select(
            tier("n_a").alias("tier_from"), tier("n_b").alias("tier_to")
        )
        .groupBy("tier_from", "tier_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )
    rowtot = cells.groupBy("tier_from").agg(
        F.sum("n_customers").cast("bigint").alias("row_total")
    )
    return cells.join(F.broadcast(rowtot), "tier_from").select(
        "tier_from",
        "tier_to",
        "n_customers",
        F.expr("n_customers * CAST(1000000 AS BIGINT) DIV row_total").alias(
            "row_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# ABC (Pareto) inventory classification — the ops-analytics standard:
# rank parts by revenue, class A = parts covering the first 80% of
# cumulative revenue, B = next 15%, C = the tail. Exact integer cents
# everywhere; the cumulative share uses the range-partitioned running
# sum (never a single-reducer window over the part dimension); class
# boundaries compare exact integers (cum*100 vs total*K). Output is
# the dimension-sized class rollup, not the per-part listing.
# --------------------------------------------------------------------------
@register(
    "fin_pareto_abc_classes",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                           AS BIGINT)) AS BIGINT) AS rev_4dp
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(sum(rev_4dp) AS BIGINT) AS total FROM per_part),
    run AS (
      SELECT l_partkey, rev_4dp,
             CAST(sum(rev_4dp) OVER (
               ORDER BY rev_4dp DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM per_part
    ),
    classed AS (
      SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_4dp
      FROM run CROSS JOIN tot
    ),
    agg AS (
      SELECT abc_class,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev_4dp) AS BIGINT) AS rev_4dp
      FROM classed GROUP BY abc_class
    )
    SELECT abc_class, n_parts,
           round(rev_4dp / 10000.0, 2) AS revenue,
           -- two-stage exact floor(rev*1e6/total): rev*1e6 would
           -- overflow BIGINT at large SF, rev*1000 never does (< sf4)
           ((rev_4dp * 1000) // total) * 1000
             + (((rev_4dp * 1000) % total) * 1000) // total
               AS revenue_share_ppm
    FROM agg CROSS JOIN tot
    """,
)
def fin_pareto_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by revenue (A = first 80% of
    cumulative revenue, B = to 95%, C = tail), exact 4dp-integer money
    and a range-partitioned cumulative scan."""
    from ..functions.ranking import global_running_sum

    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_4dp")
    )
    tot = per_part.agg(F.sum("rev_4dp").cast("bigint").alias("total"))
    run = global_running_sum(
        per_part,
        [F.col("rev_4dp").desc(), F.col("l_partkey")],
        F.col("rev_4dp"),
        "cum",
        inclusive=True,
    )
    classed = run.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_4dp",
        "total",
    )
    agg = classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev_4dp").cast("bigint").alias("rev_4dp"),
        F.first("total").alias("total"),
    )
    # two-stage exact floor(rev*1e6/total) — rev*1e6 overflows BIGINT at
    # large SF, rev*1000 never does (safe past sf4)
    share = F.expr(
        "((rev_4dp * 1000) DIV total) * 1000"
        " + (((rev_4dp * 1000) % total) * 1000) DIV total"
    )
    return agg.select(
        "abc_class",
        "n_parts",
        F.round(F.col("rev_4dp") / 10000.0, 2).alias("revenue"),
        share.cast("bigint").alias("revenue_share_ppm"),
    )


# --------------------------------------------------------------------------
# Quantile (pinball-loss) trend grid — a robust alternative to OLS
# trend fitting that needs no iterative solver: evaluate the pinball
# loss of the median (tau=0.5) and the tau=0.9 quantile regression
# line over a literal grid of candidate daily slopes (cents/day,
# intercept pinned at the series' first value), pick each tau's
# argmin. All residuals are exact integer cents; the loss is an exact
# BIGINT sum (pinball loss of integers scaled x10 to keep 0.9/0.1
# integral), so the argmin is hash-stable. ONE stacked conditional
# aggregation pass evaluates the whole grid (the
# conversion-window-sensitivity shape — never |grid| scans).
# --------------------------------------------------------------------------
QR_SLOPES_CPD = tuple(range(-50_000, 50_001, 10_000))  # cents/day grid


@register(
    "stat_quantile_trend_grid",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT date_diff('day', (SELECT min(d) FROM daily), d) AS t,
             cents,
             (SELECT cents FROM daily ORDER BY d LIMIT 1) AS c0
      FROM daily
    ),
    losses AS (
      {" UNION ALL ".join(
        f'''SELECT {s} AS slope_cpd,
             CAST(sum(CASE WHEN cents - (c0 + {s} * t) >= 0
                  THEN 5 * (cents - (c0 + {s} * t))
                  ELSE -5 * (cents - (c0 + {s} * t)) END) AS BIGINT)
                 AS loss50_x10,
             CAST(sum(CASE WHEN cents - (c0 + {s} * t) >= 0
                  THEN 9 * (cents - (c0 + {s} * t))
                  ELSE -1 * (cents - (c0 + {s} * t)) END) AS BIGINT)
                 AS loss90_x10
      FROM base''' for s in QR_SLOPES_CPD)}
    )
    SELECT slope_cpd, loss50_x10, loss90_x10,
           CASE WHEN loss50_x10 = (SELECT min(loss50_x10) FROM losses)
                THEN 1 ELSE 0 END AS best_tau50,
           CASE WHEN loss90_x10 = (SELECT min(loss90_x10) FROM losses)
                THEN 1 ELSE 0 END AS best_tau90
    FROM losses
    """,
)
def stat_quantile_trend_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss evaluation of median / p90 trend lines over a
    literal slope grid — exact BIGINT losses, single stacked agg pass."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    anchor = daily.orderBy("d").limit(1).select(
        F.col("d").alias("d0"), F.col("cents").alias("c0")
    )
    base = daily.crossJoin(F.broadcast(anchor)).select(
        F.datediff("d", "d0").alias("t"), "cents", "c0"
    )
    aggs = []
    for s in QR_SLOPES_CPD:
        resid = F.col("cents") - (F.col("c0") + F.lit(s) * F.col("t"))
        aggs.append(
            F.sum(F.when(resid >= 0, 5 * resid).otherwise(-5 * resid))
            .cast("bigint")
            .alias(f"l50_{s}")
        )
        aggs.append(
            F.sum(F.when(resid >= 0, 9 * resid).otherwise(-1 * resid))
            .cast("bigint")
            .alias(f"l90_{s}")
        )
    cells = base.agg(*aggs)
    # Single reference to the one-row loss grid (union-of-selects would
    # re-aggregate the daily series once per candidate slope).
    out = explode_branches(
        cells,
        [
            F.struct(
                F.lit(s).alias("slope_cpd"),
                F.col(f"l50_{s}").alias("loss50_x10"),
                F.col(f"l90_{s}").alias("loss90_x10"),
                F.least(
                    *[F.col(f"l50_{x}") for x in QR_SLOPES_CPD]
                ).alias("_m50"),
                F.least(
                    *[F.col(f"l90_{x}") for x in QR_SLOPES_CPD]
                ).alias("_m90"),
            )
            for s in QR_SLOPES_CPD
        ],
    )
    return out.select(
        "slope_cpd",
        "loss50_x10",
        "loss90_x10",
        F.when(F.col("loss50_x10") == F.col("_m50"), 1).otherwise(0).alias(
            "best_tau50"
        ),
        F.when(F.col("loss90_x10") == F.col("_m90"), 1).otherwise(0).alias(
            "best_tau90"
        ),
    )


# --------------------------------------------------------------------------
# Power-user curve — the growth-analytics histogram (how many users
# were active on exactly k distinct days this month): L28-style
# engagement shape, computed for every month in the corpus. Two
# integer reductions (user-month day count, then month-k histogram);
# shares in exact ppm.
# --------------------------------------------------------------------------
@register(
    "ev_power_user_curve",
    oracle="""
    WITH um AS (
      SELECT year(ts) * 100 + month(ts) AS ym, user_id,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
      FROM events GROUP BY 1, 2
    ),
    hist AS (
      SELECT ym, active_days, CAST(count(*) AS BIGINT) AS n_users
      FROM um GROUP BY ym, active_days
    ),
    tot AS (SELECT ym, CAST(sum(n_users) AS BIGINT) AS t FROM hist GROUP BY ym)
    SELECT CAST(h.ym AS INTEGER) AS ym, h.active_days, h.n_users,
           h.n_users * 1000000 // t.t AS user_share_ppm
    FROM hist h JOIN tot t USING (ym)
    """,
)
def ev_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month power-user curve: users by exact count of distinct
    active days, with ppm shares."""
    ev = table(spark, sf_dir, "events")
    um = ev.groupBy(
        (F.year("ts") * 100 + F.month("ts")).alias("ym"), "user_id"
    ).agg(
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days")
    )
    hist = um.groupBy("ym", "active_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    tot = hist.groupBy("ym").agg(F.sum("n_users").cast("bigint").alias("t"))
    return hist.join(F.broadcast(tot), "ym").select(
        F.col("ym").cast("int").alias("ym"),
        "active_days",
        "n_users",
        F.expr("n_users * CAST(1000000 AS BIGINT) DIV t").alias(
            "user_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Quarter-end loading audit — the classic fiscal-forensics screen:
# does order volume/value bunch into the final week of each quarter
# (sales pulling deals forward to make quota)? For each quarter:
# orders and revenue in the last 7 days vs the rest, with the
# loading ratio as exact ppm of the uniform expectation (7/91 of the
# quarter's volume). Pure integer date arithmetic — quarter bounds
# come from date_trunc, never float week math.
# --------------------------------------------------------------------------
@register(
    "fin_quarter_end_loading",
    oracle="""
    WITH q AS (
      SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
                 AS qtr,
             CAST(o_orderdate AS DATE) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    marked AS (
      SELECT qtr, cents,
             CASE WHEN date_diff('day', d,
                    CAST(qtr + INTERVAL 3 MONTH AS DATE) - INTERVAL 1 DAY) < 7
                  THEN 1 ELSE 0 END AS last_week
      FROM q
    )
    SELECT qtr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(last_week) AS BIGINT) AS n_last_week,
           CAST(sum(last_week) AS BIGINT) * 1000000 // count(*)
               AS last_week_order_ppm,
           CAST(sum(CASE WHEN last_week = 1 THEN cents ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(cents) AS BIGINT)
               AS last_week_revenue_ppm
    FROM marked
    GROUP BY qtr
    """,
)
def fin_quarter_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quarter last-7-days order/revenue concentration in exact ppm
    (quarter-end loading / quota-pull-forward audit)."""
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    qtr = F.date_trunc("quarter", d).cast("date")
    q = orders.select(
        qtr.alias("qtr"),
        d.alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    qtr_end = F.date_sub(F.add_months(F.col("qtr"), 3), 1)
    marked = q.select(
        "qtr",
        "cents",
        F.when(F.datediff(qtr_end, F.col("d")) < 7, 1).otherwise(0).alias(
            "last_week"
        ),
    )
    return marked.groupBy("qtr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("last_week").cast("bigint").alias("n_last_week"),
        F.expr(
            "CAST(sum(last_week) AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV count(*)"
        ).alias("last_week_order_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN last_week = 1 THEN cents ELSE 0 END)"
            " AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV CAST(sum(cents) AS BIGINT)"
        ).alias("last_week_revenue_ppm"),
    )


# --------------------------------------------------------------------------
# Revenue bridge (price/volume/mix decomposition) — the FP&A
# waterfall: 1994 -> 1995 revenue change split into volume effect
# (quantity change at old unit prices), price effect (new volume at
# price change), and new/discontinued part contributions.
#
# Exactness trick: per part, volume = (q1*r0*1000) DIV q0 - r0*1000
# and price = r1*1000 - (q1*r0*1000) DIV q0 — the SAME floor-division
# term appears with opposite signs, so quantization cancels and
# volume + price == r1*1000 - r0*1000 EXACTLY per part; the bridge
# reconciles to the cent with zero residual, and the only DIV operand
# is non-negative (identical floor semantics cross-engine; negative
# dividends would floor in DuckDB but truncate in Spark).
#
# Scale shape: one part-year conditional aggregation over lineitem,
# then a part-grain map and a one-row rollup.
# --------------------------------------------------------------------------
BRIDGE_YEAR_0 = 1994
BRIDGE_YEAR_1 = 1995


@register(
    "fin_revenue_bridge",
    oracle=f"""
    WITH py AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {BRIDGE_YEAR_0}
                  THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {BRIDGE_YEAR_0}
                  THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS r0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {BRIDGE_YEAR_1}
                  THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {BRIDGE_YEAR_1}
                  THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS r1
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(o.o_orderdate) IN ({BRIDGE_YEAR_0}, {BRIDGE_YEAR_1})
      GROUP BY l_partkey
    ),
    eff AS (
      SELECT
        CASE WHEN q0 > 0 AND q1 > 0 THEN (q1 * r0 * 1000) // q0 - r0 * 1000
             ELSE 0 END AS vol_milli,
        CASE WHEN q0 > 0 AND q1 > 0 THEN r1 * 1000 - (q1 * r0 * 1000) // q0
             ELSE 0 END AS price_milli,
        CASE WHEN q0 = 0 AND q1 > 0 THEN r1 * 1000 ELSE 0 END AS new_milli,
        CASE WHEN q1 = 0 AND q0 > 0 THEN r0 * 1000 ELSE 0 END AS disc_milli,
        r0, r1
      FROM py
    )
    SELECT round(CAST(sum(r0) AS BIGINT) / 100.0, 2) AS rev_y0,
           round(CAST(sum(r1) AS BIGINT) / 100.0, 2) AS rev_y1,
           round(CAST(sum(vol_milli) AS BIGINT) / 100000.0, 2)
               AS volume_effect,
           round(CAST(sum(price_milli) AS BIGINT) / 100000.0, 2)
               AS price_effect,
           round(CAST(sum(new_milli) AS BIGINT) / 100000.0, 2)
               AS new_parts_effect,
           round(CAST(sum(disc_milli) AS BIGINT) / 100000.0, 2)
               AS discontinued_effect,
           CAST(sum(vol_milli) + sum(price_milli) + sum(new_milli)
                - sum(disc_milli)
                - (sum(r1) - sum(r0)) * 1000 AS BIGINT) AS residual_milli
    FROM eff
    """,
)
def fin_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BRIDGE_YEAR_0}->{BRIDGE_YEAR_1} revenue bridge: volume / price /
    new / discontinued effects that reconcile with zero residual."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    j = li.join(
        orders.select("o_orderkey", yr.alias("yr")).filter(
            F.col("yr").isin(BRIDGE_YEAR_0, BRIDGE_YEAR_1)
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")
    py = j.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("yr") == BRIDGE_YEAR_0, qty).otherwise(0))
        .cast("bigint")
        .alias("q0"),
        F.sum(F.when(F.col("yr") == BRIDGE_YEAR_0, rev).otherwise(0))
        .cast("bigint")
        .alias("r0"),
        F.sum(F.when(F.col("yr") == BRIDGE_YEAR_1, qty).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(F.col("yr") == BRIDGE_YEAR_1, rev).otherwise(0))
        .cast("bigint")
        .alias("r1"),
    )
    both = (F.col("q0") > 0) & (F.col("q1") > 0)
    laspeyres = F.expr("(q1 * r0 * 1000) DIV q0")
    eff = py.select(
        F.when(both, laspeyres - F.col("r0") * 1000).otherwise(0).alias(
            "vol_milli"
        ),
        F.when(both, F.col("r1") * 1000 - laspeyres).otherwise(0).alias(
            "price_milli"
        ),
        F.when((F.col("q0") == 0) & (F.col("q1") > 0), F.col("r1") * 1000)
        .otherwise(0)
        .alias("new_milli"),
        F.when((F.col("q1") == 0) & (F.col("q0") > 0), F.col("r0") * 1000)
        .otherwise(0)
        .alias("disc_milli"),
        "r0",
        "r1",
    )
    return eff.agg(
        F.round(F.sum("r0").cast("bigint") / 100.0, 2).alias("rev_y0"),
        F.round(F.sum("r1").cast("bigint") / 100.0, 2).alias("rev_y1"),
        F.round(F.sum("vol_milli").cast("bigint") / 100000.0, 2).alias(
            "volume_effect"
        ),
        F.round(F.sum("price_milli").cast("bigint") / 100000.0, 2).alias(
            "price_effect"
        ),
        F.round(F.sum("new_milli").cast("bigint") / 100000.0, 2).alias(
            "new_parts_effect"
        ),
        F.round(F.sum("disc_milli").cast("bigint") / 100000.0, 2).alias(
            "discontinued_effect"
        ),
        (
            F.sum("vol_milli")
            + F.sum("price_milli")
            + F.sum("new_milli")
            - F.sum("disc_milli")
            - (F.sum("r1") - F.sum("r0")) * 1000
        )
        .cast("bigint")
        .alias("residual_milli"),
    )


# --------------------------------------------------------------------------
# Supplier concentration (Herfindahl-Hirschman index) per brand market
# — the antitrust/supply-risk metric: HHI = sum of squared supplier
# revenue shares within each p_brand market. Numerator and
# denominator are EXACT decimal sums (sum of r_i^2 and T^2 in cents);
# the single final division is one deterministic double op, so the
# rounded HHI is hash-stable. Top-share ppm is an exact floor
# division. One lineitem reduction at (brand, supplier) grain, then a
# brand-grain rollup — fact-linear.
# --------------------------------------------------------------------------
@register(
    "fin_supplier_hhi",
    oracle="""
    WITH bs AS (
      SELECT p.p_brand, l.l_suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_suppkey
    ),
    mkt AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(cents) AS BIGINT) AS total,
             sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sum_sq,
             CAST(max(cents) AS BIGINT) AS top_cents
      FROM bs GROUP BY p_brand
    )
    SELECT p_brand, n_suppliers,
           round(total / 100.0, 2) AS revenue,
           round(CAST(sum_sq AS DOUBLE)
                 / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS hhi,
           top_cents * 1000000 // total AS top_share_ppm
    FROM mkt
    """,
)
def fin_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand supplier HHI from exact decimal share sums, plus the
    top supplier's exact ppm share."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    bs = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(rev).cast("bigint").alias("cents"))
    )
    dec = F.col("cents").cast("decimal(38,0)")
    mkt = bs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("total"),
        F.sum(dec * dec).alias("sum_sq"),
        F.max("cents").cast("bigint").alias("top_cents"),
    )
    return mkt.select(
        "p_brand",
        "n_suppliers",
        F.round(F.col("total") / 100.0, 2).alias("revenue"),
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double")),
            6,
        ).alias("hhi"),
        F.expr("top_cents * CAST(1000000 AS BIGINT) DIV total").alias(
            "top_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Holiday lift — revenue on fixed-date holidays vs ordinary days, as
# an exact cross-multiplied rational (avg_holiday / avg_baseline with
# zero float division inside the comparison). The holiday calendar is
# a literal mm-dd list shared by both engines; integer cents
# throughout. One day-grain reduction + a two-arm conditional rollup.
# --------------------------------------------------------------------------
HOLIDAYS_MMDD = ("12-25", "01-01", "07-04")


@register(
    "ev_holiday_lift",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             strftime(CAST(o_orderdate AS DATE), '%m-%d') AS mmdd,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1, 2
    ),
    arms AS (
      SELECT CASE WHEN mmdd IN {HOLIDAYS_MMDD} THEN mmdd
                  ELSE 'baseline' END AS arm,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM daily GROUP BY 1
    ),
    base AS (
      SELECT n_days AS b_days, cents AS b_cents FROM arms
      WHERE arm = 'baseline'
    )
    SELECT arm, n_days,
           round(cents / 100.0, 2) AS revenue,
           round(cents / (100.0 * n_days), 2) AS avg_daily_revenue,
           CASE WHEN arm = 'baseline' THEN CAST(1000000 AS BIGINT)
                ELSE (cents * b_days * 1000) // (b_cents * n_days) * 1000
                     + ((cents * b_days * 1000) % (b_cents * n_days) * 1000)
                       // (b_cents * n_days)
           END AS lift_ppm
    FROM arms CROSS JOIN base
    """,
)
def ev_holiday_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-daily-revenue lift of each fixed-date holiday vs the
    baseline of all other days, as an exact two-stage ppm ratio."""
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    daily = orders.groupBy(
        d.alias("d"), F.date_format(d, "MM-dd").alias("mmdd")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    arms = daily.groupBy(
        F.when(F.col("mmdd").isin(*HOLIDAYS_MMDD), F.col("mmdd"))
        .otherwise("baseline")
        .alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    base = arms.filter(F.col("arm") == "baseline").select(
        F.col("n_days").alias("b_days"), F.col("cents").alias("b_cents")
    )
    lift = F.when(F.col("arm") == "baseline", F.lit(1000000).cast("bigint")).otherwise(
        F.expr(
            "(cents * b_days * 1000) DIV (b_cents * n_days) * 1000"
            " + ((cents * b_days * 1000) % (b_cents * n_days) * 1000)"
            " DIV (b_cents * n_days)"
        )
    )
    return arms.crossJoin(F.broadcast(base)).select(
        "arm",
        "n_days",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("cents") / (100.0 * F.col("n_days")), 2).alias(
            "avg_daily_revenue"
        ),
        lift.cast("bigint").alias("lift_ppm"),
    )


# --------------------------------------------------------------------------
# Return-rate by brand — the merchandising quality scorecard: share of
# line items (and of revenue) flagged returned (l_returnflag = 'R')
# per part brand, in exact ppm, with a deterministic worst-first
# ordering. One broadcast dimension join + one conditional
# aggregation pass over lineitem.
# --------------------------------------------------------------------------
@register(
    "fin_return_rate_by_brand",
    oracle="""
    WITH j AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ret) AS BIGINT) AS n_returned,
           CAST(sum(ret) AS BIGINT) * 1000000 // count(*) AS return_ppm,
           (CAST(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) AS BIGINT)
             * 1000 // CAST(sum(cents) AS BIGINT)) * 1000
             + (CAST(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) AS BIGINT)
                * 1000 % CAST(sum(cents) AS BIGINT)) * 1000
               // CAST(sum(cents) AS BIGINT)
               AS returned_revenue_ppm,
           round(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) / 100.0, 2)
               AS returned_revenue
    FROM j
    GROUP BY p_brand
    """,
)
def fin_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return rate (exact ppm of line items) and returned
    revenue."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("ret").cast("bigint").alias("n_returned"),
        F.expr(
            "CAST(sum(ret) AS BIGINT) * CAST(1000000 AS BIGINT) DIV count(*)"
        ).alias("return_ppm"),
        # two-stage exact floor(ret_cents*1e6/total_cents) — overflow-safe
        F.expr(
            "(CAST(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) AS BIGINT)"
            " * 1000 DIV CAST(sum(cents) AS BIGINT)) * 1000"
            " + (CAST(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) AS BIGINT)"
            " * 1000 % CAST(sum(cents) AS BIGINT)) * 1000"
            " DIV CAST(sum(cents) AS BIGINT)"
        ).alias("returned_revenue_ppm"),
        F.round(
            F.sum(F.when(F.col("ret") == 1, F.col("cents")).otherwise(0))
            / 100.0,
            2,
        ).alias("returned_revenue"),
    )


# --------------------------------------------------------------------------
# New-vs-returning revenue split — growth accounting's first table:
# per month, orders and revenue from customers whose FIRST order is in
# that month vs customers acquired earlier. One customer-grain
# first-order reduction broadcast back onto the fact; exact cents and
# ppm new-revenue share.
# --------------------------------------------------------------------------
@register(
    "ev_new_vs_returning_revenue",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 100 + month(o_orderdate)) AS first_ym
      FROM orders GROUP BY o_custkey
    ),
    tagged AS (
      SELECT year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
             CASE WHEN year(o.o_orderdate) * 100 + month(o.o_orderdate)
                       = f.first_ym THEN 1 ELSE 0 END AS is_new,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT CAST(ym AS INTEGER) AS ym,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(is_new) AS BIGINT) AS n_new_cust_orders,
           round(CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END)
                      AS BIGINT) / 100.0, 2) AS new_revenue,
           round(CAST(sum(CASE WHEN is_new = 0 THEN cents ELSE 0 END)
                      AS BIGINT) / 100.0, 2) AS returning_revenue,
           CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(cents) AS BIGINT) AS new_share_ppm
    FROM tagged
    GROUP BY ym
    """,
)
def ev_new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split by new (first-order month) vs returning
    customers, with exact ppm new-revenue share."""
    orders = table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
            "first_ym"
        )
    )
    tagged = orders.join(firsts, "o_custkey").select(
        ym,
        F.when(
            F.year("o_orderdate") * 100 + F.month("o_orderdate")
            == F.col("first_ym"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return tagged.groupBy("ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("is_new").cast("bigint").alias("n_new_cust_orders"),
        F.round(
            F.sum(F.when(F.col("is_new") == 1, F.col("cents")).otherwise(0))
            / 100.0,
            2,
        ).alias("new_revenue"),
        F.round(
            F.sum(F.when(F.col("is_new") == 0, F.col("cents")).otherwise(0))
            / 100.0,
            2,
        ).alias("returning_revenue"),
        F.expr(
            "CAST(sum(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)"
            " * CAST(1000000 AS BIGINT) DIV CAST(sum(cents) AS BIGINT)"
        ).alias("new_share_ppm"),
    ).select(
        F.col("ym").cast("int").alias("ym"),
        "n_orders",
        "n_new_cust_orders",
        "new_revenue",
        "returning_revenue",
        "new_share_ppm",
    )


# --------------------------------------------------------------------------
# Basket-size profile — the order-composition histogram (line items
# per order) with revenue weight per basket size: the merchandising
# view behind bundle/market-basket work (mb_* queries score pairs;
# this sizes the opportunity). Two integer reductions, ppm shares.
# --------------------------------------------------------------------------
@register(
    "mb_basket_size_profile",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
      SELECT n_lines,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM per_order GROUP BY n_lines
    ),
    tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS t_orders,
             CAST(sum(cents) AS BIGINT) AS t_cents
      FROM hist
    )
    SELECT n_lines, n_orders,
           round(cents / 100.0, 2) AS revenue,
           n_orders * 1000000 // t_orders AS order_share_ppm,
           (cents * 1000 // t_cents) * 1000
             + (cents * 1000 % t_cents) * 1000 // t_cents
               AS revenue_share_ppm
    FROM hist CROSS JOIN tot
    """,
)
def mb_basket_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-items-per-order histogram with exact order and revenue ppm
    shares (two-stage overflow-safe revenue ppm)."""
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents"),
    )
    hist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    tot = hist.agg(
        F.sum("n_orders").cast("bigint").alias("t_orders"),
        F.sum("cents").cast("bigint").alias("t_cents"),
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "n_lines",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.expr("n_orders * CAST(1000000 AS BIGINT) DIV t_orders").alias(
            "order_share_ppm"
        ),
        F.expr(
            "(cents * 1000 DIV t_cents) * 1000"
            " + (cents * 1000 % t_cents) * 1000 DIV t_cents"
        ).alias("revenue_share_ppm"),
    )


# --------------------------------------------------------------------------
# Unit-price dispersion per part — the arbitrage/pricing-consistency
# screen: coefficient of variation of the realized unit price
# (extendedprice/quantity, exact 4dp integer) across a part's line
# items. Exact decimal moment sums; the CV is one scalar float per
# part over those exact inputs; deterministic top-50 most dispersed.
# --------------------------------------------------------------------------
PRICE_DISP_TOP = 50
PRICE_DISP_MIN_LINES = 5


@register(
    "fin_price_dispersion",
    oracle=f"""
    WITH units AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice * 10000 / l_quantity) AS BIGINT)
                 AS unit_4dp
      FROM lineitem WHERE l_quantity > 0
    ),
    m AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(unit_4dp) AS BIGINT) AS s,
             sum(CAST(unit_4dp AS HUGEINT) * CAST(unit_4dp AS HUGEINT)) AS ss
      FROM units GROUP BY l_partkey
      HAVING count(*) >= {PRICE_DISP_MIN_LINES}
    )
    SELECT l_partkey, n_lines,
           round(s / (10000.0 * n_lines), 4) AS mean_unit_price,
           round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_lines)
                      / n_lines) / (CAST(s AS DOUBLE) / n_lines), 6) AS cv
    FROM m
    ORDER BY cv DESC, l_partkey
    LIMIT {PRICE_DISP_TOP}
    """,
)
def fin_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PRICE_DISP_TOP} parts by unit-price coefficient of
    variation (exact 4dp units, decimal moment sums)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = F.round(
        F.col("l_extendedprice") * 10000 / F.col("l_quantity")
    ).cast("bigint")
    units = li.select("l_partkey", unit.alias("unit_4dp"))
    dec = F.col("unit_4dp").cast("decimal(38,0)")
    m = (
        units.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("unit_4dp").cast("bigint").alias("s"),
            F.sum(dec * dec).alias("ss"),
        )
        .filter(F.col("n_lines") >= PRICE_DISP_MIN_LINES)
    )
    mean = F.col("s").cast("double") / F.col("n_lines")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_lines")
    ) / F.col("n_lines")
    return (
        m.select(
            "l_partkey",
            "n_lines",
            F.round(F.col("s") / (10000.0 * F.col("n_lines")), 4).alias(
                "mean_unit_price"
            ),
            F.round(F.sqrt(var) / mean, 6).alias("cv"),
        )
        .orderBy(F.desc("cv"), "l_partkey")
        .limit(PRICE_DISP_TOP)
    )


# --------------------------------------------------------------------------
# ABC x XYZ classification matrix — the full inventory-policy grid:
# ABC = revenue contribution (as in fin_pareto_abc_classes), XYZ =
# demand variability (coefficient of variation of MONTHLY quantity:
# X < 0.5 steady, Y < 1.0 seasonal, Z erratic). Months with zero
# demand count as zeros in the variance (the textbook convention,
# implemented by dividing by the full month span, not the active
# months). Exact decimal moments; CV^2 is compared against literal
# squared thresholds in exact rational form (var*4 <= mean^2 etc.), so
# even the class boundaries are integer-exact. Output: 9-cell matrix
# with part counts and revenue.
# --------------------------------------------------------------------------
@register(
    "fin_abc_xyz_matrix",
    oracle="""
    WITH pm AS (
      SELECT l_partkey,
             year(l_shipdate) * 12 + month(l_shipdate) AS mix,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    span AS (
      SELECT CAST(max(mix) - min(mix) + 1 AS BIGINT) AS n_months FROM pm
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(sum(q) AS BIGINT) AS sq,
             sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sqq,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM pm GROUP BY l_partkey
    ),
    xyz AS (
      SELECT l_partkey, cents,
             -- var*n^2 = n*sqq - sq^2 ; mean^2*n^2 = sq^2 (common n^2
             -- denominators cancel in the CV^2 comparisons)
             n_months * sqq - CAST(sq AS HUGEINT) * sq AS var_n2,
             CAST(sq AS HUGEINT) * sq AS mean2_n2
      FROM per_part CROSS JOIN span
    ),
    classed_x AS (
      SELECT l_partkey, cents,
             CASE WHEN var_n2 * 4 <= mean2_n2 THEN 'X'
                  WHEN var_n2 <= mean2_n2 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM xyz
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_part),
    run AS (
      SELECT l_partkey, cents, xyz_class,
             CAST(sum(cents) OVER (
               ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM classed_x
    ),
    classed AS (
      SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             xyz_class, cents
      FROM run CROSS JOIN tot
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue
    FROM classed
    GROUP BY abc_class, xyz_class
    """,
)
def fin_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """9-cell ABC (revenue) x XYZ (demand variability) matrix with
    integer-exact class boundaries."""
    from ..functions.ranking import global_running_sum

    li = table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mix"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents"),
    )
    span = pm.agg(
        (F.max("mix") - F.min("mix") + 1).cast("bigint").alias("n_months")
    )
    dec = F.col("q").cast("decimal(38,0)")
    per_part = pm.groupBy("l_partkey").agg(
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(dec * dec).alias("sqq"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    sqd = F.col("sq").cast("decimal(38,0)")
    xyz = per_part.crossJoin(F.broadcast(span)).select(
        "l_partkey",
        "cents",
        (F.col("n_months").cast("decimal(38,0)") * F.col("sqq") - sqd * sqd).alias(
            "var_n2"
        ),
        (sqd * sqd).alias("mean2_n2"),
    )
    classed_x = xyz.select(
        "l_partkey",
        "cents",
        F.when(F.col("var_n2") * 4 <= F.col("mean2_n2"), "X")
        .when(F.col("var_n2") <= F.col("mean2_n2"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    tot = per_part.agg(F.sum("cents").cast("bigint").alias("total"))
    run = global_running_sum(
        classed_x,
        [F.col("cents").desc(), F.col("l_partkey")],
        F.col("cents"),
        "cum",
        inclusive=True,
    )
    classed = run.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "xyz_class",
        "cents",
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# Feature-adoption latency — signup -> first use of each event type:
# the activation funnel's time axis (generalizes time-to-convert from
# one pair to every feature). Exact integer second delays from NTZ
# interval arithmetic; percentiles interpolate identically
# cross-engine on the integer grid.
# --------------------------------------------------------------------------
@register(
    "ev_adoption_latency_by_type",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    firsts AS (
      SELECT s.user_id, e.event_type, min(e.ts) AS first_ts,
             min(s.signup_ts) AS signup_ts
      FROM su s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type <> 'signup' AND e.ts >= s.signup_ts
      GROUP BY s.user_id, e.event_type
    ),
    delays AS (
      SELECT event_type,
             (epoch_us(first_ts) - epoch_us(signup_ts)) // 1000000 AS delay_s
      FROM firsts
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_adopters,
           CAST(quantile_cont(delay_s, 0.5) AS DOUBLE) AS p50_delay_s,
           CAST(quantile_cont(delay_s, 0.9) AS DOUBLE) AS p90_delay_s
    FROM delays GROUP BY event_type
    """,
)
def ev_adoption_latency_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 signup -> first-use latency per feature (event type),
    exact integer-second delays."""
    ev = table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    e = ev.filter(F.col("event_type") != "signup").select(
        F.col("user_id").alias("eu"), "event_type", F.col("ts").alias("ets")
    )
    firsts = (
        su.join(
            e,
            (F.col("eu") == F.col("user_id"))
            & (F.col("ets") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.min("ets").alias("first_ts"),
            F.min("signup_ts").alias("signup_ts"),
        )
    )
    delay_s = (F.col("first_ts") - F.col("signup_ts")).cast("bigint")
    delays = firsts.select("event_type", delay_s.alias("delay_s"))
    return delays.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adopters"),
        F.percentile("delay_s", F.lit(0.5)).alias("p50_delay_s"),
        F.percentile("delay_s", F.lit(0.9)).alias("p90_delay_s"),
    )


# --------------------------------------------------------------------------
# Discount-depth profile — what each discount tier actually buys:
# per exact 1%-discount bucket, line count, average quantity (exact
# rational displayed at 4dp) and revenue. The merchandising companion
# to stat_price_elasticity's single coefficient. One conditional-free
# groupBy over lineitem (discount is already a 2dp decimal grid).
# --------------------------------------------------------------------------
@register(
    "fin_discount_depth_profile",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS INTEGER) AS discount_pct,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 AS cents
      FROM lineitem
    )
    SELECT discount_pct,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(q) AS BIGINT) AS total_qty,
           round(CAST(sum(q) AS BIGINT) * 1.0 / count(*), 4) AS avg_qty,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue
    FROM b GROUP BY discount_pct
    """,
)
def fin_discount_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-discount-percent line counts, exact quantity sums and
    revenue."""
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return b.groupBy("discount_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("q").cast("bigint").alias("total_qty"),
        F.round(F.sum("q").cast("bigint") * 1.0 / F.count(F.lit(1)), 4).alias(
            "avg_qty"
        ),
        F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# Customer concentration ratios (CR4 / CR8) per nation — the market-
# concentration companion to fin_supplier_hhi at the customer side:
# what share of a nation's revenue its top-4 / top-8 customers carry.
# Per-nation ranking via a key-partitioned window (bounded partitions:
# customers-per-nation), conditional sums, exact two-stage ppm.
# --------------------------------------------------------------------------
@register(
    "fin_customer_concentration_crn",
    oracle="""
    WITH pc AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c_nationkey, cents,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY cents DESC, o_custkey) AS rk
      FROM pc
    )
    SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue,
           CAST(sum(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(cents) AS BIGINT) AS cr4_ppm,
           CAST(sum(CASE WHEN rk <= 8 THEN cents ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(cents) AS BIGINT) AS cr8_ppm
    FROM ranked
    GROUP BY c_nationkey
    """,
)
def fin_customer_concentration_crn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR4/CR8 customer revenue concentration per nation in exact ppm."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    pc = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(F.desc("cents"), "o_custkey")
    ranked = pc.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy(
        F.col("c_nationkey").cast("int").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias("revenue"),
        F.expr(
            "CAST(sum(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS BIGINT)"
            " * CAST(1000000 AS BIGINT) DIV CAST(sum(cents) AS BIGINT)"
        ).alias("cr4_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN rk <= 8 THEN cents ELSE 0 END) AS BIGINT)"
            " * CAST(1000000 AS BIGINT) DIV CAST(sum(cents) AS BIGINT)"
        ).alias("cr8_ppm"),
    )


# --------------------------------------------------------------------------
# Session entry/exit matrix — which event type opens a session vs
# which closes it (the landing/exit-page report in event-type form).
# Reuses the 30-minute-gap sessionization (the ev_user_sessions rule,
# total-ordered by (ts, event_id)); first/last per session come from
# min_by/max_by partial aggregations, never a per-session sort.
# --------------------------------------------------------------------------
@register(
    "ev_session_entry_exit_matrix",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
      FROM flagged
    ),
    numbered AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM sessions
    ),
    fl AS (
      SELECT user_id, session_id,
             max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
             max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
      FROM numbered GROUP BY user_id, session_id
    ),
    cells AS (
      SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
      FROM fl GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM cells)
    SELECT entry_type, exit_type, n_sessions,
           n_sessions * 1000000 // t AS share_ppm
    FROM cells CROSS JOIN tot
    """,
)
def ev_session_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-type x exit-type session matrix (30-min gap sessions),
    exact ppm shares, min_by/max_by — no per-session sort."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # second-truncated difference (unix_timestamp each side), matching
    # DuckDB date_diff('second', ...) boundary counting — NOT the
    # interval cast, which floors the raw difference and can disagree
    # by one on sub-second-offset gaps straddling the 1800 s threshold
    prev_ts = F.lag("ts").over(w)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    flagged = ev.withColumn(
        "new_session",
        F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    key = F.struct("ts", "event_id")
    fl = sessions.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
    )
    cells = fl.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    tot = cells.agg(F.sum("n_sessions").cast("bigint").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "entry_type",
        "exit_type",
        "n_sessions",
        F.expr("n_sessions * CAST(1000000 AS BIGINT) DIV t").alias(
            "share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Discounted cohort NPV — fin_cohort_nrr's time-value twin: each
# acquisition cohort's revenue by month-since-acquisition, discounted
# at 1%/month. The discount factors (100/101)^t are mathematical
# constants, precomputed once in Python and baked as micro-unit
# literals into BOTH engines (no runtime pow), so every discounted
# cent is an exact integer floor product. One first-order reduction +
# one fact rollup.
# --------------------------------------------------------------------------
NPV_MONTHLY_RATE = 0.01
NPV_MAX_MONTHS = 96
_NPV_FX = {
    t: int(round((1.0 / (1.0 + NPV_MONTHLY_RATE)) ** t * 1_000_000))
    for t in range(NPV_MAX_MONTHS + 1)
}


def _npv_case_sql() -> str:
    whens = " ".join(
        f"WHEN {t} THEN {fx}" for t, fx in _NPV_FX.items()
    )
    return f"CASE months_since {whens} ELSE 0 END"


@register(
    "fin_cohort_npv",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS first_mix
      FROM orders GROUP BY o_custkey
    ),
    tagged AS (
      SELECT f.first_mix AS cohort_mix,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.first_mix
                 AS months_since,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    disc AS (
      SELECT cohort_mix, cents,
             (cents * ({_npv_case_sql()})) // 1000000 AS npv_cents
      FROM tagged
    )
    SELECT CAST(cohort_mix AS INTEGER) AS cohort_mix,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS nominal_revenue,
           round(CAST(sum(npv_cents) AS BIGINT) / 100.0, 2) AS npv_revenue,
           CAST(sum(npv_cents) AS BIGINT) * 1000000
             // CAST(sum(cents) AS BIGINT) AS npv_ratio_ppm
    FROM disc
    GROUP BY cohort_mix
    """,
)
def fin_cohort_npv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cohort nominal vs 1%/month-discounted revenue with exact
    integer discounting (baked (1/1.01)^t micro-literals)."""
    orders = table(spark, sf_dir, "orders")
    mix = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(F.min(mix).alias("first_mix"))
    tagged = orders.join(firsts, "o_custkey").select(
        F.col("first_mix").alias("cohort_mix"),
        (mix - F.col("first_mix")).alias("months_since"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # the discount CASE is shared verbatim with the oracle (baked
    # micro-literal per month index)
    disc = tagged.select(
        "cohort_mix",
        "cents",
        F.expr(
            f"(cents * ({_npv_case_sql()})) DIV 1000000"
        ).alias("npv_cents"),
    )
    return disc.groupBy(
        F.col("cohort_mix").cast("int").alias("cohort_mix")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias(
            "nominal_revenue"
        ),
        F.round(F.sum("npv_cents").cast("bigint") / 100.0, 2).alias(
            "npv_revenue"
        ),
        F.expr(
            "CAST(sum(npv_cents) AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV CAST(sum(cents) AS BIGINT)"
        ).alias("npv_ratio_ppm"),
    )


# --------------------------------------------------------------------------
# Day-of-week x hour activity heatmap — the capacity-planning picture
# every ops team pins to a wall. DOW comes from epoch-day arithmetic
# (the dow-seasonality convention — engine dayofweek() week-start
# conventions differ); hour is a direct NTZ field extraction. Exact
# counts + ppm of total.
# --------------------------------------------------------------------------
@register(
    "ev_dow_hour_heatmap",
    oracle="""
    WITH cells AS (
      SELECT ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3)
              % 7) + 1 AS dow,
             hour(ts) AS hh,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells)
    SELECT CAST(dow AS INTEGER) AS dow, CAST(hh AS INTEGER) AS hh, n,
           n * 1000000 // t AS share_ppm
    FROM cells CROSS JOIN tot
    """,
)
def ev_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-dow x hour event heatmap (arithmetic dow, exact ppm)."""
    ev = table(spark, sf_dir, "events")
    dow = (
        (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            + 3
        )
        % 7
        + 1
    )
    cells = ev.groupBy(
        dow.cast("int").alias("dow"), F.hour("ts").cast("int").alias("hh")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hh",
        "n",
        F.expr("n * CAST(1000000 AS BIGINT) DIV t").alias("share_ppm"),
    )
