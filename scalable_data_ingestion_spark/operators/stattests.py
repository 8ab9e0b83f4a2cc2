"""Distribution-level statistical tests over warehouse relations.

A pipeline that feeds model training needs more than point estimates:
it needs *tests* — is the daily revenue series trending (Mann-Kendall),
what is the robust trend slope (Theil-Sen), did two cohorts draw from
the same distribution (two-sample Kolmogorov-Smirnov), are two
categorical dimensions independent (chi-square)? All four run as
ordinary DataFrame plans:

- Monotonic-trend and slope tests operate on the DAY grain — a
  time-dimension-bounded relation (~2.5k rows regardless of corpus
  size), so their pairwise day-pair joins cost O(days²) independent of
  the fact-table volume; the only data-sized work is the one
  map-side-combining groupBy that collapses orders to days.
- The KS scan orders the (unbounded) distinct-price relation with the
  range-partitioned prefix-sum helper (``global_running_sums``: both
  samples' cumulative counts in ONE slicing) — no single-partition
  window anywhere.
- All statistics are derived from BIGINT cent / count sums, so every
  aggregate is exact under any shuffle order; doubles appear only in
  the final scalar arithmetic, which is bit-deterministic cross-engine.

Reference parity note: the reference pipeline (pandas/SQLite ETL) has
no hypothesis-testing surface; these extend SURVEY.md §2.12's
monitoring/stats family (same family as stat_revenue_gini,
mon_length_drift_psi).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# two-sided 5% critical value of the standard normal
MK_Z_CRIT = 1.959964

_DAILY_CENTS = """
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders collapsed to the day grain in exact BIGINT cents — the
    bounded series every trend test below runs on."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )


@register(
    "stat_mann_kendall_trend",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS}),
    pairs AS (
      SELECT CAST(sign(b.cents - a.cents) AS BIGINT) AS sgn
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    s AS (
      SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
             (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n
      FROM pairs
    ),
    ties AS (
      SELECT COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_corr
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY cents) g
      WHERE t > 1
    ),
    v AS (
      SELECT n, s_stat,
             (n * (n - 1.0) * (2 * n + 5) - tie_corr) / 18.0 AS var_s
      FROM s, ties
    )
    SELECT n AS n_days, s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_score,
           CASE WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                           WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                           ELSE 0.0 END) > {MK_Z_CRIT} THEN 'increasing'
                WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                           WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                           ELSE 0.0 END) < -{MK_Z_CRIT} THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM v
    """,
)
def stat_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily revenue.

    S = sum over day pairs i<j of sign(x_j - x_i); Var(S) carries the
    standard tie correction; Z applies the continuity correction. The
    pair join is day×day — bounded by the calendar, not the data — and
    rides as a broadcast non-equi join under the one fact-sized
    aggregate. All sums are over BIGINT {-1,0,1} / tie counts: exact.
    """
    # the day relation feeds four legs (pair sides, count, ties):
    # persist so the fact-sized aggregate runs once
    daily = _daily_cents(spark, sf_dir).persist()
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        F.signum(F.col("b.cents") - F.col("a.cents")).cast("bigint").alias("sgn")
    )
    s = pairs.agg(F.sum("sgn").cast("bigint").alias("s_stat")).crossJoin(
        F.broadcast(daily.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    )
    tie_groups = daily.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ties = tie_groups.filter(F.col("t") > 1).agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
        ).alias("tie_corr")
    )
    v = s.crossJoin(F.broadcast(ties)).withColumn(
        "var_s",
        (
            F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
            - F.col("tie_corr")
        )
        / 18.0,
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
        F.when(z > MK_Z_CRIT, "increasing")
        .when(z < -MK_Z_CRIT, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


@register(
    "stat_theil_sen_slope",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS}),
    base AS (SELECT min(d) AS d0 FROM daily),
    slopes AS (
      SELECT (b.cents - a.cents) / 100.0 / date_diff('day', a.d, b.d) AS slope
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    med AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             quantile_cont(slope, 0.5) AS slope_med
      FROM slopes
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           n_pairs,
           round(slope_med, 6) AS slope_per_day,
           round((SELECT quantile_cont(cents / 100.0
                             - med.slope_med * date_diff('day', base.d0, d), 0.5)
                  FROM daily, base), 2) AS intercept
    FROM med
    """,
)
def stat_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: median pairwise slope of daily revenue,
    intercept = median residual at the series origin.

    Day-pair relation again (calendar-bounded); the slope median runs
    through :func:`global_median_cont` (range-partitioned rank + the
    two middle positions) because the ~3 M mostly-distinct slope
    doubles would otherwise funnel through the exact ``percentile``
    aggregate's single-reducer hash-map merge — measured 7.6 s -> ~2 s
    at sf0.1 for the whole query. Slopes divide exact integer cent/day
    differences, so both engines see bit-identical doubles; the
    interpolation formula matches DuckDB's ``quantile_cont`` exactly.
    The residual median stays a plain ``percentile``: the daily series
    is dimension-sized.
    """
    from ..functions.ranking import global_median_cont

    daily = _daily_cents(spark, sf_dir).persist()
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.cents") - F.col("a.cents"))
            / 100.0
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("slope")
    )
    med = global_median_cont(
        slopes, F.col("slope"), n_col="n_pairs", med_col="slope_med"
    )
    base = daily.agg(
        F.min("d").alias("d0"), F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    resid = (
        daily.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(base))
        .select(
            "n_days",
            "n_pairs",
            "slope_med",
            (
                F.col("cents") / 100.0
                - F.col("slope_med") * F.datediff(F.col("d"), F.col("d0"))
            ).alias("r"),
        )
    )
    return resid.groupBy("n_days", "n_pairs", "slope_med").agg(
        F.expr("percentile(r, 0.5)").alias("int_med")
    ).select(
        "n_days",
        "n_pairs",
        F.round("slope_med", 6).alias("slope_per_day"),
        F.round("int_med", 2).alias("intercept"),
    )


KS_SEG_A = "BUILDING"
KS_SEG_B = "AUTOMOBILE"


@register(
    "stat_ks_two_sample",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(c_mktsegment = '{KS_SEG_A}' AS INTEGER) AS in_a
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
    ),
    per_value AS (
      SELECT cents, sum(in_a) AS cnt_a, sum(1 - in_a) AS cnt_b
      FROM tagged GROUP BY cents
    ),
    cum AS (
      SELECT cents,
             CAST(sum(cnt_a) OVER w AS BIGINT) AS cum_a,
             CAST(sum(cnt_b) OVER w AS BIGINT) AS cum_b
      FROM per_value
      WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b
      FROM per_value
    ),
    diffs AS (
      SELECT cents,
             abs(cum_a * 1.0 / n_a - cum_b * 1.0 / n_b) AS d
      FROM cum, tot
    ),
    peak AS (SELECT max(d) AS ks FROM diffs)
    SELECT (SELECT n_a FROM tot) AS n_a,
           (SELECT n_b FROM tot) AS n_b,
           round(ks, 6) AS ks_stat,
           round((SELECT min(cents) FROM diffs WHERE d = peak.ks) / 100.0, 2)
               AS ks_at_price
    FROM peak
    """,
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the order-price
    distributions of two market segments.

    The CDF scan orders the distinct-price relation (unbounded — grows
    with data) through ``global_running_sums``: ONE range repartition
    carrying BOTH samples' cumulative counts, each partition sorting
    only its slice. D and its location derive from exact integer
    cumulative counts divided by exact totals — bit-deterministic.
    """
    from ..functions.ranking import global_running_sums

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)
    )
    tagged = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (F.col("c_mktsegment") == KS_SEG_A).cast("int").alias("in_a"),
    )
    per_value = tagged.groupBy("cents").agg(
        F.sum("in_a").alias("cnt_a"),
        F.sum(F.lit(1) - F.col("in_a")).alias("cnt_b"),
    )
    cum = global_running_sums(
        per_value,
        [F.col("cents")],
        {"cum_a": F.col("cnt_a"), "cum_b": F.col("cnt_b")},
    )
    tot = per_value.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
        ).alias("d"),
    ).persist()
    peak = diffs.agg(F.max("d").alias("ks"))
    at = (
        diffs.join(F.broadcast(peak), F.col("d") == F.col("ks"))
        .groupBy("n_a", "n_b", "ks")
        .agg(F.min("cents").alias("at_cents"))
    )
    return at.select(
        "n_a",
        "n_b",
        F.round("ks", 6).alias("ks_stat"),
        F.round(F.col("at_cents") / 100.0, 2).alias("ks_at_price"),
    )


@register(
    "stat_chi2_segment_priority",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment, o_orderpriority,
             CAST(count(*) AS BIGINT) AS observed
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    framed AS (
      SELECT c_mktsegment, o_orderpriority, observed,
             sum(observed) OVER (PARTITION BY c_mktsegment) AS row_tot,
             sum(observed) OVER (PARTITION BY o_orderpriority) AS col_tot,
             sum(observed) OVER () AS grand
      FROM cells
    )
    SELECT c_mktsegment, o_orderpriority, observed,
           round(row_tot * 1.0 * col_tot / grand, 6) AS expected,
           round(pow(observed - row_tot * 1.0 * col_tot / grand, 2)
                 / (row_tot * 1.0 * col_tot / grand), 6) AS chi2_term
    FROM framed
    """,
)
def stat_chi2_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for market segment × order
    priority. One fact-sized aggregate to the 25-cell contingency
    table; margins are windows over that dimension-sized relation
    (partitioned by segment / by priority — never a global sort; the
    OVER () grand total folds in as a broadcast 1-row aggregate).
    Total chi² = sum(chi2_term), left per-cell so the audit can say
    WHICH cell deviates.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )
    framed = cells.withColumn(
        "row_tot", F.sum("observed").over(W.partitionBy("c_mktsegment"))
    ).withColumn(
        "col_tot", F.sum("observed").over(W.partitionBy("o_orderpriority"))
    )
    grand = cells.agg(F.sum("observed").alias("grand"))
    framed = framed.crossJoin(F.broadcast(grand))
    expected = F.col("row_tot") * 1.0 * F.col("col_tot") / F.col("grand")
    return framed.select(
        "c_mktsegment",
        "o_orderpriority",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(
            F.pow(F.col("observed") - expected, 2) / expected, 6
        ).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# Winsorized mean of order value — the robust-mean readout (clip to
# the exact [p05, p95] band before averaging) every revenue dashboard
# wants next to the raw mean, because a handful of mega-orders drags
# the raw number.
#
# Exactness policy: order values live as exact BIGINT cents; the two
# quantile bounds come from global_quantiles_cont (range-partitioned
# rank selection — no single-reducer percentile, and DuckDB's
# interpolation formula evaluated with identical IEEE steps). The
# winsorized sum decomposes into (exact integer sum of in-band cents)
# + n_below * p05 + n_above * p95 — two double products — so no
# order-dependent float summation exists anywhere in the query.
# --------------------------------------------------------------------------
@register(
    "stat_winsorized_order_value",
    oracle="""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    q AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             quantile_cont(c, 0.05) AS lo,
             quantile_cont(c, 0.95) AS hi
      FROM cents
    )
    SELECT n,
           round(lo / 100, 6) AS p05,
           round(hi / 100, 6) AS p95,
           round(sum(c) / (100.0 * n), 6) AS mean_raw,
           round((sum(CASE WHEN c > lo AND c < hi THEN c ELSE 0 END)
                  + sum(CASE WHEN c <= lo THEN 1 ELSE 0 END) * lo
                  + sum(CASE WHEN c >= hi THEN 1 ELSE 0 END) * hi)
                 / (100.0 * n), 6) AS mean_winsorized,
           CAST(sum(CASE WHEN c <= lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_lo,
           CAST(sum(CASE WHEN c >= hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_hi
    FROM cents CROSS JOIN q
    GROUP BY n, lo, hi
    """,
)
def stat_winsorized_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw vs [p05, p95]-winsorized mean order value with the exact
    continuous quantile bounds and clip counts."""
    from ..functions.ranking import global_quantiles_cont

    orders = table(spark, sf_dir, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    ).persist()
    q = global_quantiles_cont(cents, F.col("c"), {"lo": 0.05, "hi": 0.95})
    in_band = F.when(
        (F.col("c") > F.col("lo")) & (F.col("c") < F.col("hi")), F.col("c")
    ).otherwise(F.lit(0))
    below = (F.col("c") <= F.col("lo")).cast("bigint")
    above = (F.col("c") >= F.col("hi")).cast("bigint")
    return (
        cents.crossJoin(F.broadcast(q))
        .groupBy("n", "lo", "hi")
        .agg(
            F.sum("c").alias("_sum_all"),
            F.sum(in_band).alias("_sum_mid"),
            F.sum(below).alias("n_clipped_lo"),
            F.sum(above).alias("n_clipped_hi"),
        )
        .select(
            "n",
            F.round(F.col("lo") / 100, 6).alias("p05"),
            F.round(F.col("hi") / 100, 6).alias("p95"),
            F.round(F.col("_sum_all") / (100.0 * F.col("n")), 6).alias(
                "mean_raw"
            ),
            F.round(
                (
                    F.col("_sum_mid")
                    + F.col("n_clipped_lo") * F.col("lo")
                    + F.col("n_clipped_hi") * F.col("hi")
                )
                / (100.0 * F.col("n")),
                6,
            ).alias("mean_winsorized"),
            "n_clipped_lo",
            "n_clipped_hi",
        )
    )
