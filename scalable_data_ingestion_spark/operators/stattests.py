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


# --------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
# location test a pipeline reaches for when order values are too
# heavy-tailed for the t-test. Same two-segment shape as the KS scan
# (different segment pair so the two tests exercise different data).
#
# Scale shape: one fact-sized groupBy collapses the tagged sample to
# the distinct-cents grain; midranks come from the range-partitioned
# prefix-sum helper (ONE slicing carries both samples' counts — never
# a single-partition window); everything after is a scalar reduce.
# Exactness: 2*midrank = 2*cum_before + t + 1 is an exact integer, so
# the rank sum rides in DECIMAL(38,0); U, the tie-corrected variance
# and z are derived from those exact integers in identical double
# expressions on both engines.
# --------------------------------------------------------------------------
MW_SEG_A = "MACHINERY"
MW_SEG_B = "FURNITURE"
MW_Z_CRIT = 1.959964


@register(
    "stat_mann_whitney_u",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(c_mktsegment = '{MW_SEG_A}' AS INTEGER) AS in_a
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
    ),
    per_value AS (
      SELECT cents,
             CAST(sum(in_a) AS BIGINT) AS cnt_a,
             CAST(sum(1 - in_a) AS BIGINT) AS cnt_b
      FROM tagged GROUP BY cents
    ),
    cum AS (
      SELECT cents, cnt_a, cnt_b, cnt_a + cnt_b AS t,
             CAST(sum(cnt_a + cnt_b) OVER (
               ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cum_t
      FROM per_value
    ),
    parts AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             CAST(sum(CAST(cnt_a AS HUGEINT)
                      * (2 * (cum_t - t) + t + 1)) AS HUGEINT) AS r2_a,
             CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie3
      FROM cum
    ),
    stat AS (
      SELECT n_a, n_b,
             CAST(r2_a AS DOUBLE) / 2
               - CAST(n_a AS DOUBLE) * (n_a + 1) / 2 AS u_a,
             CAST(n_a AS DOUBLE) * n_b / 2 AS mu_u,
             (CAST(n_a AS DOUBLE) * n_b / 12)
               * ((n_a + n_b + 1)
                  - CAST(tie3 AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))
               AS var_u
      FROM parts
    )
    SELECT n_a, n_b,
           round(u_a, 2) AS u_stat,
           round(CASE WHEN u_a > mu_u THEN (u_a - mu_u - 0.5) / sqrt(var_u)
                      WHEN u_a < mu_u THEN (u_a - mu_u + 0.5) / sqrt(var_u)
                      ELSE 0.0 END, 6) AS z_score,
           abs(CASE WHEN u_a > mu_u THEN (u_a - mu_u - 0.5) / sqrt(var_u)
                    WHEN u_a < mu_u THEN (u_a - mu_u + 0.5) / sqrt(var_u)
                    ELSE 0.0 END) > {MW_Z_CRIT} AS significant
    FROM stat
    """,
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between {MW_SEG_A} and {MW_SEG_B} order prices.

    Midranks over the combined sample come from cumulative counts on
    the distinct-cents grain: 2*midrank = 2*cum_before + t + 1 (exact
    integer). U_a = R_a - n_a(n_a+1)/2, with the normal approximation
    z carrying the tie correction and +-0.5 continuity correction.
    """
    from ..functions.ranking import global_running_sums

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B)
    )
    tagged = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (F.col("c_mktsegment") == MW_SEG_A).cast("int").alias("in_a"),
    )
    per_value = tagged.groupBy("cents").agg(
        F.sum("in_a").cast("bigint").alias("cnt_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("cnt_b"),
    )
    t = F.col("cnt_a") + F.col("cnt_b")
    cum = global_running_sums(
        per_value.withColumn("t", t),
        [F.col("cents")],
        {"cum_t": F.col("t")},
    )
    parts = cum.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
        F.sum(
            F.col("cnt_a").cast("decimal(38,0)")
            * (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2_a"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u_a = (
        F.col("r2_a").cast("double") / 2
        - n_a.cast("double") * (n_a + 1) / 2
    )
    mu_u = n_a.cast("double") * n_b / 2
    var_u = (n_a.cast("double") * n_b / 12) * (
        (n_a + n_b + 1)
        - F.col("tie3").cast("double")
        / ((n_a + n_b).cast("double") * (n_a + n_b - 1))
    )
    z = (
        F.when(u_a > mu_u, (u_a - mu_u - 0.5) / F.sqrt(var_u))
        .when(u_a < mu_u, (u_a - mu_u + 0.5) / F.sqrt(var_u))
        .otherwise(F.lit(0.0))
    )
    return parts.select(
        "n_a",
        "n_b",
        F.round(u_a, 2).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > MW_Z_CRIT).alias("significant"),
    )


# --------------------------------------------------------------------------
# One-way ANOVA — does mean order value differ across the five market
# segments? F-statistic + eta-squared effect size.
#
# Scale shape: ONE fact-sized groupBy produces per-segment exact power
# sums (integer-dollar grid, DECIMAL(38,0) — the skew/kurtosis
# pattern); the cross-group combination folds the 5-element sorted
# group array left-to-right, so the only double summation in the whole
# query runs in a fixed order on both engines (in-order array folds
# are bit-exact cross-engine; an unordered SUM over per-group doubles
# would not be).
# --------------------------------------------------------------------------
@register(
    "stat_anova_f_segments",
    oracle="""
    WITH base AS (
      SELECT c_mktsegment,
             CAST(round(o_totalprice) AS BIGINT) AS d
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    grp AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS DOUBLE) AS s1_g
      FROM base GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS k,
             CAST(CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS DOUBLE)
                 AS s2
      FROM base
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(s1_g * s1_g / n_g ORDER BY c_mktsegment)),
               (a, b) -> a + b) AS t_between
      FROM grp
    )
    SELECT k AS k_groups, n,
           round(t_between - s1 * s1 / n, 2) AS ss_between,
           round(s2 - t_between, 2) AS ss_within,
           round(((t_between - s1 * s1 / n) / (k - 1))
                 / ((s2 - t_between) / (n - k)), 6) AS f_stat,
           round((t_between - s1 * s1 / n) / (s2 - s1 * s1 / n), 6)
               AS eta_sq
    FROM folded, tot
    """,
)
def stat_anova_f_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value (integer-dollar grid) across
    market segments: F = (SSB/(k-1)) / (SSW/(n-k)), eta^2 = SSB/SST.

    SSB and SSW both derive from T = sum_g s1_g^2/n_g, folded over the
    segment-sorted group array so the double addition order is fixed.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", F.round("o_totalprice").cast("bigint").alias("d"))
    dd = F.col("d").cast("decimal(38,0)")
    grp = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(dd).cast("decimal(38,0)").cast("double").alias("s1_g"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("k"),
        F.sum(dd).cast("decimal(38,0)").cast("double").alias("s1"),
        F.sum(dd * F.col("d")).cast("decimal(38,0)").cast("double").alias("s2"),
    )
    folded = grp.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("c_mktsegment", "n_g", "s1_g"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["s1_g"] * x["s1_g"] / x["n_g"],
        ).alias("t_between")
    )
    j = folded.crossJoin(F.broadcast(tot))
    ssb = F.col("t_between") - F.col("s1") * F.col("s1") / F.col("n")
    ssw = F.col("s2") - F.col("t_between")
    sst = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    return j.select(
        F.col("k").alias("k_groups"),
        "n",
        F.round(ssb, 2).alias("ss_between"),
        F.round(ssw, 2).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation between line-item quantity and extended
# price — the monotone-association check that survives the heavy tail
# Pearson chokes on. rho = Pearson correlation of midranks.
#
# Scale shape: each variable collapses to its distinct-value grain
# (one fact-sized groupBy each); midranks come from the
# range-partitioned prefix-sum helper; the rank join back to the fact
# table is a broadcast for the 50-value quantity side and a hash
# equi-join on cents for the price side; ONE final aggregate carries
# every cross sum in DECIMAL(38,0) (2*midrank is an exact integer, so
# rank products are exact — the scale factor 2 cancels in rho).
# --------------------------------------------------------------------------
@register(
    "stat_spearman_qty_price",
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem
    ),
    qrank AS (
      SELECT q,
             2 * (CAST(sum(count(*)) OVER (ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - count(*)) + count(*) + 1 AS rq
      FROM base GROUP BY q
    ),
    prank AS (
      SELECT p,
             2 * (CAST(sum(count(*)) OVER (ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - count(*)) + count(*) + 1 AS rp
      FROM base GROUP BY p
    ),
    ranked AS (
      SELECT CAST(rq AS HUGEINT) AS rq, CAST(rp AS HUGEINT) AS rp
      FROM base JOIN qrank USING (q) JOIN prank USING (p)
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(rq) AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(sum(rp) AS HUGEINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(rq * rq) AS HUGEINT) AS DOUBLE) AS sxx,
             CAST(CAST(sum(rp * rp) AS HUGEINT) AS DOUBLE) AS syy,
             CAST(CAST(sum(rq * rp) AS HUGEINT) AS DOUBLE) AS sxy
      FROM ranked
    )
    SELECT n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS rho_spearman
    FROM sums
    """,
)
def stat_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between l_quantity and l_extendedprice via exact
    integer midranks (2*midrank = 2*cum_before + t + 1)."""
    from ..functions.ranking import global_running_sums

    li = table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
    )

    def midranks(df: DataFrame, col: str, out: str) -> DataFrame:
        per = df.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        cum = global_running_sums(per, [F.col(col)], {"cum_t": F.col("t")})
        return cum.select(
            col,
            (
                2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1
            ).alias(out),
        )

    qrank = midranks(li, "q", "rq")
    prank = midranks(li, "p", "rp")
    ranked = li.join(F.broadcast(qrank), "q").join(prank, "p")
    rq = F.col("rq").cast("decimal(38,0)")
    rp = F.col("rp").cast("decimal(38,0)")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rq).cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum(rp).cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum(rq * F.col("rq")).cast("decimal(38,0)").cast("double").alias("sxx"),
        F.sum(rp * F.col("rp")).cast("decimal(38,0)").cast("double").alias("syy"),
        F.sum(rq * F.col("rp")).cast("decimal(38,0)").cast("double").alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("n", F.round(num / den, 6).alias("rho_spearman"))


# --------------------------------------------------------------------------
# Kendall tau-b between the daily order count and the daily revenue —
# the rank-concordance companion to Mann-Kendall (which tests ONE
# series against time; tau-b tests two series against each other,
# with the tie correction in both margins).
#
# Scale shape: identical to Mann-Kendall — one fact-sized groupBy to
# the calendar-bounded day grain, then an O(days^2) broadcast pair
# join whose cost is independent of corpus size. S and both tie sums
# are exact BIGINTs; tau_b's sqrt runs once on exact integers.
# --------------------------------------------------------------------------
@register(
    "stat_kendall_tau_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)
                      * CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    tx AS (
      SELECT CAST(COALESCE(sum(t * (t - 1) / 2), 0) AS BIGINT) AS n1
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY x) g
      WHERE t > 1
    ),
    ty AS (
      SELECT CAST(COALESCE(sum(t * (t - 1) / 2), 0) AS BIGINT) AS n2
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y) g
      WHERE t > 1
    )
    SELECT n_days, s_stat, n1 AS ties_x, n2 AS ties_y,
           round(s_stat / sqrt(
             (CAST(n_days AS DOUBLE) * (n_days - 1) / 2 - n1)
             * (CAST(n_days AS DOUBLE) * (n_days - 1) / 2 - n2)), 6)
               AS tau_b
    FROM s, n, tx, ty
    """,
)
def stat_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order volume and daily revenue."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .persist()
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).agg(
        F.sum(
            F.signum(F.col("b.x") - F.col("a.x")).cast("bigint")
            * F.signum(F.col("b.y") - F.col("a.y")).cast("bigint")
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))

    def tie_sum(col: str, out: str) -> DataFrame:
        return (
            daily.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
            .filter(F.col("t") > 1)
            .agg(
                F.coalesce(
                    F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("bigint"),
                    F.lit(0),
                ).alias(out)
            )
        )

    j = (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tie_sum("x", "n1")))
        .crossJoin(F.broadcast(tie_sum("y", "n2")))
    )
    n0 = F.col("n_days").cast("double") * (F.col("n_days") - 1) / 2
    return j.select(
        "n_days",
        "s_stat",
        F.col("n1").alias("ties_x"),
        F.col("n2").alias("ties_y"),
        F.round(
            F.col("s_stat")
            / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
            6,
        ).alias("tau_b"),
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR across the per-segment urgency tests — the
# multiple-comparisons control an experimentation platform applies
# when it screens MANY segments at once: each segment's two-proportion
# z (urgent-order share in the segment vs the rest), ranked by
# evidence, rejected by the BH step-up rule at FDR alpha=0.05.
#
# BH compares the i-th smallest p-value against alpha*i/m; because the
# two-sided p is a monotone function of |z|, the comparison is done
# entirely in z-space against PRECOMPUTED normal quantiles (module
# import time, statistics.NormalDist — the same literals are baked
# into both engines' SQL, so no erf/cdf evaluation happens in either
# engine and the hash cannot drift).
#
# Scale shape: one fact-sized conditional-count groupBy to the
# 5-segment grain; ranking and the step-up scan are windows over that
# dimension-sized relation. Counts are exact; z is a fixed double
# expression of them.
# --------------------------------------------------------------------------
from statistics import NormalDist as _ND

BH_ALPHA = 0.05
BH_M = 5  # market segments in the fixture
# z-threshold for the i-th BH critical p: |z| >= thr(i)  <=>  p_i <= alpha*i/m
BH_THR = tuple(
    round(_ND().inv_cdf(1 - BH_ALPHA * i / BH_M / 2), 6)
    for i in range(1, BH_M + 1)
)


@register(
    "stat_bh_fdr_segments",
    oracle=f"""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS u_seg
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_seg) AS BIGINT) AS n,
             CAST(sum(u_seg) AS BIGINT) AS u
      FROM seg
    ),
    z AS (
      SELECT c_mktsegment, n_seg, u_seg,
             (u_seg * 1.0 / n_seg - (u - u_seg) * 1.0 / (n - n_seg))
             / sqrt((u * 1.0 / n) * (1 - u * 1.0 / n)
                    * (1.0 / n_seg + 1.0 / (n - n_seg))) AS z_score
      FROM seg, tot
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
               ORDER BY abs(z_score) DESC, c_mktsegment) AS BIGINT) AS p_rank
      FROM z
    ),
    flagged AS (
      SELECT *,
             CASE p_rank {' '.join(f"WHEN {i + 1} THEN {t}" for i, t in enumerate(BH_THR))}
             END AS bh_thr_z,
             CASE WHEN abs(z_score) >= (CASE p_rank
               {' '.join(f"WHEN {i + 1} THEN {t}" for i, t in enumerate(BH_THR))}
             END) THEN p_rank ELSE 0 END AS hit_rank
      FROM ranked
    )
    SELECT c_mktsegment, n_seg, u_seg,
           round(z_score, 6) AS z_score,
           p_rank,
           round(bh_thr_z, 6) AS bh_thr_z,
           p_rank <= max(hit_rank) OVER () AS rejected
    FROM flagged
    """,
)
def stat_bh_fdr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment urgent-share z-tests with Benjamini-Hochberg
    step-up FDR control, evaluated in z-space against precomputed
    normal quantiles."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    seg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seg"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("bigint")
            .alias("u_seg"),
        )
    )
    tot = seg.agg(
        F.sum("n_seg").cast("bigint").alias("n"),
        F.sum("u_seg").cast("bigint").alias("u"),
    )
    z_expr = (
        F.col("u_seg") * 1.0 / F.col("n_seg")
        - (F.col("u") - F.col("u_seg")) * 1.0 / (F.col("n") - F.col("n_seg"))
    ) / F.sqrt(
        (F.col("u") * 1.0 / F.col("n"))
        * (1 - F.col("u") * 1.0 / F.col("n"))
        * (1.0 / F.col("n_seg") + 1.0 / (F.col("n") - F.col("n_seg")))
    )
    z = seg.crossJoin(F.broadcast(tot)).withColumn("z_score", z_expr)
    # dimension-sized (5 segments): unpartitioned windows are bounded
    rank_w = W.orderBy(F.abs(F.col("z_score")).desc(), F.col("c_mktsegment"))
    ranked = z.withColumn(
        "p_rank", F.row_number().over(rank_w).cast("bigint")
    )
    thr = F.col("p_rank")
    thr_expr = F.lit(None).cast("double")
    for i, t in enumerate(BH_THR):
        thr_expr = F.when(thr == i + 1, F.lit(t)).otherwise(thr_expr)
    flagged = ranked.withColumn("bh_thr_z", thr_expr).withColumn(
        "hit_rank",
        F.when(
            F.abs(F.col("z_score")) >= F.col("bh_thr_z"), F.col("p_rank")
        ).otherwise(F.lit(0)),
    )
    return flagged.select(
        "c_mktsegment",
        "n_seg",
        "u_seg",
        F.round("z_score", 6).alias("z_score"),
        "p_rank",
        F.round("bh_thr_z", 6).alias("bh_thr_z"),
        (
            F.col("p_rank")
            <= F.max("hit_rank").over(
                W.partitionBy().rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
        ).alias("rejected"),
    )


# --------------------------------------------------------------------------
# Brown-Forsythe test (the median-centered Levene variant) for
# variance homogeneity of order value across market segments — the
# robustness companion to stat_anova_f_segments: ANOVA assumes equal
# group variances; this IS the test of that assumption, run as a
# one-way ANOVA on the absolute deviations from each group's median.
#
# Exactness: group medians interpolate identically cross-engine
# (Spark percentile == DuckDB quantile_cont) and land on the
# half-cent grid, so 2*median is an exact integer; the per-row
# deviation d = |2*cents - med2| is an exact BIGINT; from there the
# query is literally the ANOVA pattern (exact/HUGEINT moment sums,
# cross-group double terms folded in segment order).
#
# Scale shape: two fact-sized aggregates (the median rollup, then the
# deviation moment rollup after a broadcast join of the 5-row median
# table) — no window over the fact, no sort.
# --------------------------------------------------------------------------
BF_F_CRIT_4INF_95 = 2.372  # F(4, inf) upper 5% point, public tables


@register(
    "stat_brown_forsythe_segments",
    oracle=f"""
    WITH base AS (
      SELECT c_mktsegment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    med AS (
      SELECT c_mktsegment,
             CAST(round(2 * quantile_cont(cents, 0.5)) AS BIGINT) AS med2
      FROM base GROUP BY 1
    ),
    dev AS (
      SELECT b.c_mktsegment, abs(2 * b.cents - m.med2) AS d
      FROM base b JOIN med m USING (c_mktsegment)
    ),
    grp AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS DOUBLE) AS s1_g
      FROM dev GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS k,
             CAST(CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS DOUBLE)
                 AS s2
      FROM dev
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(s1_g * s1_g / n_g ORDER BY c_mktsegment)),
               (a, b) -> a + b) AS t_between
      FROM grp
    )
    SELECT k AS k_groups, n,
           round(((t_between - s1 * s1 / n) / (k - 1))
                 / ((s2 - t_between) / (n - k)), 6) AS f_bf,
           ((t_between - s1 * s1 / n) / (k - 1))
             / ((s2 - t_between) / (n - k)) > {BF_F_CRIT_4INF_95}
               AS heteroscedastic
    FROM folded, tot
    """,
)
def stat_brown_forsythe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) F for order-value
    variance homogeneity across market segments."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).persist()
    # base feeds the median pass AND the deviation pass; dev feeds the
    # per-group and total aggregates — persist both so the
    # orders-customer join runs once.
    med = base.groupBy("c_mktsegment").agg(
        F.round(2 * F.percentile("cents", F.lit(0.5)))
        .cast("bigint")
        .alias("med2")
    )
    dev = base.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("d"),
    ).persist()
    dd = F.col("d").cast("decimal(38,0)")
    grp = dev.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(dd).cast("decimal(38,0)").cast("double").alias("s1_g"),
    )
    tot = dev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("k"),
        F.sum(dd).cast("decimal(38,0)").cast("double").alias("s1"),
        F.sum(dd * F.col("d")).cast("decimal(38,0)").cast("double").alias("s2"),
    )
    folded = grp.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("c_mktsegment", "n_g", "s1_g"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["s1_g"] * x["s1_g"] / x["n_g"],
        ).alias("t_between")
    )
    j = folded.crossJoin(F.broadcast(tot))
    f_bf = (
        (F.col("t_between") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("k") - 1)
    ) / ((F.col("s2") - F.col("t_between")) / (F.col("n") - F.col("k")))
    return j.select(
        F.col("k").alias("k_groups"),
        "n",
        F.round(f_bf, 6).alias("f_bf"),
        (f_bf > BF_F_CRIT_4INF_95).alias("heteroscedastic"),
    )


# --------------------------------------------------------------------------
# Mutual information between event type and (arithmetic) day-of-week
# — "does WHAT users do depend on WHEN in the week they do it?" as a
# single information-theoretic number, with the normalized variant
# (MI / min(H_type, H_dow)) for cross-dataset comparability.
#
# Exactness: the contingency table and both margins are exact BIGINT
# counts from ONE fact-sized groupBy (margins roll up from the 28-cell
# table, not from re-scans); each cell's p*ln term quantizes to 1e-9
# fixed point before the (exact BIGINT) sum — the txt_unigram_entropy
# policy, so the result is invariant to aggregation order. Day-of-week
# is epoch-day arithmetic, not engine dayofweek() (convention-free).
# --------------------------------------------------------------------------
MI_FX = 10**9


@register(
    "stat_event_dow_mutual_info",
    oracle=f"""
    WITH cells AS (
      SELECT event_type,
             ((date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) + 3) % 7) + 1
                 AS dow,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    rx AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1),
    ry AS (SELECT dow, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    mi_terms AS (
      SELECT CAST(floor((c * 1.0 / n)
                        * ln((n * 1.0 * c) / (CAST(cx AS DOUBLE) * cy))
                        * {MI_FX}) AS BIGINT) AS t_fx
      FROM cells JOIN rx USING (event_type) JOIN ry USING (dow) CROSS JOIN n
    ),
    hx_terms AS (
      SELECT CAST(floor(-(cx * 1.0 / n) * ln(cx * 1.0 / n) * {MI_FX})
                  AS BIGINT) AS t_fx
      FROM rx CROSS JOIN n
    ),
    hy_terms AS (
      SELECT CAST(floor(-(cy * 1.0 / n) * ln(cy * 1.0 / n) * {MI_FX})
                  AS BIGINT) AS t_fx
      FROM ry CROSS JOIN n
    )
    SELECT (SELECT n FROM n) AS n_events,
           (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells,
           round((SELECT sum(t_fx) FROM mi_terms) / {MI_FX}.0, 6) AS mi_nats,
           round((SELECT sum(t_fx) FROM mi_terms) * 1.0
                 / least((SELECT sum(t_fx) FROM hx_terms),
                         (SELECT sum(t_fx) FROM hy_terms)), 6) AS nmi
    """,
)
def stat_event_dow_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) and min-entropy-normalized MI between
    event type and arithmetic day-of-week."""
    ev = table(spark, sf_dir, "events")
    dow = (
        (
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.to_date(F.lit("1970-01-01")),
            )
            + 3
        )
        % 7
        + 1
    )
    cells = ev.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cells = cells.persist()
    rx = cells.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("cx")
    )
    ry = cells.groupBy("dow").agg(F.sum("c").cast("bigint").alias("cy"))
    n = cells.agg(F.sum("c").cast("bigint").alias("n"))
    mi_t = (
        cells.join(F.broadcast(rx), "event_type")
        .join(F.broadcast(ry), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(
                (F.col("c") * 1.0 / F.col("n"))
                * F.log(
                    (F.col("n") * 1.0 * F.col("c"))
                    / (F.col("cx").cast("double") * F.col("cy"))
                )
                * MI_FX
            )
            .cast("bigint")
            .alias("t_fx")
        )
        .agg(F.sum("t_fx").alias("mi_fx"))
    )
    hx = (
        rx.crossJoin(F.broadcast(n))
        .select(
            F.floor(
                -(F.col("cx") * 1.0 / F.col("n"))
                * F.log(F.col("cx") * 1.0 / F.col("n"))
                * MI_FX
            )
            .cast("bigint")
            .alias("t_fx")
        )
        .agg(F.sum("t_fx").alias("hx_fx"))
    )
    hy = (
        ry.crossJoin(F.broadcast(n))
        .select(
            F.floor(
                -(F.col("cy") * 1.0 / F.col("n"))
                * F.log(F.col("cy") * 1.0 / F.col("n"))
                * MI_FX
            )
            .cast("bigint")
            .alias("t_fx")
        )
        .agg(F.sum("t_fx").alias("hy_fx"))
    )
    n_cells = cells.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    return (
        n.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(mi_t))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n").alias("n_events"),
            "n_cells",
            F.round(F.col("mi_fx") / float(MI_FX), 6).alias("mi_nats"),
            F.round(
                F.col("mi_fx") * 1.0 / F.least(F.col("hx_fx"), F.col("hy_fx")),
                6,
            ).alias("nmi"),
        )
    )


# --------------------------------------------------------------------------
# Cramer's V association between market segment and order priority —
# the effect-size companion to a chi-square independence test:
# bounded [0,1], comparable across tables of different size, the
# number a data-quality monitor tracks to catch upstream drift in
# categorical couplings.
#
# Exactness: contingency and margin counts are exact BIGINT from one
# fact-sized groupBy; each cell's o^2/(r*c) contribution quantizes to
# 1e-12 fixed point before the exact sum (chi2 = n*(sum - 1) needs no
# per-cell expected-count division).
# --------------------------------------------------------------------------
CV_FX = 10**12


@register(
    "stat_cramers_v_priority_segment",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    rx AS (SELECT seg, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1),
    ry AS (SELECT pri, CAST(sum(c) AS BIGINT) AS col_n FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    dims AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM rx) AS nr,
             (SELECT CAST(count(*) AS BIGINT) FROM ry) AS nc
    ),
    terms AS (
      SELECT CAST(floor((c * 1.0 * c) / (CAST(r AS DOUBLE) * col_n)
                        * {CV_FX}) AS BIGINT) AS t_fx
      FROM cells JOIN rx USING (seg) JOIN ry USING (pri)
    )
    SELECT n.n AS n_orders, dims.nr AS n_segments, dims.nc AS n_priorities,
           round(n.n * ((SELECT sum(t_fx) FROM terms) / {CV_FX}.0 - 1.0), 4)
               AS chi2,
           round(sqrt(((SELECT sum(t_fx) FROM terms) / {CV_FX}.0 - 1.0)
                      / (least(dims.nr, dims.nc) - 1)), 6) AS cramers_v
    FROM n, dims
    """,
)
def stat_cramers_v_priority_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramer's V (with the underlying chi-square) for the market
    segment x order priority contingency table."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    rx = cells.groupBy("seg").agg(F.sum("c").cast("bigint").alias("r"))
    ry = cells.groupBy("pri").agg(F.sum("c").cast("bigint").alias("col_n"))
    n = cells.agg(F.sum("c").cast("bigint").alias("n"))
    dims = rx.agg(F.count(F.lit(1)).cast("bigint").alias("nr")).crossJoin(
        F.broadcast(ry.agg(F.count(F.lit(1)).cast("bigint").alias("nc")))
    )
    terms = (
        cells.join(F.broadcast(rx), "seg")
        .join(F.broadcast(ry), "pri")
        .select(
            F.floor(
                (F.col("c") * 1.0 * F.col("c"))
                / (F.col("r").cast("double") * F.col("col_n"))
                * CV_FX
            )
            .cast("bigint")
            .alias("t_fx")
        )
        .agg(F.sum("t_fx").alias("s_fx"))
    )
    j = (
        n.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(terms))
    )
    phi2 = F.col("s_fx") / float(CV_FX) - 1.0
    return j.select(
        F.col("n").alias("n_orders"),
        F.col("nr").alias("n_segments"),
        F.col("nc").alias("n_priorities"),
        F.round(F.col("n") * phi2, 4).alias("chi2"),
        F.round(
            F.sqrt(phi2 / (F.least(F.col("nr"), F.col("nc")) - 1)), 6
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Price elasticity of demand per brand — the log-log regression
# elasticity = d ln(qty) / d ln(unit price), one closed-form OLS per
# brand from a single grouped pass (the econometric reading of the
# grouped-trend machinery: slope < -1 = elastic, revenue falls when
# price rises).
#
# Exactness: per-row ln(unit price) and ln(qty) quantize to 1e-9
# fixed point (the entropy-term policy) so every grouped moment sum
# is exact (BIGINT / decimal-HUGEINT for the cross products); the
# slope is a ratio of those sums, so the 1e-9 scale cancels.
# --------------------------------------------------------------------------
ELAST_FX = 10**9


@register(
    "stat_price_elasticity",
    oracle=f"""
    WITH rows_ AS (
      SELECT p_brand,
             CAST(floor(ln(l_extendedprice / l_quantity) * {ELAST_FX})
                  AS BIGINT) AS x,
             CAST(floor(ln(l_quantity) * {ELAST_FX}) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    sums AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM rows_ GROUP BY p_brand
    )
    SELECT p_brand,
           n,
           round((n * sxy - CAST(sx AS DOUBLE) * sy)
                 / (n * sxx - CAST(sx AS DOUBLE) * sx), 6) AS elasticity,
           (n * sxy - CAST(sx AS DOUBLE) * sy)
             / (n * sxx - CAST(sx AS DOUBLE) * sx) < -1.0 AS elastic
    FROM sums
    """,
)
def stat_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand elasticity (qty vs unit price) per part brand."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rows_ = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.floor(
            F.log(F.col("l_extendedprice") / F.col("l_quantity")) * ELAST_FX
        )
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("l_quantity")) * ELAST_FX)
        .cast("bigint")
        .alias("y"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    sums = rows_.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dx * F.col("x")).cast("double").alias("sxx"),
        F.sum(dx * F.col("y")).cast("double").alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return sums.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("elasticity"),
        (slope < -1.0).alias("elastic"),
    )


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence interval for the mean order value —
# THE distributed bootstrap: classical resampling needs a global
# sample of size n per replicate (a shuffle per replicate), but
# weighting each row Poisson(1) per replicate is i.i.d. PER ROW, so
# all B replicates compute in ONE map-side pass. Standard production
# technique for CIs over terabyte facts.
#
# Determinism & cost: FOUR md5 calls per row yield 512 bits = 32
# sixteen-bit uniforms (one per replicate) — not 32 md5 calls (that
# variant measured 9.0 s at sf0.1; the hex-slice-per-replicate explode
# 3.5 s; the round-8 version below 1.9 s: the 512 hash bits pack into
# 12 bigints ONCE per row — conv() is the expensive step — and each
# replicate's u16 is a shift/mask, so the explode carries longs and
# the per-(row, replicate) work is pure int ops. The no-explode
# variant — all 64 replicate sums as ONE giant aggregate projection —
# measured 7.8 s with string slices and still 2.9 s with packed ints:
# the 32-wide CASE forest costs more in codegen than the explode
# costs in rows, so the explode stays; re-measured r8). Each u16
# compares against the Poisson(1) CDF quantized at 2^16 (Python
# literals baked into both engines — the bh_fdr quantile-precompute
# policy; the <=1e-5 CDF quantization is part of the statistic's
# definition). Weights are small ints, replicate sums are exact
# BIGINTs, and the CI bounds are order statistics of the 32
# replicate means.
# --------------------------------------------------------------------------
BOOT_B = 32
_POIS1_CDF = []
_acc = 0.0
_term = 2.718281828459045 ** -1  # e^-1; P(k) = e^-1 / k!
for _k in range(6):
    _acc += _term
    _POIS1_CDF.append(_acc)
    _term /= _k + 1
BOOT_THRESH = tuple(int(c * 2**16) for c in _POIS1_CDF)  # u16 < t[k] -> w <= k


def _boot_w_sql(u: str) -> str:
    expr = "6"
    for k in range(len(BOOT_THRESH) - 1, -1, -1):
        expr = f"CASE WHEN {u} < {BOOT_THRESH[k]} THEN {k} ELSE {expr} END"
    return expr


_BOOT_H_COLS = ", ".join(
    f"md5(CAST(o_orderkey AS VARCHAR) || '#{i}') AS h{i}" for i in range(4)
)

# Each 32-hex md5 packs into THREE bigints (12+12+8 hex = 48+48+32
# bits), so the string->int parse runs 12x per ROW; the per-replicate
# u16 extraction is then a pure shift/mask over the packed columns —
# integer ops instead of a substring+parse per (row, replicate). Field
# layout is big-endian, so u16 values are bit-identical to slicing the
# hex directly (the statistic's outputs are unchanged).
_BOOT_PACK_SLICES = ((1, 12, 3), (13, 12, 3), (25, 8, 2))  # start, hexlen, fields


def _boot_pack_cols(hex_to_int) -> list[str]:
    """The 12 packed-column SQL exprs c{j}{s}; hex_to_int(slice_sql)
    renders the engine's hex parse (Spark conv / DuckDB 0x-cast)."""
    return [
        f"{hex_to_int(f'substr(h{j}, {start}, {n})')} AS c{j}{s}"
        for j in range(4)
        for s, (start, n, _) in enumerate(_BOOT_PACK_SLICES)
    ]


def _boot_u_sql(b: str) -> str:
    """u16 for replicate ``b`` from the packed columns: pick md5 j =
    b//8 and slice s by field index i = b%8 (i<3 -> s0, i<6 -> s1,
    else s2), then shift the field down and mask. Pure int ops —
    valid, and identical, in Spark SQL and DuckDB."""

    def pick(j: int) -> str:
        return (f"CASE WHEN ({b}%8)<3 THEN c{j}0 "
                f"WHEN ({b}%8)<6 THEN c{j}1 ELSE c{j}2 END")

    d = (f"CASE WHEN {b}<8 THEN {pick(0)} WHEN {b}<16 THEN {pick(1)} "
         f"WHEN {b}<24 THEN {pick(2)} ELSE {pick(3)} END")
    shift = (f"CASE WHEN ({b}%8)<3 THEN (2-({b}%8))*16 "
             f"WHEN ({b}%8)<6 THEN (5-({b}%8))*16 "
             f"WHEN ({b}%8)=6 THEN 16 ELSE 0 END")
    return f"CAST((({d}) >> ({shift})) & 65535 AS INT)"


_BOOT_W_EXPR = _boot_w_sql(_boot_u_sql("b.b"))
# DuckDB parses '0x…'::BIGINT natively; Spark uses conv(hex, 16, 10).
_BOOT_PACK_DUCK = ", ".join(
    _boot_pack_cols(lambda s: f"CAST('0x' || {s} AS BIGINT)")
)
_BOOT_PACK_SPARK = _boot_pack_cols(
    lambda s: f"CAST(conv({s}, 16, 10) AS BIGINT)"
)


@register(
    "stat_poisson_bootstrap_ci",
    oracle=f"""
    WITH hashed AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             {_BOOT_H_COLS}
      FROM orders
    ),
    packed AS (
      SELECT cents, {_BOOT_PACK_DUCK}
      FROM hashed
    ),
    reps AS (
      SELECT b.b, cents,
             ({_BOOT_W_EXPR}) AS w
      FROM packed CROSS JOIN (SELECT unnest(range({BOOT_B})) AS b) b
    ),
    per_rep AS (
      SELECT b, CAST(sum(w) AS BIGINT) AS n_b,
             CAST(sum(w * cents) AS BIGINT) AS s_b
      FROM reps GROUP BY b
    ),
    means AS (
      SELECT list_sort(list(s_b * 1.0 / (100.0 * n_b))) AS ms FROM per_rep
    ),
    point AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS s
      FROM orders
    )
    SELECT n AS n_orders, CAST({BOOT_B} AS BIGINT) AS n_replicates,
           round(s / (100.0 * n), 4) AS mean_value,
           round(ms[2], 4) AS ci_lo,
           round(ms[{BOOT_B - 1}], 4) AS ci_hi
    FROM means, point
    """,
)
def stat_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap ({BOOT_B} replicates, one map-side pass) CI
    for the mean order value."""
    orders = table(spark, sf_dir, "orders")
    hashed = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        *[
            F.md5(
                F.concat(F.col("o_orderkey").cast("string"), F.lit(f"#{i}"))
            ).alias(f"h{i}")
            for i in range(4)
        ],
    )
    # Pack the 512 hash bits into 12 bigints ONCE per row (the
    # string->int parse is the expensive step), then each replicate's
    # u16 is a shift/mask — the explode carries longs, not hex
    # strings, and the per-(row, replicate) work is pure int ops.
    packed = hashed.selectExpr("cents", *_BOOT_PACK_SPARK)
    reps = packed.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        *[f"c{j}{s}" for j in range(4) for s in range(3)],
    )
    u = F.expr(_boot_u_sql("b"))
    w = F.lit(6)
    for k in range(len(BOOT_THRESH) - 1, -1, -1):
        w = F.when(u < BOOT_THRESH[k], F.lit(k)).otherwise(w)
    per_rep = reps.select("b", "cents", w.alias("w")).groupBy("b").agg(
        F.sum("w").cast("bigint").alias("n_b"),
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("s_b"),
    )
    means = per_rep.agg(
        F.sort_array(
            F.collect_list(F.col("s_b") * 1.0 / (100.0 * F.col("n_b")))
        ).alias("ms")
    )
    point = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("s"),
    )
    return means.crossJoin(F.broadcast(point)).select(
        F.col("n").alias("n_orders"),
        F.lit(BOOT_B).cast("bigint").alias("n_replicates"),
        F.round(F.col("s") / (100.0 * F.col("n")), 4).alias("mean_value"),
        F.round(F.element_at("ms", 2), 4).alias("ci_lo"),
        F.round(F.element_at("ms", BOOT_B - 1), 4).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# Round-6 robust-estimation batch.
#
# Hodges-Lehmann location estimator of daily revenue: the median of
# all Walsh averages (x_i + x_j)/2, i <= j — the rank-based location
# estimate behind the Wilcoxon signed-rank test, ~95% as efficient as
# the mean under normality and 29%-breakdown robust. The pair join is
# over the DAY-grain series (dimension-sized after the fact-table
# reduction: ~2.4k days at any SF, so <3M broadcast-joined pairs with
# zero shuffle on the pair side); doubling the average keeps every
# Walsh point an exact BIGINT, and the median of integers is exact in
# both engines (Spark percentile == DuckDB quantile_cont, worst case a
# .5 midpoint — exactly representable).
# --------------------------------------------------------------------------
@register(
    "stat_hodges_lehmann_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS}),
    walsh AS (
      SELECT a.cents + b.cents AS x2
      FROM daily a JOIN daily b ON a.d <= b.d
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           CAST(count(*) AS BIGINT) AS n_walsh,
           round(quantile_cont(x2, 0.5), 1) AS hl_x2_cents,
           round(quantile_cont(x2, 0.5) / 200.0, 4) AS hl_estimate
    FROM walsh
    """,
)
def stat_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudomedian of daily revenue (median of Walsh
    averages), kept exact by carrying doubled sums as BIGINT.

    The median over the ~n^2/2 Walsh points uses the range-partitioned
    global_quantiles_cont scan, not Spark's exact-percentile aggregate:
    the latter merges per-partition value maps into one reducer, which
    profiling showed costs ~8 s on 2.9M pairs (flat across SF since the
    day grain is calendar-bounded) vs ~1 s for the ranking pass."""
    from ..functions.ranking import global_quantiles_cont

    daily = _daily_cents(spark, sf_dir).persist()
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    walsh = a.join(F.broadcast(b), F.col("da") <= F.col("db")).select(
        (F.col("ca") + F.col("cb")).cast("bigint").alias("x2")
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    med = global_quantiles_cont(
        walsh, F.col("x2"), {"_hl_x2": 0.5}, n_col="n_walsh"
    )
    return med.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("n_walsh").cast("bigint").alias("n_walsh"),
        F.round(F.col("_hl_x2"), 1).alias("hl_x2_cents"),
        F.round(F.col("_hl_x2") / 200.0, 4).alias("hl_estimate"),
    )


# --------------------------------------------------------------------------
# McNemar's test for paired binary outcomes: did the population of
# known customers change purchasing state between two years? The
# pairing is per-customer (same subject measured twice), so the
# discordant cells b (active 1994, silent 1995) and c (silent 1994,
# active 1995) carry all the information; chi2 = (b-c)^2/(b+c) is an
# exact integer rational, reported as num/den plus the
# continuity-corrected variant — no float statistic at all.
#
# Scale shape: two conditional-aggregation passes over orders at
# customer grain, one broadcast-joinable outer join against the
# customer dimension for the concordant "neither" cell. No pair
# explosion — McNemar only needs the 2x2 table.
# --------------------------------------------------------------------------
MCN_YEAR_A = 1994
MCN_YEAR_B = 1995


@register(
    "stat_mcnemar_repeat_years",
    oracle=f"""
    WITH flags AS (
      SELECT c.c_custkey,
             max(CASE WHEN year(o.o_orderdate) = {MCN_YEAR_A}
                      THEN 1 ELSE 0 END) AS y_a,
             max(CASE WHEN year(o.o_orderdate) = {MCN_YEAR_B}
                      THEN 1 ELSE 0 END) AS y_b
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN y_a = 1 AND y_b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN y_a = 1 AND y_b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN y_a = 0 AND y_b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN y_a = 0 AND y_b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_neither
      FROM flags
    )
    SELECT n_both, b, c, n_neither,
           (b - c) * (b - c) AS chi2_num,
           b + c AS chi2_den,
           CASE WHEN abs(b - c) >= 1
                THEN (abs(b - c) - 1) * (abs(b - c) - 1)
                ELSE CAST(0 AS BIGINT) END AS chi2_cc_num
    FROM cells
    """,
)
def stat_mcnemar_repeat_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar 2x2 discordance table for per-customer purchasing state
    {MCN_YEAR_A} vs {MCN_YEAR_B}, with the chi-square statistic as an
    exact integer rational (plus Edwards continuity correction)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    yr = F.year("o_orderdate")
    flags = (
        customer.select("c_custkey")
        .join(
            orders.select(F.col("o_custkey"), yr.alias("yr")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(F.col("yr") == MCN_YEAR_A, 1).otherwise(0)
            ).alias("y_a"),
            F.max(
                F.when(F.col("yr") == MCN_YEAR_B, 1).otherwise(0)
            ).alias("y_b"),
        )
    )
    cells = flags.agg(
        F.sum(F.when((F.col("y_a") == 1) & (F.col("y_b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both"),
        F.sum(F.when((F.col("y_a") == 1) & (F.col("y_b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("y_a") == 0) & (F.col("y_b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("y_a") == 0) & (F.col("y_b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neither"),
    )
    diff = F.col("b") - F.col("c")
    return cells.select(
        "n_both",
        "b",
        "c",
        "n_neither",
        (diff * diff).cast("bigint").alias("chi2_num"),
        (F.col("b") + F.col("c")).cast("bigint").alias("chi2_den"),
        F.when(
            F.abs(diff) >= 1,
            (F.abs(diff) - 1) * (F.abs(diff) - 1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("chi2_cc_num"),
    )


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test — is the daily-revenue sequence random
# around its median, or does it trend/cluster? R = number of runs of
# consecutive above/below-median days; under H0,
#   mu = 2 n1 n2 / (n1 + n2) + 1,
#   var = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1)).
# The run count comes from ONE ranked-axis lag pass (run starts are
# sign changes — integer comparisons on exact cents vs the exact
# interpolated median); mu/var/z are scalar expressions over the
# integer (R, n1, n2), identical IEEE steps cross-engine.
# --------------------------------------------------------------------------
@register(
    "stat_runs_test_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS}),
    med AS (SELECT quantile_cont(cents, 0.5) AS m FROM daily),
    signed AS (
      SELECT d, CASE WHEN cents > m THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN med WHERE cents <> m
    ),
    seq AS (
      SELECT above,
             lag(above) OVER (ORDER BY d) AS prev
      FROM signed
    ),
    counts AS (
      SELECT CAST(sum(above) AS BIGINT) AS n1,
             CAST(sum(1 - above) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN prev IS NULL OR above <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM seq
    )
    SELECT n1, n2, r,
           round(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS mu,
           round(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                 / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1)), 6)
               AS var_r,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))), 6)
               AS z_score
    FROM counts
    """,
)
def stat_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of daily revenue around its median
    (exact run/side counts, scalar float finale)."""
    daily = _daily_cents(spark, sf_dir).persist()
    med = daily.agg(F.percentile("cents", F.lit(0.5)).alias("m"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("m"))
        .select(
            "d", F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("above")
        )
    )
    w = W.orderBy("d")
    seq = signed.withColumn("prev", F.lag("above").over(w))
    counts = seq.agg(
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("above") != F.col("prev")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))
    )
    return counts.select(
        "n1",
        "n2",
        "r",
        F.round(mu, 6).alias("mu"),
        F.round(var, 6).alias("var_r"),
        F.round((r - mu) / F.sqrt(var), 6).alias("z_score"),
    )
