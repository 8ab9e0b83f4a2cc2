"""Pipeline observability: distribution-drift monitoring (PSI).

A continuously-fed training-data pipeline needs drift alarms between
data slices (yesterday vs today, source A vs source B) *computed inside
the engine*, not by exporting samples. The standard industry metric is
the Population Stability Index:

    PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref)

with PSI < 0.1 read as stable, 0.1-0.25 as moderate drift, > 0.25 as
action-needed.

``mon_length_drift_psi`` compares the document-length distribution of
two corpus slices (even vs odd doc_id here — the stand-in for two
ingestion windows) over fixed bin edges. Fixed edges (not quantiles)
keep the monitor deterministic and mergeable: per-bin counts are plain
conditional sums that partial-aggregate map-side, so the monitor runs
as one dimension-sized aggregate over any corpus volume — the
per-slice shares and PSI terms are derived arithmetic on an
(#bins)-row relation. Laplace smoothing (+1 per bin) keeps ln() finite
on empty bins without branching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# fixed n_chars bin edges; last bin open-ended
PSI_EDGES = (50, 100, 150, 200, 250, 300)


def _bin_sql(col: str) -> str:
    branches = " ".join(
        f"WHEN {col} < {e} THEN {i}" for i, e in enumerate(PSI_EDGES)
    )
    return f"(CASE {branches} ELSE {len(PSI_EDGES)} END)"


@register(
    "mon_length_drift_psi",
    oracle=f"""
    WITH binned AS (
      SELECT {_bin_sql("n_chars")} AS bin_id,
             CAST(doc_id % 2 = 0 AS INTEGER) AS is_ref
      FROM documents
    ),
    cells AS (
      SELECT bin_id,
             1 + sum(is_ref) AS n_ref,
             1 + sum(1 - is_ref) AS n_cur
      FROM binned GROUP BY bin_id
    ),
    shares AS (
      SELECT bin_id, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             n_ref * 1.0 / sum(n_ref) OVER () AS p_ref,
             n_cur * 1.0 / sum(n_cur) OVER () AS p_cur
      FROM cells
    )
    SELECT CAST(bin_id AS INTEGER) AS bin_id, n_ref, n_cur,
           round(p_ref, 6) AS p_ref,
           round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
    FROM shares
    """,
)
def mon_length_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin PSI terms for document-length drift between two slices.

    Map-side bin assignment + one bin-keyed conditional-count aggregate
    (partial-aggregating; shuffled bytes = #bins rows), then share and
    PSI arithmetic over the dimension-sized result. Total PSI is
    ``sum(psi_term)`` — left per-bin so the alarm can also say WHICH
    region of the distribution moved.
    """
    docs = table(spark, sf_dir, "documents")
    is_ref = (F.col("doc_id") % 2 == 0).cast("int")
    cells = (
        docs.select(F.expr(_bin_sql("n_chars")).alias("bin_id"), is_ref.alias("is_ref"))
        .groupBy("bin_id")
        .agg(
            (F.lit(1) + F.sum("is_ref")).alias("n_ref"),
            (F.lit(1) + F.sum(F.lit(1) - F.col("is_ref"))).alias("n_cur"),
        )
    )
    # slice totals as a broadcast 1-row cross join (no window over the
    # cell relation — shape-uniform with the unbounded-input gate)
    tot = cells.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    cells = cells.crossJoin(F.broadcast(tot))
    p_ref = F.col("n_ref") / F.col("_tr")
    p_cur = F.col("n_cur") / F.col("_tc")
    return cells.select(
        F.col("bin_id").cast("int").alias("bin_id"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


# --------------------------------------------------------------------------
# Volume-anomaly detection: per event type, a z-score of each day's
# event count against the trailing 7 days — the ingest-monitoring
# alarm that catches a dropped source or a duplicate-delivery burst
# before it poisons a training snapshot. Mean/variance come from
# window SUMS of integer counts (sum, sum of squares, count), so the
# aggregation is exact under any shuffle order; only the final
# per-row z arithmetic runs in doubles.
#
# Scale: one shuffle to the (day, type) grain — the windowed relation
# is dimension-sized (days x types), so the trailing window costs
# nothing regardless of corpus size.
# --------------------------------------------------------------------------
ANOM_WINDOW = 7  # trailing days
ANOM_MIN_PRIOR = 3  # need at least this many prior days for a z-score
ANOM_Z = 2.0


@register(
    "mon_daily_volume_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT day, event_type, n_events,
             count(*) OVER w AS cnt,
             sum(n_events) OVER w AS s,
             sum(n_events * n_events) OVER w AS ss
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)
    )
    SELECT day, event_type, n_events,
           round((n_events - CAST(s AS DOUBLE) / cnt)
                 / NULLIF(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt)
                               / (cnt - 1)), 0), 4) AS z,
           CASE WHEN cnt >= {ANOM_MIN_PRIOR}
                 AND abs((n_events - CAST(s AS DOUBLE) / cnt)
                         / NULLIF(sqrt((CAST(ss AS DOUBLE)
                                        - CAST(s AS DOUBLE) * s / cnt)
                                       / (cnt - 1)), 0)) > {ANOM_Z}
                THEN TRUE ELSE FALSE END AS is_anomaly
    FROM framed
    WHERE cnt >= {ANOM_MIN_PRIOR}
    """,
)
def mon_daily_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score per (day, event_type); anomalies are
    |z| > {ANOM_Z} against the prior {ANOM_WINDOW} days."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))

    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    framed = daily.select(
        "day",
        "event_type",
        "n_events",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    ).filter(F.col("cnt") >= ANOM_MIN_PRIOR)

    mean = F.col("s").cast("double") / F.col("cnt")
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    std = F.sqrt(var)
    z = (F.col("n_events") - mean) / F.when(std != 0, std)
    return framed.select(
        "day",
        "event_type",
        "n_events",
        F.round(z, 4).alias("z"),
        F.when((F.col("cnt") >= ANOM_MIN_PRIOR) & (F.abs(z) > ANOM_Z), True)
        .otherwise(False)
        .alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# Freshness audit: per-source data staleness vs the corpus watermark.
# The ops-side DQ dimension the drift monitors above don't cover — a
# source whose newest event lags the global max by days is a broken
# feed long before its volume or distribution drifts. Events carry
# the timestamps here (documents are timeless in this schema), so the
# audit runs per event_type as the "source" axis.
#
# Exactness: lags are integer second differences of max timestamps.
# One partial-aggregated groupBy + a broadcast one-row global max.
# --------------------------------------------------------------------------
FRESH_SLA_SECONDS = 6 * 3600


@register(
    "mon_source_freshness",
    oracle=f"""
    WITH per AS (
      SELECT event_type, max(ts) AS latest,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ),
    g AS (SELECT max(ts) AS watermark FROM events)
    SELECT event_type, n_events,
           CAST(date_diff('second', per.latest, g.watermark) AS BIGINT)
               AS lag_seconds,
           (date_diff('second', per.latest, g.watermark)
            > {FRESH_SLA_SECONDS}) AS stale
    FROM per CROSS JOIN g
    """,
)
def mon_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness lag against the global event-time
    watermark, with a {FRESH_SLA_SECONDS}s staleness SLA flag."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    g = ev.agg(F.max("ts").alias("watermark"))
    lag = F.unix_timestamp("watermark") - F.unix_timestamp("latest")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        lag.cast("bigint").alias("lag_seconds"),
        (lag > FRESH_SLA_SECONDS).alias("stale"),
    )


# --------------------------------------------------------------------------
# Seasonal-naive forecast baseline: forecast(day) = actual(day - 7),
# scored with MAPE per event type. Every real forecasting system is
# judged against this baseline first (if your model can't beat
# lag-7, ship lag-7) — and the baseline needs no training, so it
# deploys as a pure window expression. Per-day absolute percentage
# errors quantize to 1e-9 fixed point before summing (BIGINT), so the
# MAPE is exact under any shuffle order.
# --------------------------------------------------------------------------
MAPE_FX = 1_000_000_000


@register(
    "mon_seasonal_naive_mape",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT event_type, day,
             date_diff('day', DATE '1970-01-01', day) AS dayn, n
      FROM daily
    ),
    lagged AS (
      SELECT k.event_type, k.day, k.n,
             p.n AS forecast
      FROM keyed k JOIN keyed p
        ON p.event_type = k.event_type AND p.dayn = k.dayn - 7
    ),
    errs AS (
      SELECT event_type,
             CAST(floor(abs(n - forecast) / CAST(n AS DOUBLE) * {MAPE_FX})
                  AS BIGINT) AS ape_fx
      FROM lagged WHERE n > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           CAST(sum(ape_fx) AS BIGINT) AS ape_fx_sum,
           round(CAST(sum(ape_fx) AS DOUBLE) / (count(*) * {MAPE_FX}.0), 6)
               AS mape
    FROM errs GROUP BY event_type
    """,
)
def mon_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAPE of the lag-7 seasonal-naive forecast per event type, from
    fixed-point error sums."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    keyed = daily.withColumn(
        "dayn", F.datediff("day", F.to_date(F.lit("1970-01-01")))
    )
    prev = keyed.select(
        "event_type",
        (F.col("dayn") + 7).alias("dayn"),
        F.col("n").alias("forecast"),
    )
    lagged = keyed.join(prev, ["event_type", "dayn"])
    ape_fx = F.floor(
        F.abs(F.col("n") - F.col("forecast")) / F.col("n").cast("double") * MAPE_FX
    ).cast("bigint")
    return (
        lagged.filter(F.col("n") > 0)
        .select("event_type", ape_fx.alias("ape_fx"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
            F.sum("ape_fx").cast("bigint").alias("ape_fx_sum"),
            F.round(
                F.sum("ape_fx").cast("double") / (F.count(F.lit(1)) * float(MAPE_FX)),
                6,
            ).alias("mape"),
        )
    )


# --------------------------------------------------------------------------
# Categorical drift (total-variation distance) — the categorical
# counterpart of the PSI monitors above (mon_length_drift_psi is
# numeric-binned; embeddings get the JL-projected variant): for each
# categorical document column, the per-value share shift between the
# reference slice (even doc_id) and the current slice (odd doc_id),
# plus the column-level TVD = max over events of probability
# disagreement = 0.5 * L1. The alarm that catches a source mix shift
# or a langid regression before it skews the training mixture.
#
# Shape: one conditional-count aggregate per column over (value) keys
# (two scans fused by the unpivot union), dimension-sized results; the
# column rollup windows over the per-column value list (bounded by the
# category vocabulary, not the corpus).
# --------------------------------------------------------------------------
@register(
    "mon_category_drift_tvd",
    oracle="""
    WITH src AS (
      SELECT 'lang' AS col_name, lang AS val,
             CAST(doc_id % 2 = 0 AS INTEGER) AS is_ref
      FROM documents
      UNION ALL
      SELECT 'source', source, CAST(doc_id % 2 = 0 AS INTEGER)
      FROM documents
    ),
    cells AS (
      SELECT col_name, val,
             CAST(sum(is_ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
      FROM src GROUP BY col_name, val
    ),
    tot AS (
      SELECT col_name,
             CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur
      FROM cells GROUP BY col_name
    ),
    shares AS (
      SELECT c.col_name, c.val, c.n_ref, c.n_cur,
             CAST(c.n_ref AS DOUBLE) / t.t_ref AS p_ref,
             CAST(c.n_cur AS DOUBLE) / t.t_cur AS p_cur
      FROM cells c JOIN tot t USING (col_name)
    )
    SELECT col_name, val, n_ref, n_cur,
           round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round(abs(p_ref - p_cur), 6) AS abs_shift,
           round(0.5 * sum(abs(p_ref - p_cur)) OVER (PARTITION BY col_name), 6)
               AS col_tvd
    FROM shares
    """,
)
def mon_category_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-value share shift + per-column total-variation distance
    between the even/odd doc_id slices, for the categorical document
    columns (lang, source)."""
    docs = table(spark, sf_dir, "documents")
    is_ref = (F.col("doc_id") % 2 == 0).cast("int")
    src = docs.select(
        F.lit("lang").alias("col_name"), F.col("lang").alias("val"), is_ref.alias("is_ref")
    ).unionByName(
        docs.select(
            F.lit("source").alias("col_name"),
            F.col("source").alias("val"),
            is_ref.alias("is_ref"),
        )
    )
    cells = src.groupBy("col_name", "val").agg(
        F.sum("is_ref").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("n_cur"),
    )
    tot = cells.groupBy("col_name").agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    shares = cells.join(F.broadcast(tot), "col_name").select(
        "col_name",
        "val",
        "n_ref",
        "n_cur",
        (F.col("n_ref").cast("double") / F.col("t_ref")).alias("p_ref_raw"),
        (F.col("n_cur").cast("double") / F.col("t_cur")).alias("p_cur_raw"),
    )
    diff = F.abs(F.col("p_ref_raw") - F.col("p_cur_raw"))
    col_w = W.partitionBy("col_name")
    return shares.select(
        "col_name",
        "val",
        "n_ref",
        "n_cur",
        F.round("p_ref_raw", 6).alias("p_ref"),
        F.round("p_cur_raw", 6).alias("p_cur"),
        F.round(diff, 6).alias("abs_shift"),
        F.round(0.5 * F.sum(diff).over(col_w), 6).alias("col_tvd"),
    )


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between the token distributions of two
# ingestion slices (even- vs odd-numbered sources — the stand-in for
# "yesterday's crawl vs today's"). JSD is the symmetric, bounded
# ([0, ln 2]) companion to the PSI monitor above: PSI watches a
# numeric column's histogram, JSD watches the vocabulary itself, so a
# source that silently switches language or domain trips it even when
# document lengths look unchanged.
#
#   JSD = 0.5·KL(P‖M) + 0.5·KL(Q‖M),  M = (P+Q)/2
#
# with P, Q Laplace-smoothed over the union vocabulary (+1 per token,
# +V on each slice total) so log terms stay finite on slice-exclusive
# tokens. Scale shape: explode → (token, slice) conditional-count
# aggregate (vocabulary-keyed, map-side-combining) with the two slice
# totals and V folded in as a broadcast 1-row aggregate. Per-token
# JS terms stay in the output so the alarm names WHICH tokens moved;
# total JSD = sum(js_term).
# --------------------------------------------------------------------------
@register(
    "mon_token_js_divergence",
    oracle="""
    WITH toks AS (
      SELECT CAST(regexp_extract(source, '[0-9]+') AS INTEGER) % 2 = 0
                 AS in_a,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    per_tok AS (
      SELECT tok,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
             CAST(sum(n_b) AS BIGINT) AS tot_b,
             CAST(count(*) AS BIGINT) AS v
      FROM per_tok
    ),
    smoothed AS (
      SELECT tok, n_a, n_b,
             (n_a + 1.0) / (tot_a + v) AS p,
             (n_b + 1.0) / (tot_b + v) AS q
      FROM per_tok, tot
    )
    SELECT tok, n_a, n_b,
           round(0.5 * p * ln(p / ((p + q) / 2))
                 + 0.5 * q * ln(q / ((p + q) / 2)), 8) AS js_term
    FROM smoothed
    """,
)
def mon_token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token Jensen-Shannon divergence terms between two source
    slices, Laplace-smoothed over the union vocabulary."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.regexp_extract("source", "[0-9]+", 0).cast("int") % 2 == 0).alias(
            "in_a"
        ),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    per_tok = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("bigint").alias("n_b"),
    )
    tot = per_tok.agg(
        F.sum("n_a").cast("bigint").alias("tot_a"),
        F.sum("n_b").cast("bigint").alias("tot_b"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    s = per_tok.crossJoin(F.broadcast(tot))
    p = (F.col("n_a") + 1.0) / (F.col("tot_a") + F.col("v"))
    q = (F.col("n_b") + 1.0) / (F.col("tot_b") + F.col("v"))
    m = (p + q) / 2
    return s.select(
        "tok",
        "n_a",
        "n_b",
        F.round(0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m), 8).alias(
            "js_term"
        ),
    )


# --------------------------------------------------------------------------
# Per-source scorecard — the one-table health readout a curation run
# publishes per crawl origin: volume (docs, tokens, chars), exact-dup
# mass (copies beyond the first of each content hash), and language
# mix entropy. The aggregation every per-source decision (reweight,
# re-crawl, drop) reads first.
#
# Exactness: every count is an integer; the entropy terms
# -(c/n)·ln(c/n) are scalar doubles from exact integer ratios,
# quantized to 1e9 fixed point BEFORE the per-source sum (|lang|-
# bounded, but the policy is uniform: no unordered float sums, ever).
#
# Scale: two source-keyed aggregates (one per-(source,lang) then a
# |source|-sized rollup, one per-(source,hash) dedup rollup) and a
# broadcast join of dimension-sized results. No windows, no Python.
# --------------------------------------------------------------------------
_ENT_FX = 10**9


@register(
    "pipe_source_scorecard",
    oracle=f"""
    WITH base AS (
      SELECT source, lang, n_chars,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                 AS n_tok,
             md5(text) AS h
      FROM documents
    ),
    vol AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique
      FROM base GROUP BY source
    ),
    lc AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY source, lang
    ),
    ent AS (
      SELECT lc.source,
             CAST(sum(CAST(floor(-(lc.c * 1.0 / v.n_docs)
                                 * ln(lc.c * 1.0 / v.n_docs) * {_ENT_FX} + 0.5)
                           AS BIGINT)) AS BIGINT) AS ent_fx
      FROM lc JOIN vol v USING (source) GROUP BY lc.source
    )
    SELECT v.source, v.n_docs, v.n_tokens, v.n_chars,
           CAST(v.n_docs - v.n_unique AS BIGINT) AS dup_docs,
           round((v.n_docs - v.n_unique) * 1.0 / v.n_docs, 6) AS dup_ratio,
           round(e.ent_fx / {_ENT_FX}.0, 6) AS lang_entropy
    FROM vol v JOIN ent e USING (source)
    """,
)
def pipe_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source volume, exact-dup mass, and language-mix entropy —
    the crawl-origin health table."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
        F.md5("text").alias("h"),
    )
    # sources-sized, referenced by the entropy join AND the final
    # select — persist so the volume pass over documents runs once.
    vol = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("h").cast("bigint").alias("n_unique"),
    ).persist()
    lc = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    p = F.col("c") * 1.0 / F.col("n_docs")
    ent = (
        lc.join(F.broadcast(vol.select("source", "n_docs")), "source")
        .select(
            "source",
            F.floor(-p * F.log(p) * _ENT_FX + 0.5).cast("bigint").alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").cast("bigint").alias("ent_fx"))
    )
    return vol.join(F.broadcast(ent), "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_docs") - F.col("n_unique")).cast("bigint").alias("dup_docs"),
        F.round((F.col("n_docs") - F.col("n_unique")) * 1.0 / F.col("n_docs"), 6)
        .alias("dup_ratio"),
        F.round(F.col("ent_fx") / float(_ENT_FX), 6).alias("lang_entropy"),
    )


# --------------------------------------------------------------------------
# Week-over-week volume alert table — the ops monitor that pages
# someone: per (event_type, week) event counts with exact-ppm WoW
# change and a +/-50% alert flag. Weeks are arithmetic epoch-day
# blocks (day DIV 7), never engine week() functions, whose week-start
# conventions differ across engines (the dow-seasonality precedent).
# Lag runs per event_type (key-partitioned window over the
# calendar-bounded weekly grain).
# --------------------------------------------------------------------------
WOW_ALERT_PPM = 500_000  # |WoW| >= 50% pages


@register(
    "mon_wow_event_volume",
    oracle=f"""
    WITH weekly AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                 AS week_ix,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, week_ix, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY week_ix)
                 AS prev_n
      FROM weekly
    )
    SELECT event_type, CAST(week_ix AS BIGINT) AS week_ix, n,
           CASE WHEN prev_n > 0
                THEN (n - prev_n) * 1000000 // prev_n END AS wow_ppm,
           CASE WHEN prev_n > 0
                 AND abs((n - prev_n) * 1000000 // prev_n)
                     >= {WOW_ALERT_PPM}
                THEN 1 ELSE 0 END AS alert
    FROM lagged
    """,
)
def mon_wow_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type weekly volumes with exact-ppm WoW change and
    +/-50% alert flags (arithmetic epoch-day weeks)."""
    ev = table(spark, sf_dir, "events")
    week_ix = F.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01') DIV 7"
    )
    weekly = ev.groupBy("event_type", week_ix.alias("week_ix")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = W.partitionBy("event_type").orderBy("week_ix")
    lagged = weekly.withColumn("prev_n", F.lag("n").over(w))
    wow = F.when(
        F.col("prev_n") > 0,
        F.expr("(n - prev_n) * CAST(1000000 AS BIGINT) DIV prev_n"),
    )
    return lagged.select(
        "event_type",
        F.col("week_ix").cast("bigint").alias("week_ix"),
        "n",
        wow.alias("wow_ppm"),
        F.when(
            (F.col("prev_n") > 0) & (F.abs(wow) >= WOW_ALERT_PPM), 1
        )
        .otherwise(0)
        .alias("alert"),
    )


# --------------------------------------------------------------------------
# Windowed quantile drift (round-9 shortlist #2b): the tail-shape
# companion to mon_wow_event_volume's volume alarms and the PSI
# monitors' binned shapes. Binned monitors miss drift that moves WITHIN
# a bin; tracking exact windowed quantiles (p50/p90 per calendar month)
# catches median/tail migration directly. Month grain keeps every
# window dense (~190 orders/month at sf0.01) and the output
# dimension-sized: one exact-percentile aggregate per month — a single
# shuffle keyed on the month, partial-aggregated map-side — then lag()
# over the ~80-row month series. At 100 TB the per-month percentile
# would ride the mergeable sketch (sk_tdigest_order_values below is the
# same monitor's sketch-backed twin); the exact form here is the
# oracle-checkable reference.
# --------------------------------------------------------------------------
QDRIFT_ALERT_X20 = 20  # alert when abs(p50 - prev) * 20 > prev (5% move)


@register(
    "mon_quantile_drift_monthly",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(count(*) AS BIGINT) AS n_orders,
             quantile_cont(o_totalprice, 0.5) AS p50,
             quantile_cont(o_totalprice, 0.9) AS p90
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT *, lag(p50) OVER (ORDER BY month_start) AS prev_p50
      FROM monthly
    )
    SELECT month_start, n_orders,
           round(p50, 6) AS p50_price, round(p90, 6) AS p90_price,
           round(abs(p50 - prev_p50), 6) AS d50_abs,
           CASE WHEN prev_p50 IS NULL THEN NULL
                WHEN abs(p50 - prev_p50) * {QDRIFT_ALERT_X20} > prev_p50
                THEN 1 ELSE 0 END AS alert
    FROM lagged
    """,
)
def mon_quantile_drift_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact monthly p50/p90 of order value with month-over-month
    median-drift alerts (>5% move, compared in multiply-through form so
    both engines branch on the identical double expression)."""
    o = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    monthly = o.groupBy(
        F.trunc("o_orderdate", "month").alias("month_start")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    )
    lagged = monthly.withColumn(
        "prev_p50", F.lag("p50").over(W.orderBy("month_start"))
    )
    return lagged.select(
        "month_start",
        "n_orders",
        F.round("p50", 6).alias("p50_price"),
        F.round("p90", 6).alias("p90_price"),
        F.round(F.abs(F.col("p50") - F.col("prev_p50")), 6).alias("d50_abs"),
        F.when(F.col("prev_p50").isNull(), F.lit(None).cast("int"))
        .when(
            F.abs(F.col("p50") - F.col("prev_p50")) * QDRIFT_ALERT_X20
            > F.col("prev_p50"),
            1,
        )
        .otherwise(0)
        .alias("alert"),
    )


# --------------------------------------------------------------------------
# Sketch-backed windowed quantile drift (round-10 verdict #6): the
# digest-of-digests twin of mon_quantile_drift_monthly, completing the
# mergeable-sketch story for drift monitors. The exact twin above is
# what a 100 TB deployment CANNOT afford per window refresh; the scale
# path builds per-(month, shard) t-digest centroids map-side, merges
# each month's shard digests by global cumulative weight (the same k1
# scale-function re-compression as sk_tdigest_order_values — kilobytes
# per month regardless of volume, and exactly how digests combine
# across 1000 executors or across incremental daily refreshes), then
# answers p50/p90 and the month-over-month drift alert FROM the merged
# digests.
#
# Fully oracle-checked since round 11 (verdict #4, same treatment as
# sk_tdigest_order_values): sharding rides the md5 top byte instead of
# xxhash64 and the k1 bin is evaluated against precomputed boundary
# literals (sketches._k1_boundaries), so the whole digest-of-digests
# pipeline has an exact DuckDB twin. The accuracy contract remains the
# rank-error property test in tests/test_corpus_ops.py: per month, the
# estimate's TRUE within-month rank sits inside the k1 envelope, and
# each merged digest's total weight equals the month's exact row
# count. Centroid means ride exact value-cents BIGINT sums, so the
# whole monitor is deterministic under any partitioning.
# --------------------------------------------------------------------------
QD_SHARDS = 8  # map-side digests per month (stand-in for executor count)


def _qd_oracle() -> str:
    from .sketches import (
        TD_DELTA,
        _k1_bin_duck,
        _md5_shard_sql,
    )

    return f"""
    WITH sharded AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             {_md5_shard_sql("o_orderkey", QD_SHARDS)} AS shard,
             o_totalprice AS v, o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT month_start, shard, v,
             row_number() OVER (PARTITION BY month_start, shard
                                ORDER BY v, o_orderkey) AS r,
             count(*) OVER (PARTITION BY month_start, shard) AS n
      FROM sharded
    ),
    loc AS (
      SELECT month_start, shard, v,
             {_k1_bin_duck("(CAST(r AS DOUBLE) - 0.5) / CAST(n AS DOUBLE) * 2 - 1", TD_DELTA)} AS bin
      FROM ranked
    ),
    shard_cent AS (
      SELECT month_start, shard, bin, CAST(count(*) AS BIGINT) AS w,
             CAST(sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM loc GROUP BY month_start, shard, bin
    ),
    merged_in AS (
      SELECT month_start, w, sum_cents, sum_cents / (w * 100) AS mean,
             sum(w) OVER (PARTITION BY month_start
                          ORDER BY sum_cents / (w * 100), shard, bin) AS cum,
             sum(w) OVER (PARTITION BY month_start) AS n_month
      FROM shard_cent
    ),
    merged AS (
      SELECT month_start, mbin, CAST(sum(w) AS BIGINT) AS w,
             CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
             CAST(max(n_month) AS BIGINT) AS n_month
      FROM (
        SELECT *,
               {_k1_bin_duck("(CAST(cum AS DOUBLE) - CAST(w AS DOUBLE) / 2)"
                             " / CAST(n_month AS DOUBLE) * 2 - 1", TD_DELTA)} AS mbin
        FROM merged_in
      ) GROUP BY month_start, mbin
    ),
    cumq AS (
      SELECT month_start, sum_cents / (w * 100) AS mean, n_month,
             sum(w) OVER (PARTITION BY month_start
                          ORDER BY sum_cents / (w * 100), mbin) AS cum_hi
      FROM merged
    ),
    est AS (
      SELECT month_start,
             CAST(max(n_month) AS BIGINT) AS n_orders,
             round(max(CASE WHEN p = 0.5 THEN mean END), 6) AS est_p50,
             round(max(CASE WHEN p = 0.9 THEN mean END), 6) AS est_p90
      FROM (
        SELECT c.month_start, c.mean, c.n_month, t.p,
               row_number() OVER (PARTITION BY c.month_start, t.p
                                  ORDER BY c.cum_hi, c.mean) AS rn
        FROM cumq c
        JOIN (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS p) t
          ON CAST(c.cum_hi AS DOUBLE) >= t.p * CAST(c.n_month AS DOUBLE)
      ) WHERE rn = 1
      GROUP BY month_start
    ),
    lagged AS (
      SELECT *, lag(est_p50) OVER (ORDER BY month_start) AS prev_p50
      FROM est
    )
    SELECT month_start, n_orders, est_p50, est_p90,
           round(abs(est_p50 - prev_p50), 6) AS d50_abs,
           CASE WHEN prev_p50 IS NULL THEN NULL
                WHEN abs(est_p50 - prev_p50) * {QDRIFT_ALERT_X20} > prev_p50
                THEN 1 ELSE 0 END AS alert
    FROM lagged
    """


@register("mon_tdigest_drift_monthly", oracle=_qd_oracle())
def mon_tdigest_drift_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly p50/p90 of order value answered from merged per-shard
    t-digests, with the same >5% median-drift alert rule as the exact
    twin — the monitor a 100 TB pipeline actually runs. Fully
    oracle-checked (round 11): md5 sharding + literal-boundary k1 bins."""
    from .sketches import TD_DELTA, _k1_bin, _md5_shard_spark

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    sharded = o.select(
        F.trunc("o_orderdate", "month").alias("month_start"),
        _md5_shard_spark("o_orderkey", QD_SHARDS),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    # map side: rank within (month, shard), compress to k1 centroids
    ws = W.partitionBy("month_start", "shard").orderBy("v", "o_orderkey")
    ranked = sharded.select(
        "month_start",
        "shard",
        "v",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("month_start", "shard")).alias("n"),
    )
    local = ranked.select(
        "month_start",
        "shard",
        "v",
        _k1_bin((F.col("r") - 0.5) / F.col("n") * 2 - 1, TD_DELTA).alias("bin"),
    )
    shard_cent = (
        local.groupBy("month_start", "shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("w"),
            F.sum(
                F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("sum_cents"),
        )
        .withColumn("mean", F.col("sum_cents") / (F.col("w") * 100))
    )
    # merge side: per month, re-compress the shard centroids on GLOBAL
    # cumulative weight — the digest-of-digests step
    wm = W.partitionBy("month_start").orderBy("mean", "shard", "bin")
    merged = (
        shard_cent.select(
            "month_start",
            "w",
            "sum_cents",
            "mean",
            (F.sum("w").over(wm) - F.col("w") / 2).alias("cum_mid"),
            F.sum("w").over(W.partitionBy("month_start")).alias("n_month"),
        )
        .withColumn(
            "mbin",
            _k1_bin(F.col("cum_mid") / F.col("n_month") * 2 - 1, TD_DELTA),
        )
        .groupBy("month_start", "mbin")
        .agg(
            F.sum("w").alias("w"),
            F.sum("sum_cents").alias("sum_cents"),
            F.max("n_month").alias("n_month"),
        )
        .withColumn("mean", F.col("sum_cents") / (F.col("w") * 100))
    )
    # query side: per month, first centroid whose cumulative weight
    # reaches p * n_month, for p in {0.5, 0.9}
    wq = W.partitionBy("month_start").orderBy("mean", "mbin")
    cum = merged.select(
        "month_start", "mean", "n_month", F.sum("w").over(wq).alias("cum_hi")
    )
    pcts = cum.join(
        F.broadcast(
            spark.range(1).select(
                F.explode(F.array(F.lit(0.5), F.lit(0.9))).alias("p")
            )
        )
    )
    wh = W.partitionBy("month_start", "p").orderBy("cum_hi", "mean")
    est = (
        pcts.filter(F.col("cum_hi") >= F.col("p") * F.col("n_month"))
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .groupBy("month_start")
        .agg(
            F.max("n_month").cast("bigint").alias("n_orders"),
            F.round(
                F.max(F.when(F.col("p") == 0.5, F.col("mean"))), 6
            ).alias("est_p50"),
            F.round(
                F.max(F.when(F.col("p") == 0.9, F.col("mean"))), 6
            ).alias("est_p90"),
        )
    )
    lagged = est.withColumn(
        "prev_p50", F.lag("est_p50").over(W.orderBy("month_start"))
    )
    return lagged.select(
        "month_start",
        "n_orders",
        "est_p50",
        "est_p90",
        F.round(F.abs(F.col("est_p50") - F.col("prev_p50")), 6).alias("d50_abs"),
        F.when(F.col("prev_p50").isNull(), F.lit(None).cast("int"))
        .when(
            F.abs(F.col("est_p50") - F.col("prev_p50")) * QDRIFT_ALERT_X20
            > F.col("prev_p50"),
            1,
        )
        .otherwise(0)
        .alias("alert"),
    )
