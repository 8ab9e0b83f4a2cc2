"""Function-surface breadth: set-op ALL variants, unpivot, statistical
aggregates from exact primitives, and array higher-order functions.

The reference uses none of these (SURVEY.md §2.7 has only
concat/distinct; §2.8 is scalar string/date/math) — they round out the
engine's relational function surface for the driver's star schema.

Determinism notes:
- `stat_qty_line_corr` computes correlation from exact integer-valued
  primitive sums rather than `corr()`: both engines implement corr with
  order-dependent streaming updates (Welford), so the built-in is not
  hash-stable cross-engine; the explicit formula over exact sums is.
- `arr_embedding_vector_stats` uses only order-independent per-row
  array ops (min/max/size/element access) — float fold order never
  enters.

Scale notes: unpivot is a generate (no shuffle); INTERSECT/EXCEPT ALL
hash-aggregate on the full row — at 100 TB these would pre-partition on
the compared columns; the per-dim means run one narrow
posexplode -> hash aggregate with 64 x n rows, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# INTERSECT ALL: repeated (custkey, priority) order shapes present in
# both halves of the date range, with multiplicity.
# --------------------------------------------------------------------------
@register(
    "ia_order_shapes_both_eras",
    oracle="""
    SELECT o_custkey, o_orderpriority
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT ALL
    SELECT o_custkey, o_orderpriority
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def ia_order_shapes_both_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select(
        "o_custkey", "o_orderpriority"
    )
    late = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_custkey", "o_orderpriority"
    )
    return early.intersectAll(late)


# --------------------------------------------------------------------------
# EXCEPT ALL: multiplicity-aware difference of the same two multisets.
# --------------------------------------------------------------------------
@register(
    "ea_order_shapes_early_only",
    oracle="""
    SELECT o_custkey, o_orderpriority
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    EXCEPT ALL
    SELECT o_custkey, o_orderpriority
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def ea_order_shapes_early_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select(
        "o_custkey", "o_orderpriority"
    )
    late = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_custkey", "o_orderpriority"
    )
    return early.exceptAll(late)


# --------------------------------------------------------------------------
# UNPIVOT (melt): part measures to long format. SQL twin is the portable
# UNION ALL expansion.
# --------------------------------------------------------------------------
@register(
    "uv_part_measures_long",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part
    """,
)
def uv_part_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# Correlation / covariance from exact primitive sums. quantity and
# linenumber are integer-valued, so every sum is exact in IEEE double
# and the final divisions are bit-identical cross-engine (built-in
# corr() is an order-dependent streaming update — not hash-stable).
# --------------------------------------------------------------------------
@register(
    "stat_qty_line_corr",
    oracle="""
    WITH p AS (
      SELECT count(*) AS n,
             sum(l_quantity)                 AS sx,
             sum(CAST(l_linenumber AS DOUBLE)) AS sy,
             sum(l_quantity * l_quantity)    AS sxx,
             sum(CAST(l_linenumber AS DOUBLE) * l_linenumber) AS syy,
             sum(l_quantity * l_linenumber)  AS sxy
      FROM lineitem
    )
    SELECT n,
           round(sx, 2) AS sum_qty,
           round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_line,
           round((sxy - sx * sy / n)
                 / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
             AS corr_qty_line
    FROM p
    """,
)
def stat_qty_line_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_linenumber").cast("double")
    p = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return p.select(
        "n",
        F.round(sx, 2).alias("sum_qty"),
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar_qty_line"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            6,
        ).alias("corr_qty_line"),
    )


# --------------------------------------------------------------------------
# Array higher-order functions, per-row (order-independent ops only).
# --------------------------------------------------------------------------
@register(
    "arr_embedding_vector_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                 AS dim,
           round(CAST(list_min(embedding) AS DOUBLE), 6)   AS v_min,
           round(CAST(list_max(embedding) AS DOUBLE), 6)   AS v_max,
           round(CAST(embedding[1] AS DOUBLE), 6)          AS v_first,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def arr_embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.array_min(e).cast("double"), 6).alias("v_min"),
        F.round(F.array_max(e).cast("double"), 6).alias("v_max"),
        F.round(e.getItem(0).cast("double"), 6).alias("v_first"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
    )


# --------------------------------------------------------------------------
# posexplode -> per-dimension corpus means (the flat layout every
# vector-analytics pass starts from).
# --------------------------------------------------------------------------
@register(
    "pe_embedding_dim_means",
    oracle="""
    SELECT CAST(dim - 1 AS INTEGER) AS dim,
           round(avg(CAST(embedding[dim] AS DOUBLE)), 6) AS dim_mean,
           count(*) AS n
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS t(dim)
    GROUP BY dim
    """,
)
def pe_embedding_dim_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("dim_mean"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other instead of disappearing from the inner join.
# --------------------------------------------------------------------------
@register(
    "ns_status_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderstatus, 'P') AS st, count(*) AS n_a
      FROM orders GROUP BY 1
    ), b AS (
      SELECT NULLIF(o_orderstatus, 'F') AS st, count(*) AS n_b
      FROM orders GROUP BY 1
    )
    SELECT a.st AS status_key, n_a, n_b
    FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
    """,
)
def ns_status_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st_a")
    ).agg(F.count(F.lit(1)).alias("n_a"))
    b = orders.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("st_b")
    ).agg(F.count(F.lit(1)).alias("n_b"))
    return a.join(b, F.col("st_a").eqNullSafe(F.col("st_b"))).select(
        F.col("st_a").alias("status_key"), "n_a", "n_b"
    )


# --------------------------------------------------------------------------
# Scalar-function lab: string, regexp, date, and conditional built-ins
# in one projection (function-surface breadth beyond the reference's
# F1-F22 — SURVEY.md §2.8). Every expression is per-row scalar =>
# bit-identical cross-engine, no rounding games needed.
# --------------------------------------------------------------------------
@register(
    "fn_scalar_lab",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')        AS padded_key,
           reverse(c_name)                                  AS rev_name,
           split_part(c_name, '#', 2)                       AS name_num,
           translate(c_mktsegment, 'AEIOU', 'aeiou')        AS seg_translated,
           regexp_extract(c_name, '([0-9]+)$', 1)           AS trailing_digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')        AS masked_name,
           CAST(position('0' IN c_name) AS INTEGER)         AS first_zero_pos,
           repeat(substr(c_mktsegment, 1, 1), 3)            AS seg_initial_x3,
           greatest(c_acctbal, 0.0)                         AS bal_floor0,
           least(CAST(c_nationkey AS BIGINT), 9)            AS nation_cap9,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'B!') AS seg_or_bang
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def fn_scalar_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.reverse("c_name").alias("rev_name"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked_name"),
        F.locate("0", F.col("c_name")).alias("first_zero_pos"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_initial_x3"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_nationkey").cast("bigint"), F.lit(9).cast("bigint")).alias(
            "nation_cap9"
        ),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("B!")
        ).alias("seg_or_bang"),
    )


# --------------------------------------------------------------------------
# Date-function lab: calendar arithmetic on order dates.
# --------------------------------------------------------------------------
@register(
    "fn_date_lab",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER)       AS day_of_year,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)    AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def fn_date_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.dayofyear("o_orderdate").alias("day_of_year"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).cast(
            "bigint"
        ).alias("days_to_y2k"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


# --------------------------------------------------------------------------
# Array aggregation surface: collect_set -> sort_array -> array_join,
# emitted as a string so the cross-engine comparison stays hashable
# (array-typed result cells hash differently across drivers).
# --------------------------------------------------------------------------
@register(
    "agg_segments_per_nation",
    oracle="""
    SELECT n_name,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling (curation primitive): a stable 1/16 slice
# selected by the first hex digit of md5(key). Unlike TABLESAMPLE /
# rand(seed), the sample is identical across engines, re-runs, and
# cluster layouts — the property training-data pipelines need for
# reproducible holdouts.
# --------------------------------------------------------------------------
@register(
    "samp_orders_hash_slice",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    ORDER BY o_orderkey
    """,
)
def samp_orders_hash_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Least-squares regression lab: slope / intercept / r² of
# extendedprice on quantity per returnflag, from EXACT sums. Both
# engines' built-in regr_* functions stream order-dependent float
# updates, so they are not hash-stable cross-engine; here every
# primitive sum (sx, sy, sxx, syy, sxy) is accumulated in DECIMAL(38,0)
# over integer-valued operands (quantity is whole, price is exact
# cents), making the aggregation bit-deterministic under any shuffle
# order. Only the final per-group slope/intercept/r² arithmetic runs
# in doubles — a fixed expression tree over exact inputs.
#
# Scale: one map-side-combined groupBy on a low-cardinality key; the
# decimal accumulators are the standard trick for deterministic
# distributed regression at any row count (no 2^53 overflow, unlike
# double sums of squared cents).
# --------------------------------------------------------------------------
@register(
    "stat_price_qty_regression",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l_quantity AS DECIMAL(38,0))) AS sx,
             sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS sy,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(38,0))) AS sxx,
             sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))
                 * CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS syy,
             sum(CAST(l_quantity AS DECIMAL(38,0))
                 * CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 100.0, 6) AS slope,
           round((CAST(sy AS DOUBLE) / n
                  - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE) / n) / 100.0, 4) AS intercept,
           round(pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS r2
    FROM p
    """,
)
def stat_price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    xq = F.col("l_quantity").cast("decimal(38,0)")
    yc = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    p = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,0)")).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xq * yc).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return p.select(
        "l_returnflag",
        "n",
        F.round(slope / 100.0, 6).alias("slope"),
        F.round((sy / n - slope * sx / n) / 100.0, 4).alias("intercept"),
        F.round(F.pow(cov_n, 2) / (var_x * var_y), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Array / higher-order-function lab: transform, filter, exists,
# forall, aggregate (fold), zip_with, sequence, slice, distinct,
# sort, element_at — the Catalyst lambda-function surface in one
# relation, value-checked against DuckDB's list_* family. Every
# output column folds to a SCALAR (sums, counts, joined strings), so
# the cross-engine hash needs no array-comparison semantics. Arrays
# build per order from the sorted line quantities (order-keyed
# grouping; group size bounded by the 7-line order shape).
# --------------------------------------------------------------------------
@register(
    "fn_array_lab",
    oracle="""
    WITH arr AS (
      SELECT l_orderkey,
             list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qs) AS BIGINT) AS n_lines,
           CAST(list_reduce(list_transform(qs, x -> x * 2),
                            (a, x) -> a + x) AS BIGINT) AS sum_doubled,
           CAST(len(list_filter(qs, x -> x > 10)) AS BIGINT) AS n_over10,
           CAST(len(list_filter(qs, x -> x > 40)) > 0 AS BOOLEAN)
               AS has_over40,
           CAST(len(list_filter(qs, x -> x <= 0)) = 0 AS BOOLEAN)
               AS all_positive,
           CAST(list_reduce(list_transform(range(1, len(qs) + 1),
                              i -> qs[i] * qs[len(qs) - i + 1]),
                            (a, x) -> a + x) AS BIGINT) AS zip_rev_dot,
           CAST(list_reduce(range(1, CAST(len(qs) AS INTEGER) + 1),
                            (a, x) -> a + x) AS BIGINT) AS seq_sum,
           CAST(len(list_distinct(qs)) AS BIGINT) AS n_distinct_qty,
           array_to_string(list_slice(qs, 1, 3), ',') AS first3_csv,
           CAST(qs[(len(qs) + 1) // 2] AS BIGINT) AS lower_median_qty,
           CAST(qs[len(qs)] AS BIGINT) AS max_qty
    FROM arr
    """,
)
def fn_array_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface folded to scalars per
    order (see oracle for the DuckDB list_* twins)."""
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("bigint"))).alias("qs")
    )
    qs = F.col("qs")
    n = F.size(qs)
    return arr.select(
        "l_orderkey",
        n.cast("bigint").alias("n_lines"),
        F.aggregate(
            F.transform(qs, lambda x: x * 2),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("sum_doubled"),
        F.size(F.filter(qs, lambda x: x > 10)).cast("bigint").alias("n_over10"),
        F.exists(qs, lambda x: x > 40).alias("has_over40"),
        F.forall(qs, lambda x: x > 0).alias("all_positive"),
        F.aggregate(
            F.zip_with(qs, F.reverse(qs), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("zip_rev_dot"),
        F.aggregate(
            F.sequence(F.lit(1), n),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x.cast("bigint"),
        )
        .cast("bigint")
        .alias("seq_sum"),
        F.size(F.array_distinct(qs)).cast("bigint").alias("n_distinct_qty"),
        F.array_join(F.slice(qs, 1, 3), ",").alias("first3_csv"),
        F.element_at(qs, ((n + 1) / 2).cast("int")).cast("bigint").alias(
            "lower_median_qty"
        ),
        F.element_at(qs, n).cast("bigint").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# Window-function surface lab: percent_rank, cume_dist, nth_value,
# first/last in frame, lag/lead with defaults — the analytic-function
# breadth beyond the ranking/running-sum operators, in ONE
# nation-partitioned pass over customers (dimension-keyed partitions,
# deterministic (acctbal, custkey) total order inside each).
# percent_rank/cume_dist are exact rationals of integer ranks; the
# money columns are per-row scalars — no rounding games needed beyond
# the documented 2dp money grid.
# --------------------------------------------------------------------------
@register(
    "fn_window_lab",
    oracle="""
    SELECT c_custkey,
           CAST(c_nationkey AS INTEGER) AS nation,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           round(nth_value(c_acctbal, 2) OVER
                 (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                 2) AS second_lowest_bal,
           round(first_value(c_acctbal) OVER w, 2) AS min_bal,
           round(last_value(c_acctbal) OVER
                 (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                 2) AS max_bal,
           round(lag(c_acctbal, 1, -1.0) OVER w, 2) AS prev_bal,
           round(lead(c_acctbal, 1, -1.0) OVER w, 2) AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def fn_window_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function surface over nation-partitioned
    customers (see oracle for the SQL twins)."""
    cust = table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nation"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.nth_value("c_acctbal", 2).over(wfull), 2).alias(
            "second_lowest_bal"
        ),
        F.round(F.first("c_acctbal").over(w), 2).alias("min_bal"),
        F.round(F.last("c_acctbal").over(wfull), 2).alias("max_bal"),
        F.round(F.lag("c_acctbal", 1, -1.0).over(w), 2).alias("prev_bal"),
        F.round(F.lead("c_acctbal", 1, -1.0).over(w), 2).alias("next_bal"),
    )


# --------------------------------------------------------------------------
# MapType function lab — completes the complex-type surface next to
# the array/struct labs: per customer, a status -> order-count MAP is
# built with map_from_entries(collect_list(struct)), then read back
# through map_keys / element_at / map_filter / map size. The oracle
# checks the same SEMANTICS from plain group counts (DuckDB needs no
# map type to verify the outputs), so the lab value-checks Spark's map
# runtime end-to-end: construction, lookup with a missing-key NULL,
# predicate filtering, and deterministic sorted key listing.
# --------------------------------------------------------------------------
@register(
    "fn_map_lab",
    oracle="""
    WITH sc AS (
      SELECT o_custkey, o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_statuses,
           string_agg(st, ',' ORDER BY st) AS keys_sorted,
           CAST(max(n) AS BIGINT) AS max_status_count,
           CAST(coalesce(max(CASE WHEN st = 'F' THEN n END), -1) AS BIGINT)
               AS f_count,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat_statuses
    FROM sc
    GROUP BY o_custkey
    """,
)
def fn_map_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: map_from_entries / map_keys / element_at /
    map_filter / size, value-checked against plain group counts."""
    orders = _t(spark, sf_dir, "orders")
    sc = orders.groupBy("o_custkey", F.col("o_orderstatus").alias("st")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = sc.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("st", "n")))
        ).alias("mp")
    )
    return m.select(
        "o_custkey",
        F.size("mp").cast("bigint").alias("n_statuses"),
        F.array_join(F.sort_array(F.map_keys("mp")), ",").alias(
            "keys_sorted"
        ),
        F.array_max(F.map_values("mp")).cast("bigint").alias(
            "max_status_count"
        ),
        F.coalesce(F.element_at("mp", F.lit("F")), F.lit(-1))
        .cast("bigint")
        .alias("f_count"),
        F.size(F.map_filter("mp", lambda k, v: v >= 2))
        .cast("bigint")
        .alias("n_repeat_statuses"),
    )
