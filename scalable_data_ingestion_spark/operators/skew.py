"""Skew-mitigation helpers (100 TB posture; SURVEY.md §4 scale notes).

Catalyst + AQE already handle most skew (skew-join splitting, partition
coalescing). Two cases still benefit from explicit plan shapes:

- ``two_stage_count_distinct``: COUNT(DISTINCT v) per hot key funnels
  every distinct value of the hot key through one task. The two-stage
  form (dedupe on the full (key, value) pair first, then count) spreads
  stage 1 across the (key, value) space, so a hot key's values fan out
  over many tasks.
- ``salted_topk_values``: per-key value frequencies when a single key
  dominates: stage 1 aggregates on (key, salt-of-value), stage 2 merges
  — the classic salted partial aggregate, expressed with built-ins.

Both are algebraically identical to their naive forms; a registered
oracle query proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def two_stage_count_distinct(df: DataFrame, key: str, value: str) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY key, skew-safe: shuffle 1 keys on
    (key, value) — hot keys spread across tasks — shuffle 2 merges tiny
    per-key partial counts."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_distinct_{value}"))
    )


def salted_topk_values(
    df: DataFrame, key: str, value: str, k: int = 3, salt_buckets: int = 16
) -> DataFrame:
    """Top-k most frequent values per key via salted two-stage counting.

    Stage 1 groups on (key, value, salt) — a hot (key, value) pair's
    rows split over ``salt_buckets`` tasks; stage 2 merges the partial
    counts and ranks. (For plain counts Spark's partial aggregation
    already does this map-side; the explicit form matters when stage 1
    carries heavier per-group state.)
    """
    from pyspark.sql import Window as W

    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), salt_buckets)
    stage1 = (
        df.select(key, value)
        .withColumn("_salt", salt)
        .groupBy(key, value, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    stage2 = stage1.groupBy(key, value).agg(F.sum("_partial").cast("bigint").alias("n"))
    w = W.partitionBy(key).orderBy(F.col("n").desc(), F.col(value))
    return (
        stage2.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(key, value, "n", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "sk_distinct_users_per_event",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_user_id
    FROM events GROUP BY event_type
    """,
)
def sk_distinct_users_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct count == naive COUNT(DISTINCT) (oracle-proved)."""
    return two_stage_count_distinct(table(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "sk_top_events_per_user_bucket",
    oracle="""
    WITH counts AS (
      SELECT user_id % 10 AS user_bucket, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_bucket, event_type, n,
             CAST(row_number() OVER (
                 PARTITION BY user_bucket ORDER BY n DESC, event_type) AS INTEGER) AS rnk
      FROM counts
    )
    SELECT user_bucket, event_type, n, rnk FROM ranked WHERE rnk <= 3
    """,
)
def sk_top_events_per_user_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted top-k == naive top-k (oracle-proved on bucketed users)."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type"
    )
    return salted_topk_values(ev, "user_bucket", "event_type", k=3)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner equi-join resilient to a hot key on the skewed side.

    The skewed side gets a random-but-deterministic salt in
    [0, salt_buckets); the small side is replicated once per salt value
    (explode over a salt array). The join key becomes (key, salt), so a
    hot key's rows spread over ``salt_buckets`` tasks instead of one.

    AQE's skew-join splitting usually makes this unnecessary for
    sort-merge joins; the manual form still matters when AQE can't help
    (e.g. aggregation-after-join pipelines that must keep partitioning,
    or engines/stages where AQE is disabled). Result is identical to a
    plain inner join (proved by test).
    """
    salted_left = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), salt_buckets)
    )
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    replicated_right = small.withColumn("_salt", F.explode(salts))
    return salted_left.join(replicated_right, [key, "_salt"]).drop("_salt")


# --------------------------------------------------------------------------
# Join-key skew diagnostics: the report you run BEFORE choosing a join
# strategy at 100 TB. Per candidate key: distinct-key count, rows on
# the hottest key, exact p99 of rows-per-key, and the share of all
# rows carried by the top key — the numbers that decide between plain
# shuffle join, AQE skew split, salting, or broadcast.
# --------------------------------------------------------------------------
from ..registry import register  # noqa: E402
from ..catalog import table as _table  # noqa: E402


@register(
    "sk_join_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT 'lineitem.l_orderkey' AS key_col, l_orderkey AS k, count(*) AS n
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'lineitem.l_partkey', l_partkey, count(*) FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'lineitem.l_suppkey', l_suppkey, count(*) FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'orders.o_custkey', o_custkey, count(*) FROM orders GROUP BY 1, 2
    )
    SELECT key_col,
           count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_rows_per_key,
           round(quantile_cont(n, 0.99), 6) AS p99_rows_per_key,
           round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_key_share
    FROM per_key
    GROUP BY key_col
    """,
)
def sk_join_key_skew_report(spark, sf_dir):
    """Rows-per-key distribution for the four hot join keys.

    Each key needs one partial-aggregated groupBy (the same shuffle the
    join itself would do, but carrying only counts); the report rollup
    is dimension-sized. A top_key_share near 1/n_partitions is the
    red flag for AQE skew split or salting.
    """
    from functools import reduce

    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    parts = []
    for label, df, col in (
        ("lineitem.l_orderkey", li, "l_orderkey"),
        ("lineitem.l_partkey", li, "l_partkey"),
        ("lineitem.l_suppkey", li, "l_suppkey"),
        ("orders.o_custkey", orders, "o_custkey"),
    ):
        per_key = df.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("n"))
        parts.append(
            per_key.agg(
                F.lit(label).alias("key_col"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.max("n").cast("bigint").alias("max_rows_per_key"),
                F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_rows_per_key"),
                F.round(F.max("n").cast("double") / F.sum("n"), 6).alias(
                    "top_key_share"
                ),
            )
        )
    return reduce(DataFrame.unionByName, parts)


# --------------------------------------------------------------------------
# Skew-join evidence pair (round-9 verdict #8): the same deliberately
# hot-keyed join expressed two ways, priced side by side in BENCH so
# SCALING.md's "AQE handles the hot key" claim is a measured row, not
# prose. Construction: every event maps to a nation key, but HALF of
# all users fold onto nation 0 (pmod(user_id, 10) < 5) — the worst-
# case shuffle-join shape — and the join enriches events with the
# nation dim.
#
# - sk_hot_key_join_aqe: the PLAIN join. Catalyst picks the physical
#   strategy: with the small dim it broadcasts (no shuffle on the fact
#   side, skew impossible — the right answer); with broadcast off it
#   is a sort-merge join whose hot partition AQE's skewJoin rule
#   splits at runtime (asserted by tests/test_plan_quality.py with
#   broadcast disabled and split thresholds lowered to bench scale).
# - sk_hot_key_join_salted: the manual mitigation for the cases AQE
#   cannot reach. Salting costs an explode replication of the dim side
#   even when it isn't needed — the bench delta between the twins IS
#   that price.
#
# Measured structural limits of the AQE path (probed on this exact
# shape, Spark 4.1): OptimizeSkewedJoin only fires when the skewed
# SHUFFLE sits directly under the join's Sort — a dim side built by an
# aggregation (or read from cache) breaks the pattern and the hot
# partition stays whole; and a skewed reduce partition fed by a single
# map task (one parquet row group) cannot be split at all, because the
# split unit is the mapper range. Both are reasons the manual salted
# twin stays in the library: it works for ANY plan shape.
#
# Both queries return identical values (one oracle checks both). The
# weighted sum multiplies exact value-cents BIGINTs by the dim key
# before a single integer sum, so the hash is order-independent.
# --------------------------------------------------------------------------
_HOT_KEY_ORACLE = """
WITH keyed AS (
  SELECT event_type, value,
         CASE WHEN user_id % 10 < 5 THEN 0 ELSE user_id % 25 END AS skew_key
  FROM events
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(k.value * 100 + 0.5) AS BIGINT)
                * (n.n_regionkey + 1)) AS BIGINT) AS weighted_cents
FROM keyed k JOIN nation n ON k.skew_key = n.n_nationkey
GROUP BY 1
"""


def _hot_keyed_events(spark, sf_dir):
    ev = _table(spark, sf_dir, "events").select("event_type", "value", "user_id")
    return ev.select(
        "event_type",
        "value",
        F.when(F.pmod("user_id", F.lit(10)) < 5, F.lit(0).cast("bigint"))
        .otherwise(F.pmod("user_id", F.lit(25)))
        .alias("skew_key"),
    )


def _nation_dim(spark, sf_dir):
    return _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("skew_key"),
        "n_name",
        "n_regionkey",
    )


def _hot_key_rollup(joined: DataFrame) -> DataFrame:
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            * (F.col("n_regionkey").cast("bigint") + 1)
        )
        .cast("bigint")
        .alias("weighted_cents"),
    )


@register("sk_hot_key_join_aqe", oracle=_HOT_KEY_ORACLE)
def sk_hot_key_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key fact-dim join, planner's choice (broadcast when the dim
    is small; SMJ + AQE skew split when it isn't)."""
    keyed = _hot_keyed_events(spark, sf_dir)
    return _hot_key_rollup(keyed.join(_nation_dim(spark, sf_dir), "skew_key"))


@register("sk_hot_key_join_salted", oracle=_HOT_KEY_ORACLE)
def sk_hot_key_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through the manual salted path (identical values;
    the bench delta vs the AQE twin prices the salting overhead)."""
    keyed = _hot_keyed_events(spark, sf_dir)
    joined = salted_join(keyed, _nation_dim(spark, sf_dir), "skew_key")
    return _hot_key_rollup(joined)


# --------------------------------------------------------------------------
# Auto skew strategy (round-10 verdict #2): turn the MEASURED structural
# limits of AQE's OptimizeSkewedJoin (probed on the hot-key shape above,
# Spark 4.1) into a library chooser. The rule only rewrites
# SMJ(Sort(ShuffleQueryStage), Sort(ShuffleQueryStage)) — so:
#
#   blocker 1  — a join side built by an Aggregate / Window, or served
#                from cache (InMemoryRelation), puts an operator between
#                its shuffle and the join's Sort: the hot partition
#                stays whole at ANY skew threshold.
#   blocker 2  — a skewed reduce partition fed by a SINGLE map task
#                (map-only side over one parquet file = one row group)
#                cannot be split: the split unit is the mapper range.
#
# choose_skew_join_strategy inspects the two sides' optimized logical
# plans (driver-side, no job) for exactly those shapes and returns
# "aqe" (plain join — Catalyst broadcasts small dims, AQE splits hot
# SMJ partitions at runtime) or "salted" (the manual rewrite, which
# works for ANY plan shape). Conservative by design: a false "salted"
# still returns identical values and merely pays the dim replication
# (the sk_hot_key_join_aqe/_salted BENCH twins price that delta);
# a false "aqe" would leave the hot task serialized, so unmeasured
# shapes are NOT added to the blocked set until probed.
# --------------------------------------------------------------------------
_AQE_BLOCKING_NODES = ("Aggregate", "Window", "InMemoryRelation")
_SHUFFLE_SHAPE_NODES = _AQE_BLOCKING_NODES + ("Join", "Repartition", "Sort")


def _fresh_optimized_plan(df: DataFrame) -> str:
    """Optimized logical plan from a FRESH QueryExecution. A Dataset's
    own queryExecution().optimizedPlan() is a JVM lazy val — inspected
    once before a later .persist(), it would never show the
    InMemoryRelation substitution. select('*') forces a new execution
    (the trivial Project collapses away in optimization)."""
    return df.select("*")._jdf.queryExecution().optimizedPlan().toString()


def aqe_skew_split_blockers(skewed: DataFrame, small: DataFrame) -> list[str]:
    """The measured reasons AQE could not split this join's hot
    partition (empty list = the AQE path is safe to rely on)."""
    reasons: list[str] = []
    for side, df in (("skewed", skewed), ("small", small)):
        lp = _fresh_optimized_plan(df)
        for node in _AQE_BLOCKING_NODES:
            if node in lp:
                reasons.append(
                    f"{side} side plans a {node} between its shuffle and "
                    "the join Sort (OptimizeSkewedJoin needs "
                    "Sort(ShuffleQueryStage) directly)"
                )
                break
    skewed_plan = _fresh_optimized_plan(skewed)
    map_only = not any(n in skewed_plan for n in _SHUFFLE_SHAPE_NODES)
    # == 1, not <= 1: a non-file leaf (range/LocalRelation) reports zero
    # input files but parallelizes over default-parallelism mappers.
    if map_only and len(skewed.inputFiles()) == 1:
        reasons.append(
            "skewed side is map-only over a single file (one map task): "
            "a skewed reduce partition fed by one mapper cannot be split "
            "(the split unit is the mapper block range)"
        )
    return reasons


def choose_skew_join_strategy(
    skewed: DataFrame, small: DataFrame
) -> tuple[str, list[str]]:
    """('aqe' | 'salted', blocker descriptions). Driver-side plan
    inspection only — no Spark job runs."""
    reasons = aqe_skew_split_blockers(skewed, small)
    return ("salted" if reasons else "aqe"), reasons


def key_skew_stats(df: DataFrame, key: str) -> dict:
    """Rows-per-key distribution of a join side in ONE pass: the same
    shuffle the join itself would do, but carrying only partial-
    aggregated counts (sk_join_key_skew_report's kernel as a library
    call). Keys of the result: n_rows, n_keys, max_rows_per_key,
    top_key_share — top_key_share >> 1/shuffle-partitions is the
    signature that one reduce task carries the table."""
    row = (
        df.groupBy(F.col(key).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("n").cast("bigint").alias("max_rows_per_key"),
        )
        .first()
    )
    n_rows = int(row["n_rows"] or 0)
    max_n = int(row["max_rows_per_key"] or 0)
    return {
        "n_rows": n_rows,
        "n_keys": int(row["n_keys"] or 0),
        "max_rows_per_key": max_n,
        "top_key_share": (max_n / n_rows) if n_rows else 0.0,
    }


def skew_resilient_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    min_hot_share: float | None = None,
) -> DataFrame:
    """Inner equi-join that survives a hot key on ``skewed`` under ANY
    plan shape: plain join (broadcast / AQE skew split) when the rule
    can fire, the salted rewrite exactly when a measured blocker means
    it can't. Values are identical either way (oracle-proved by
    sk_hot_key_join_auto).

    Structural blockers say AQE *couldn't* split a hot partition — not
    that one exists. Pass ``min_hot_share`` (e.g. 2/salt_buckets) to
    confirm the skew is real before paying the dim replication: on a
    blocked shape, one extra counting pass over the skewed side
    (:func:`key_skew_stats`) downgrades to the plain join when the
    hottest key's row share is below the threshold — a blocked-but-
    uniform join needs no mitigation at all. Default None keeps the
    zero-job, plan-only decision (the registered evidence row's
    contract)."""
    strategy, _ = choose_skew_join_strategy(skewed, small)
    if strategy == "salted" and min_hot_share is not None:
        if key_skew_stats(skewed, key)["top_key_share"] < min_hot_share:
            strategy = "aqe"
    if strategy == "salted":
        return salted_join(skewed, small, key, salt_buckets)
    return skewed.join(small, key)


@register("sk_hot_key_join_auto", oracle=_HOT_KEY_ORACLE)
def sk_hot_key_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through skew_resilient_join on the measured
    AQE-blocked shape: the dim side is built by an aggregation (a
    primary-key groupBy — semantically the identity, but an Aggregate
    in the plan), so OptimizeSkewedJoin could never split the hot
    partition and the chooser takes the salted path. Same oracle as
    the aqe/salted twins — the strategy changes the PLAN, never the
    answer."""
    keyed = _hot_keyed_events(spark, sf_dir)
    dim = (
        _nation_dim(spark, sf_dir)
        .groupBy("skew_key", "n_name")
        .agg(F.max("n_regionkey").alias("n_regionkey"))
    )
    return _hot_key_rollup(skew_resilient_join(keyed, dim, "skew_key"))
