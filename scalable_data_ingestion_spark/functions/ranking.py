"""Scalable ranking primitives.

An unpartitioned ``row_number() OVER (ORDER BY ...)`` forces every row
through ONE partition to sort — fine at sf0.01, dead at 100 TB. These
helpers are the two replacements every ranked operator should use
(VERDICT r3 item #3):

- :func:`take_ordered_ranked` — when only the top-K survive anyway.
  ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject``
  (per-partition heap + driver merge of K-row heads); the ranking
  window then runs over the BOUNDED K-row survivor set, which is the
  one place a global window is legitimate. Identical output to
  rank-then-filter.

- :func:`global_rank` — when EVERY row needs its rank (full total-order
  ranking, e.g. Zipf rank of each vocabulary token). Range-repartition
  on the order keys so partition i holds the i-th slice of the total
  order, count rows per partition (a partitions-sized driver collect —
  the same bounded-collect pattern as PageRank's node-count literal),
  then ``rank = offset[partition] + row_number within partition``.
  Every partition sorts only its own slice; no single-reducer stage.

Both require ``order_by`` to be a TOTAL order (include a unique
tie-break column) so ranks are deterministic and engine-independent.

``tests/test_plan_quality.py::test_no_unpartitioned_window_over_unbounded_input``
holds the line: any registered query whose plan ranks an unbounded
relation through an empty-partition-spec window fails the suite.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _range_sliced(
    df: DataFrame,
    order_by: Sequence[Column],
    num_partitions: int | None,
) -> DataFrame:
    """Range-repartition ``df`` on ``order_by`` (partition i = i-th
    slice of the total order), tag rows with the partition id, and
    persist so the offset job and the downstream consumer see identical
    partition contents."""
    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    return (
        df.repartitionByRange(n_parts, *order_by)
        .withColumn("_gr_pid", F.spark_partition_id())
        .persist()
    )


def _partition_offsets(sliced: DataFrame, value: Column) -> dict[int, int]:
    """Per-partition exclusive prefix totals of ``value`` (one row per
    partition — bounded by cluster width, not data)."""
    totals = {
        row["_gr_pid"]: row["t"]
        for row in sliced.groupBy("_gr_pid").agg(value.alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offsets[-1] = acc  # grand total under key -1
    return offsets


def _offset_expr(offsets: dict[int, int]) -> Column:
    entries = [(pid, off) for pid, off in sorted(offsets.items()) if pid >= 0]
    if not entries:  # empty input: no rows ever evaluate the expression
        return F.lit(0).cast("bigint")
    return F.element_at(
        F.create_map(*[F.lit(v) for kv in entries for v in kv]),
        F.col("_gr_pid"),
    ).cast("bigint")


def take_ordered_ranked(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order_by`` with a 1-based
    ``rank_col``, computed as TakeOrderedAndProject + a window over the
    bounded K-row survivor set (never a full global sort).

    Equivalent to ``row_number().over(W.orderBy(*order_by))`` followed
    by ``filter(rank <= k)``, at per-partition-heap cost.
    """
    survivors = df.orderBy(*order_by).limit(k)
    return survivors.withColumn(
        rank_col, F.row_number().over(W.orderBy(*order_by))
    )


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based total-order rank for EVERY row of ``df`` without a
    single-partition sort.

    Range-repartitions on ``order_by`` (partition i = i-th range of the
    total order), persists that partitioning so the offset job and the
    downstream consumer see identical partition contents, collects the
    per-partition row counts (one row per partition — bounded by
    cluster width, not data), and folds the cumulative offsets back in
    as a literal map. The ranking window is partitioned by the range
    partition id, so each partition sorts only its own slice.
    """
    sliced = _range_sliced(df, order_by, num_partitions)
    offsets = _partition_offsets(sliced, F.count(F.lit(1)))
    within = F.row_number().over(W.partitionBy("_gr_pid").orderBy(*order_by))
    return sliced.withColumn(
        rank_col, _offset_expr(offsets) + within
    ).drop("_gr_pid")


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value: Column,
    out_col: str,
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order prefix sum of ``value`` for every row of ``df``
    without a single-partition window: per-partition running sums
    offset by the (collected, partitions-sized) previous-partition
    totals. ``inclusive=False`` gives the strictly-before prefix."""
    return global_running_sums(
        df, order_by, {out_col: value}, inclusive, num_partitions
    )


def global_running_sums(
    df: DataFrame,
    order_by: Sequence[Column],
    values: dict[str, Column],
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order prefix sums of SEVERAL per-row value columns in ONE
    range repartition (one slicing, one offsets collect, one sort) —
    the shape a two-sample CDF comparison (KS statistic: cumulative
    counts of both samples ordered by value) or a CUSUM scan (running
    revenue AND running row index) needs. Semantics per entry are
    identical to :func:`global_running_sum`."""
    sliced = _range_sliced(df, order_by, num_partitions)
    # ONE partitions-sized collect for every value column's totals.
    aggs = [F.sum(v).alias(name) for name, v in values.items()]
    rows = sliced.groupBy("_gr_pid").agg(*aggs).collect()
    upper = 0 if inclusive else -1
    frame = W.partitionBy("_gr_pid").orderBy(*order_by).rowsBetween(
        W.unboundedPreceding, upper
    )
    out = sliced
    for name, value in values.items():
        totals = {row["_gr_pid"]: row[name] for row in rows}
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid]
        offsets[-1] = acc
        within = F.coalesce(F.sum(value).over(frame), F.lit(0))
        out = out.withColumn(name, _offset_expr(offsets) + within)
    return out.drop("_gr_pid")


def bounded_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str,
) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` for relations that are
    provably DIMENSION-BOUNDED (post-aggregation calendar series,
    duration grains, model tables — cardinality fixed by the domain,
    not the corpus).

    Output-identical to :func:`global_rank` (same total-order rank),
    but a single bounded window instead of the range-repartition
    machinery — which costs a sampling pass over the input, a
    partitions-sized collect, and a range Exchange that are pure
    overhead when the input is a few thousand rows at ANY scale
    (round-10 optimization; guide §2.4). Every registered caller must
    appear in tests/test_plan_quality.py's
    GLOBAL_WINDOW_BOUNDED_ALLOWLIST with a boundedness justification —
    the plan gate still fails unlisted unbounded global windows."""
    return df.withColumn(rank_col, F.row_number().over(W.orderBy(*order_by)))


def bounded_running_sums(
    df: DataFrame,
    order_by: Sequence[Column],
    values: dict[str, Column],
    inclusive: bool = True,
) -> DataFrame:
    """Prefix sums over a DIMENSION-BOUNDED relation via one bounded
    global window — output-identical to :func:`global_running_sums`
    (same coalesce-to-0 empty-frame rule, same bigint sums), minus the
    range repartition + per-column offset collects. Same allowlist
    contract as :func:`bounded_global_rank`."""
    upper = 0 if inclusive else -1
    frame = W.orderBy(*order_by).rowsBetween(W.unboundedPreceding, upper)
    out = df
    for name, value in values.items():
        out = out.withColumn(
            name, F.coalesce(F.sum(value).over(frame), F.lit(0))
        )
    return out


def bounded_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value: Column,
    out_col: str,
    inclusive: bool = True,
) -> DataFrame:
    """Single-column :func:`bounded_running_sums`."""
    return bounded_running_sums(df, order_by, {out_col: value}, inclusive)


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_tiles: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n_tiles) OVER (ORDER BY ...)`` without a
    single-partition window. Standard SQL ntile semantics (the first
    ``n %% k`` tiles hold one extra row), derived from the
    range-partitioned global rank plus the total row count folded in
    as a literal (the PageRank node-count pattern). ``order_by`` must
    be a total order so tile membership is deterministic."""
    sliced = _range_sliced(df, order_by, num_partitions)
    offsets = _partition_offsets(sliced, F.count(F.lit(1)))
    n = offsets[-1]
    within = F.row_number().over(W.partitionBy("_gr_pid").orderBy(*order_by))
    rank = _offset_expr(offsets) + within
    small = n // n_tiles  # rows per short tile
    big = small + 1  # rows per long tile (first n % k tiles)
    cutoff = (n % n_tiles) * big
    if small == 0:  # fewer rows than tiles: tile == rank
        tile = rank
    else:
        tile = F.when(
            rank <= cutoff, F.ceil(rank.cast("double") / big)
        ).otherwise(
            (n % n_tiles) + F.ceil((rank - cutoff).cast("double") / small)
        )
    return sliced.withColumn(out_col, tile.cast("int")).drop("_gr_pid")


def global_quantiles_cont(
    df: DataFrame,
    value: Column,
    qs: dict[str, float],
    n_col: str = "n",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated quantiles (SQL ``quantile_cont``) of one
    column for several ``q`` values in ONE range-partitioned ranking
    pass — no single-reducer exact-percentile aggregate.

    For each ``out_col -> q`` entry the continuous quantile is
    ``v[idx] * (1 - frac) + v[idx+1] * frac`` with
    ``idx = floor((n-1)q)`` (DuckDB's formula, evaluated with the same
    IEEE-double steps on both engines — verified bit-exact in
    tests/test_ranking_helpers.py). One scalar ``count()`` job pins the needed ranks as
    literals; a single filtered aggregate then reads only the 2·|qs|
    boundary rows. Returns a 1-row DataFrame ``(n_col, *qs.keys())``;
    empty input yields ``n = 0`` and NULL quantiles.
    """
    vals = df.select(value.alias("_v")).persist()
    n = vals.count()
    spark = vals.sparkSession
    if n == 0:
        cols = [F.lit(0).cast("bigint").alias(n_col)] + [
            F.lit(None).cast("double").alias(c) for c in qs
        ]
        return spark.range(1).select(*cols)
    plan: dict[str, tuple[int, int, float]] = {}
    ranks: set[int] = set()
    for out_col, q in qs.items():
        rn = (n - 1) * q  # IEEE double, same steps as the SQL engines
        idx = int(rn)
        frac = rn - idx
        k1 = idx + 1  # 1-based rank of the lower boundary row
        k2 = min(idx + 2, n)
        plan[out_col] = (k1, k2, frac)
        ranks.update((k1, k2))
    ranked = global_rank(vals, [F.col("_v")], "_rk", num_partitions)
    boundary = ranked.filter(F.col("_rk").isin(sorted(ranks)))
    aggs = []
    for out_col, (k1, k2, frac) in plan.items():
        lo = F.min(F.when(F.col("_rk") == k1, F.col("_v")))
        hi = F.min(F.when(F.col("_rk") == k2, F.col("_v")))
        aggs.append(
            (lo * F.lit(1.0 - frac) + hi * F.lit(frac)).alias(out_col)
        )
    return boundary.agg(*aggs).select(
        F.lit(n).cast("bigint").alias(n_col), *qs.keys()
    )


def global_median_cont(
    df: DataFrame,
    value: Column,
    n_col: str = "n",
    med_col: str = "med",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated median (SQL ``quantile_cont(v, 0.5)``) of one
    column WITHOUT a single-reducer exact-percentile aggregate.

    Spark's exact ``percentile`` ships every distinct value into one
    final reduce's hash map — at millions of mostly-distinct doubles
    (e.g. Theil-Sen's pairwise-slope relation) that merge dominates the
    query. Here the relation is range-partition ranked instead (each
    partition sorts only its slice), the two middle positions are
    filtered out, and the median is interpolated with DuckDB's exact
    formula ``lo * 0.5 + hi * 0.5`` so the cross-engine hash cannot
    wobble on the last ulp. One scalar ``count()`` job pins the middle
    ranks as literals (the PageRank node-count pattern).

    Returns a 1-row DataFrame ``(n_col: bigint, med_col: double)``;
    empty input yields ``n = 0, med = NULL``.
    """
    vals = df.select(value.alias("_v")).persist()
    n = vals.count()
    if n == 0:
        return vals.sparkSession.range(1).select(
            F.lit(0).cast("bigint").alias(n_col),
            F.lit(None).cast("double").alias(med_col),
        )
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    ranked = global_rank(vals, [F.col("_v")], "_rk", num_partitions)
    return (
        ranked.filter(F.col("_rk").isin([k1, k2]))
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
        .select(
            F.lit(n).cast("bigint").alias(n_col),
            (F.col("_lo") * 0.5 + F.col("_hi") * 0.5).alias(med_col),
        )
    )
