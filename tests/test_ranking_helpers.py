"""Unit tests for functions/ranking.py — the scalable replacements for
unpartitioned global windows (VERDICT r3 #3).

Each helper is checked value-for-value against the single-partition
window it replaces, on data wide enough to span multiple range
partitions, plus the edge cases the offset arithmetic must survive
(empty input, fewer rows than tiles, negative running-sum values).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from scalable_data_ingestion_spark.functions.ranking import (
    global_ntile,
    global_rank,
    global_running_sum,
    take_ordered_ranked,
)


def _seq_df(spark, n=500):
    # deterministic scrambled order: md5 key gives a total order that is
    # uncorrelated with the insertion order
    return spark.range(n).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("k"),
        ((F.col("id") % 7) - 3).alias("v"),
    )


def test_global_rank_matches_window(spark):
    df = _seq_df(spark)
    got = global_rank(df, [F.col("k"), F.col("id")], "r", num_partitions=8)
    want = df.withColumn(
        "r", F.row_number().over(W.orderBy("k", "id")).cast("bigint")
    )
    assert got.select("id", "r").subtract(want.select("id", "r")).count() == 0
    assert want.select("id", "r").subtract(got.select("id", "r")).count() == 0


def test_global_rank_desc_order(spark):
    df = _seq_df(spark, 100)
    got = global_rank(df, [F.col("id").desc()], "r", num_partitions=4)
    top = got.filter(F.col("r") == 1).select("id").first()[0]
    assert top == 99


def test_global_rank_empty_input(spark):
    df = _seq_df(spark).filter(F.lit(False))
    assert global_rank(df, [F.col("id")], "r").count() == 0


def test_global_running_sum_inclusive_and_exclusive(spark):
    df = _seq_df(spark, 300)  # v in [-3, 3]: negative prefixes exercised
    inc = global_running_sum(
        df, [F.col("k"), F.col("id")], F.col("v"), "c", num_partitions=8
    )
    want_inc = df.withColumn(
        "c",
        F.sum("v")
        .over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("bigint"),
    )
    assert (
        inc.select("id", "c").subtract(want_inc.select("id", "c")).count() == 0
    )
    exc = global_running_sum(
        df,
        [F.col("k"), F.col("id")],
        F.col("v"),
        "c",
        inclusive=False,
        num_partitions=8,
    )
    want_exc = df.withColumn(
        "c",
        F.coalesce(
            F.sum("v").over(
                W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    )
    assert (
        exc.select("id", "c").subtract(want_exc.select("id", "c")).count() == 0
    )


def test_global_ntile_matches_window(spark):
    for n, k in ((500, 4), (10, 3), (7, 7), (5, 8)):
        df = _seq_df(spark, n)
        got = global_ntile(
            df, [F.col("k"), F.col("id")], k, "t", num_partitions=4
        )
        want = df.withColumn(
            "t", F.ntile(k).over(W.orderBy("k", "id")).cast("int")
        )
        assert (
            got.select("id", "t").subtract(want.select("id", "t")).count()
            == 0
        ), (n, k)


def test_take_ordered_ranked_matches_rank_filter(spark):
    df = _seq_df(spark, 400)
    got = take_ordered_ranked(df, [F.col("k").desc(), F.col("id")], 25)
    want = (
        df.withColumn(
            "rank", F.row_number().over(W.orderBy(F.col("k").desc(), "id"))
        )
        .filter(F.col("rank") <= 25)
    )
    assert got.count() == 25
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_take_ordered_ranked_plan_uses_take_ordered(spark):
    import contextlib
    import io

    df = _seq_df(spark, 400)
    got = take_ordered_ranked(df, [F.col("k"), F.col("id")], 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("simple")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_global_median_cont_matches_duckdb(spark):
    import duckdb

    from scalable_data_ingestion_spark.functions.ranking import (
        global_median_cont,
    )

    for n in (1, 2, 5, 500, 501):
        df = _seq_df(spark, n).select(
            (F.conv(F.substring("k", 1, 4), 16, 10).cast("double") / 7.0).alias(
                "x"
            )
        )
        got = global_median_cont(df, F.col("x"), num_partitions=8).first()
        vals = [r["x"] for r in df.collect()]
        want = duckdb.sql(
            "SELECT quantile_cont(x, 0.5) FROM (SELECT unnest(?) AS x)",
            params=[vals],
        ).fetchone()[0]
        assert got["n"] == n
        assert got["med"] == want  # bit-exact: same interpolation formula


def test_global_median_cont_empty(spark):
    from scalable_data_ingestion_spark.functions.ranking import (
        global_median_cont,
    )

    df = _seq_df(spark).filter(F.lit(False)).select(F.col("v").cast("double"))
    row = global_median_cont(df, F.col("v")).first()
    assert row["n"] == 0 and row["med"] is None


def test_global_quantiles_cont_matches_duckdb(spark):
    import duckdb

    from scalable_data_ingestion_spark.functions.ranking import (
        global_quantiles_cont,
    )

    for n in (1, 2, 7, 400):
        df = _seq_df(spark, n).select(
            (F.conv(F.substring("k", 1, 4), 16, 10).cast("double") / 3.0).alias(
                "x"
            )
        )
        got = global_quantiles_cont(
            df, F.col("x"), {"p05": 0.05, "p50": 0.5, "p95": 0.95},
            num_partitions=8,
        ).first()
        vals = [r["x"] for r in df.collect()]
        want = duckdb.sql(
            "SELECT quantile_cont(x, 0.05), quantile_cont(x, 0.5),"
            " quantile_cont(x, 0.95) FROM (SELECT unnest(?) AS x)",
            params=[vals],
        ).fetchone()
        assert got["n"] == n
        assert (got["p05"], got["p50"], got["p95"]) == want  # bit-exact
