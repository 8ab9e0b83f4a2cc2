"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Partitioning prunes on ONE dimension; real warehouses filter orders on
*both* customer and date. Z-ordering interleaves the bits of the two
sort keys so rows close in (customer, day) space land in the same
parquet files — every file then covers a small bounding box in both
dimensions and min/max footer stats skip most files for 2-D predicates
(the Delta Lake / Databricks OPTIMIZE ZORDER technique, computed here
with plain column expressions — no engine extension needed).

Scale notes (100 TB):
- The z-value is a pure map-side bit-interleave projection (20 boolean
  shifts folded into one codegen'd expression): zero shuffles to
  *compute*; the one `repartitionByRange(zval)` shuffle at write time
  replaces the single-dimension sort a date-only layout needs anyway.
- Layout quality is verified in `tests/test_scale_features.py`
  (`test_zorder_layout_skips_files`): after a z-ordered write each
  file's customer-span and day-span bounding boxes are fractions of
  the domain, where a date-sorted layout gives full-width customer
  spans (no skipping on the second dimension).
- 8 bits/dimension is the sweet spot for file-level skipping: finer
  bits only matter *within* a file where row-group stats take over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

Z_BITS = 8  # bits kept per dimension


def _interleave_sql(x: str, y: str, shift_fmt: str) -> str:
    """Bit-interleave SQL: x at even bit positions, y at odd."""
    terms = []
    for i in range(Z_BITS):
        terms.append(shift_fmt.format(src=x, i=i, out=2 * i))
        terms.append(shift_fmt.format(src=y, i=i, out=2 * i + 1))
    return " + ".join(terms)


# DuckDB / ANSI bit operators.
_DUCK_SHIFT = "((({src} >> {i}) & 1) << {out})"
# Spark SQL builtin shift functions (>> exists in Spark 4 too, but the
# named functions parse identically everywhere).
_SPARK_SHIFT = "shiftleft(shiftright({src}, {i}) & 1, {out})"


@register(
    "zo_orders_zvalues",
    oracle=f"""
    WITH dims AS (
      SELECT o_orderkey,
             CAST(o_custkey % 256 AS INTEGER) AS cust_bits,
             CAST(dayofyear(o_orderdate) % 256 AS INTEGER) AS day_bits
      FROM orders
    )
    SELECT o_orderkey, cust_bits, day_bits,
           CAST({_interleave_sql("cust_bits", "day_bits", _DUCK_SHIFT)} AS BIGINT)
             AS zval
    FROM dims
    """,
)
def zo_orders_zvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key for (customer, day-of-year) co-clustering of orders.

    ``zval`` interleaves the low {Z_BITS} bits of ``o_custkey`` and of
    the order's day-of-year; sorting the write by it yields files whose
    footer min/max are tight in BOTH dimensions. The expression is one
    whole-stage-codegen projection — layout is a write-time concern,
    the key costs nothing to compute.
    """
    orders = table(spark, sf_dir, "orders")
    dims = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("int").alias("cust_bits"),
        (F.dayofyear("o_orderdate") % 256).cast("int").alias("day_bits"),
    )
    return dims.select(
        "o_orderkey",
        "cust_bits",
        "day_bits",
        F.expr(_interleave_sql("cust_bits", "day_bits", _SPARK_SHIFT)).cast("bigint").alias("zval"),
    )


def zorder_write(df: DataFrame, cols: tuple[str, str], path: str, n_files: int = 8) -> None:
    """Write ``df`` z-ordered on two integer-expressible columns.

    Computes the Morton key over the low {Z_BITS} bits of each column,
    range-partitions into ``n_files`` z-ranges, sorts inside each, and
    drops the helper column on write — the standard OPTIMIZE ZORDER
    recipe as three DataFrame calls.
    """
    x, y = cols
    keyed = df.withColumn("_x", (F.col(x) % 256).cast("int")).withColumn(
        "_y", (F.col(y) % 256).cast("int")
    )
    keyed = keyed.withColumn(
        "_z", F.expr(_interleave_sql("_x", "_y", _SPARK_SHIFT)).cast("bigint")
    ).drop("_x", "_y")
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_write(
    df: DataFrame,
    key: str,
    order: tuple[str, ...],
    path: str,
    n_files: int = 8,
) -> None:
    """Secondary-sort write: cluster rows by ``key`` and sort each file
    by ``(key, *order)``.

    The repartitionAndSortWithinPartitions pattern in DataFrame terms:
    one shuffle delivers every key's rows to one partition, and the
    write-side sort makes each file a concatenation of per-key ordered
    runs. Downstream sequence consumers (session replay, per-user
    training-example assembly, merge-join readers) then stream each
    key's history in order with ZERO further shuffles or sorts — the
    sort is paid once at layout time, not per query. Also the
    precondition for Spark's bucketed sort-merge reads.
    """
    (
        df.repartition(n_files, key)
        .sortWithinPartitions(key, *order)
        .write.mode("overwrite")
        .parquet(path)
    )
