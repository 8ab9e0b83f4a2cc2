"""Table catalog over the driver-provided parquet star schema.

``TESTDATA.md``: tables live at ``{sf_dir}/{name}.parquet``. Reads are
plain ``spark.read.parquet`` so Catalyst gets full pushdown (column
pruning + predicate pushdown + row-group skipping via parquet min/max).

At 100 TB these would be partitioned warehouse tables (e.g. ``orders``
by month of ``o_orderdate``); the loaders keep that concern isolated
here so query code never hard-codes paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Must be set before the read is *analyzed* — harmless if the
        # session (session.py) already set it; needed when the driver
        # harness builds its own SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as a
        # nanos-since-epoch LONG under spark.sql.legacy.parquet.nanosAsLong
        # (set in session.py). Convert to a microsecond TimestampType with
        # exact integer division so semantics match DuckDB's nanos→micros
        # truncation.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")))
    return df


def widen_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow relation to full parallelism.

    A parquet file is parallelized by row group; the small-SF test files
    carry a single row group, so a scan — and everything that fuses into
    its stage: projections, regex validity checks, partial aggregation —
    runs as ONE task no matter how many cores exist. AQE cannot fix this
    (it re-plans only at shuffle boundaries, never scan width). At
    cluster scale the same table has thousands of row groups and this
    helper is a no-op (the guard sees partitions >= cores). When it does
    fire, the cost is one narrow shuffle of the scan's raw rows, repaid
    by N-way parallel expression evaluation in every downstream stage.

    Call it only on scan-shaped inputs (``.rdd`` here just builds the
    RDD lineage to count partitions; on a plain file scan that triggers
    no job).
    """
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: never break the query
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    if parts * 2 >= cores:
        return df
    return df.repartition(cores)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_query_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    prebuilt: dict | None = None,
) -> list[str]:
    """Expose registry queries as ``spark.sql``-addressable temp views.

    Completes the SQL frontend story: after this call a user can write
    ``spark.sql("SELECT * FROM ev_qini_uplift WHERE tile <= 3")`` for
    any registered query — zero new operators, pure naming. Base
    tables are registered first so query views and raw tables compose
    in one SQL statement.

    ``names`` limits registration to a subset (view construction is
    lazy for most queries, but the ranking-offset family runs its
    boundary jobs at plan-build time, so registering all ~375 views
    eagerly costs real driver time — pass the subset you need in
    latency-sensitive paths). Returns the view names registered, in
    order; a query whose plan cannot build is skipped (never raises),
    so one broken input column cannot take down the whole catalog.
    """
    from . import registry

    register_views(spark, sf_dir)
    qs = registry.queries()
    if names is not None:
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise KeyError(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in names}
    done: list[str] = []
    for name, fn in qs.items():
        try:
            # ``prebuilt`` reuses already-constructed DataFrames (e.g.
            # a test session's shared plan build) — view registration
            # itself is pure naming, so skipping the rebuild (and any
            # eager training jobs it runs) changes nothing.
            df = prebuilt[name] if prebuilt and name in prebuilt else fn(
                spark, sf_dir
            )
            df.createOrReplaceTempView(name)
        except Exception:  # pragma: no cover - defensive per-view guard
            continue
        done.append(name)
    return done
