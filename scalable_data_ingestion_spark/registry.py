"""Query + oracle registry.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an
ANSI-SQL twin that DuckDB can run over the same parquet tables. The
driver's correctness harness consumes these via ``__spark_entry__.py``.

Contract reminders (see __spark_entry__ docstring):
- Column names must match between the Spark result and the oracle SQL
  (the driver sorts columns by name before value-hashing).
- Double-valued outputs are rounded (2 dp for money, 6 dp for ratios)
  on BOTH sides so cross-engine float-summation noise cannot flip the
  hash.
- Any LIMIT/top-k query carries a deterministic total order (unique-key
  tiebreak) so both engines select the same row set.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "scalable_data_ingestion_spark.plans.relational",
    "scalable_data_ingestion_spark.plans.relational2",
    "scalable_data_ingestion_spark.plans.relational3",
    "scalable_data_ingestion_spark.plans.windows",
    "scalable_data_ingestion_spark.plans.setops",
    "scalable_data_ingestion_spark.plans.functions_surface",
    "scalable_data_ingestion_spark.plans.events",
    "scalable_data_ingestion_spark.plans.stats",
    "scalable_data_ingestion_spark.operators.enrichment_queries",
    "scalable_data_ingestion_spark.operators.quality_queries",
    "scalable_data_ingestion_spark.operators.dedup",
    "scalable_data_ingestion_spark.operators.text",
    "scalable_data_ingestion_spark.operators.similarity",
    "scalable_data_ingestion_spark.operators.multimodal",
    "scalable_data_ingestion_spark.operators.skew",
    "scalable_data_ingestion_spark.operators.asof",
    "scalable_data_ingestion_spark.streaming.queries",
    "scalable_data_ingestion_spark.streaming.joins",
    "scalable_data_ingestion_spark.sources.api_queries",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Allow partially-built trees during development, but only
            # for the query modules themselves going missing.
            if exc.name and not exc.name.startswith("scalable_data_ingestion_spark"):
                raise


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
