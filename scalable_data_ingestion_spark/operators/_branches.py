"""Shared fan-out helper for one-row aggregate readouts.

Several queries end with a single-row aggregate (all thresholds /
windows / slopes computed as columns of ONE row) that must be read out
as one row PER branch. Writing that readout as a union of per-branch
``df.select(...)`` re-executes the aggregate's whole subtree once per
branch — Spark unions are independent plans, not shared CTEs. Emitting
every branch as a struct and exploding keeps a SINGLE reference to the
subtree, so the expensive upstream runs exactly once at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_branches(df: DataFrame, branches: Sequence[Column]) -> DataFrame:
    """One output row per struct column in ``branches``, referencing
    ``df`` (typically a one-row aggregate) exactly once.

    Each branch must be an ``F.struct(...)`` with identical field names
    and types; the structs' fields become the output columns.
    """
    return df.select(F.explode(F.array(*branches)).alias("_b")).select(
        "_b.*"
    )
