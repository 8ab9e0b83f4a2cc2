"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, harmonizes dtypes, sorts columns by name and rows by value, and
compares cell-by-cell (exact for non-floats, tiny tolerance for floats
— the real driver hash-compares, so queries are designed to be exact
after their own rounding; the tolerance here only absorbs float32
representation noise).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from scalable_data_ingestion_spark.catalog import TABLES

FLOAT_TOL = 1e-9


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # DuckDB fetchdf renders DATE as midnight datetime64; collapse so
        # date-typed results compare equal (both are arrow date32).
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    # numpy scalars -> python
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    out = []
    for t in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in t))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return cols, out


def assert_query_matches_oracle(spark, name: str, fn, sql: str, sf_dir: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = duckdb_run(sql, sf_dir)

    s_cols, s_rows = _rows(spark_pdf)
    o_cols, o_rows = _rows(oracle_pdf)

    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    assert len(s_rows) > 0, f"{name}: empty result — query exercises nothing"

    mismatches = []
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, (a, b) in zip(s_cols, zip(sr, orow)):
            if isinstance(a, float) and isinstance(b, float):
                if not math.isclose(a, b, rel_tol=FLOAT_TOL, abs_tol=1e-6):
                    mismatches.append((i, c, a, b))
            elif a != b:
                mismatches.append((i, c, a, b))
        if len(mismatches) > 5:
            break
    assert not mismatches, f"{name}: value mismatches (row, col, spark, oracle): {mismatches[:5]}"
