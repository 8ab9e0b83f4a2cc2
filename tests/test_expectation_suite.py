"""Unit tests for the declarative expectation-rule compiler
(operators/dq.py): each rule kind compiles to the right predicate and
the suite catches violations a clean fixture doesn't have."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scalable_data_ingestion_spark.operators.dq import (
    _expectation_predicate,
    dq_expectation_suite,
)


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown expectation kind"):
        _expectation_predicate("no_such_kind", "c", None)


def test_predicates_flag_bad_rows(spark):
    df = spark.createDataFrame(
        [
            (1, 5.0, "A", "1995-03-07"),
            (None, -2.0, "Z", "2525-01-01"),
        ],
        ["k", "v", "code", "d"],
    )
    checks = {
        "not_null": ("k", None),
        "non_negative": ("v", None),
        "in_set": ("code", ("A", "B")),
        "matches_regex": ("code", "^[AB]$"),
        "between_dates": ("d", ("1992-01-01", "2000-12-31")),
    }
    for kind, (col, params) in checks.items():
        pred = _expectation_predicate(kind, col, params)
        bad = df.filter(~F.coalesce(pred, F.lit(False))).count()
        assert bad == 1, f"{kind}: expected exactly the planted bad row"


def test_suite_all_green_on_fixture(spark, sf_dir):
    rows = dq_expectation_suite(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.passed for r in rows), rows
    uniq = [r for r in rows if r.rule_name == "orderkey_unique"][0]
    assert uniq.n_violations == 0
