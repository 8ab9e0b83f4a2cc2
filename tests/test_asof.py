"""Generic as-of join semantics: latest-at-or-before, ties, tolerance,
missing-prior NULLs."""

from __future__ import annotations

from datetime import datetime

from scalable_data_ingestion_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 12:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # no prior right row
            (3, _ts("2024-01-01 10:00:00"), "p4"),  # exactly simultaneous right
        ],
        "k long, lt timestamp, label string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 200.0),
            (1, _ts("2024-01-01 13:00:00"), 300.0),  # after everything
            (2, _ts("2024-01-01 09:30:00"), 400.0),  # after p3
            (3, _ts("2024-01-01 10:00:00"), 500.0),  # tie with p4
        ],
        "k long, rt timestamp, v double",
    )
    out = {
        r["label"]: (r["asof_rt"], r["v"])
        for r in asof_join(left, right, "k", "lt", "rt", ["v"]).collect()
    }
    assert out["p1"] == (_ts("2024-01-01 09:30:00"), 100.0)
    assert out["p2"] == (_ts("2024-01-01 11:00:00"), 200.0)
    assert out["p3"] == (None, None)  # nothing at or before
    assert out["p4"] == (_ts("2024-01-01 10:00:00"), 500.0)  # tie: right visible


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p1")], "k long, lt timestamp, label string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 1.0)], "k long, rt timestamp, v double"
    )
    within = asof_join(left, right, "k", "lt", "rt", ["v"], tolerance_seconds=3 * 3600)
    assert within.first()["v"] == 1.0
    outside = asof_join(left, right, "k", "lt", "rt", ["v"], tolerance_seconds=3600)
    assert outside.first()["v"] is None
