"""Round-6 hardening tests.

1. ``ev_qini_uplift`` ships exact integer rationals (no float column
   anywhere) and matches its DuckDB oracle — the deterministic rewrite
   of the r5 driver-contested query.
2. ``ev_time_to_convert_percentiles`` delays are derived from NTZ
   interval arithmetic, so the query result is invariant to the
   session timezone (the r5 advice item: the old to_utc_timestamp
   round-trip was only correct because session.py pins UTC).
"""

from __future__ import annotations

import pytest

from scalable_data_ingestion_spark import registry
from tests.oracle_utils import assert_query_matches_oracle

registry.load_all()


def test_qini_schema_is_all_integer(spark, sf_dir):
    df = registry.QUERIES["ev_qini_uplift"](spark, sf_dir)
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert types == {
        "tile": "integer",
        "n_t": "long",
        "n_c": "long",
        "conv_t": "long",
        "conv_c": "long",
        "uplift_num": "long",
        "uplift_den": "long",
        "qini_num": "long",
        "qini_den": "long",
    }


def test_qini_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(
        spark,
        "ev_qini_uplift",
        registry.QUERIES["ev_qini_uplift"],
        registry.ORACLES["ev_qini_uplift"],
        sf_dir,
    )


def test_qini_rationals_reconstruct_rates(spark, sf_dir):
    # The rational pairs must reduce to the textbook definitions:
    # uplift = conv_t/n_t - conv_c/n_c, Qini(k) = ct_cum - cc_cum *
    # nt_cum/nc_cum (checked in exact fractions, not floats).
    from fractions import Fraction

    rows = sorted(
        registry.QUERIES["ev_qini_uplift"](spark, sf_dir).collect(),
        key=lambda r: r["tile"],
    )
    ct = cc = nt = nc = 0
    for r in rows:
        assert r["uplift_den"] == r["n_t"] * r["n_c"]
        if r["uplift_den"] > 0:  # tiny SF can leave a decile one-armed
            assert Fraction(r["uplift_num"], r["uplift_den"]) == Fraction(
                r["conv_t"], r["n_t"]
            ) - Fraction(r["conv_c"], r["n_c"])
        ct += r["conv_t"]
        cc += r["conv_c"]
        nt += r["n_t"]
        nc += r["n_c"]
        assert r["qini_den"] == nc
        if nc > 0:
            assert Fraction(r["qini_num"], r["qini_den"]) == ct - Fraction(
                cc * nt, nc
            )


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kolkata"])
def test_time_to_convert_is_timezone_invariant(spark, sf_dir, tz):
    name = "ev_time_to_convert_percentiles"
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert_query_matches_oracle(
            spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
