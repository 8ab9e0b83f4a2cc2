"""Structural/plan gates for the statistical-test operators
(operators/stattests.py). Value correctness is covered by the
automatic oracle sweep (tests/test_oracle_parity.py); these pin the
properties that make the tests right at scale and statistically sane.
"""

from __future__ import annotations

import contextlib
import io
import math

from scalable_data_ingestion_spark import registry

registry.load_all()


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_mann_kendall_pairs_join_day_grain(spark, sf_dir):
    # The O(n²) pair join must run on the AGGREGATED day relation —
    # the plan aggregates below the non-equi join, never joining the
    # raw fact table against itself.
    df = registry.QUERIES["stat_mann_kendall_trend"](spark, sf_dir)
    p = plan(df, "simple")
    agg_pos = p.find("HashAggregate")
    join_pos = max(p.find("BroadcastNestedLoopJoin"), p.find("CartesianProduct"))
    assert agg_pos != -1 and join_pos != -1
    row = df.collect()[0]
    # internal consistency: |S| <= n(n-1)/2 and Var(S) > 0
    max_s = row.n_days * (row.n_days - 1) / 2
    assert abs(row.s_stat) <= max_s
    assert row.var_s > 0
    assert row.trend in ("increasing", "decreasing", "no_trend")


def test_theil_sen_median_within_slope_range(spark, sf_dir):
    row = registry.QUERIES["stat_theil_sen_slope"](spark, sf_dir).collect()[0]
    assert row.n_pairs == row.n_days * (row.n_days - 1) // 2
    assert math.isfinite(row.slope_per_day)
    assert math.isfinite(row.intercept)


def test_ks_no_unpartitioned_window_and_bounded_stat(spark, sf_dir):
    df = registry.QUERIES["stat_ks_two_sample"](spark, sf_dir)
    # the CDF scan uses the range-partitioned prefix-sum helper — the
    # optimized plan must not contain an empty-partition-spec window
    # (also enforced globally by test_plan_quality).
    root = df._jdf.queryExecution().optimizedPlan()

    def nodes(n):
        yield n
        for i in range(n.children().length()):
            yield from nodes(n.children().apply(i))

    for node in nodes(root):
        if node.nodeName() == "Window":
            assert not node.partitionSpec().isEmpty()
    row = df.collect()[0]
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.n_a > 0 and row.n_b > 0


def test_chi2_cells_sum_to_margins(spark, sf_dir):
    rows = registry.QUERIES["stat_chi2_segment_priority"](spark, sf_dir).collect()
    # expected-count margins must reproduce the observed totals
    total_obs = sum(r.observed for r in rows)
    total_exp = sum(r.expected for r in rows)
    assert abs(total_obs - total_exp) < 1e-3
    assert all(r.chi2_term >= 0 for r in rows)
    # full contingency: every (segment, priority) cell present
    assert len({(r.c_mktsegment, r.o_orderpriority) for r in rows}) == len(rows)
