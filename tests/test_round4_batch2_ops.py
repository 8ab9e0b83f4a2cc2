"""Structural/plan gates for the round-4 second-batch operators:
time-series diagnostics (ACF, CUSUM), lexical diversity/burstiness,
engagement analytics (stickiness, Pareto), privacy (l-diversity),
feature encoding (LOO), drift (token JSD), and graph edge similarity
(neighborhood Jaccard). Value correctness is covered by the automatic
oracle sweep (tests/test_oracle_parity.py); these pin the properties
that make the operators right at scale.
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


def _no_global_window(df):
    root = df._jdf.queryExecution().optimizedPlan()

    def nodes(n):
        yield n
        for i in range(n.children().length()):
            yield from nodes(n.children().apply(i))

    for node in nodes(root):
        if node.nodeName() == "Window":
            assert not node.partitionSpec().isEmpty()


def test_acf_bounded_and_windowless(spark, sf_dir):
    df = registry.QUERIES["ts_acf_daily_revenue"](spark, sf_dir)
    _no_global_window(df)
    rows = df.collect()
    from scalable_data_ingestion_spark.operators.timeseries import ACF_MAX_LAG

    assert [r.lag for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    assert all(-1.0 <= r.acf <= 1.0 for r in rows)
    # longer lag -> fewer aligned pairs
    n_pairs = [r.n_pairs for r in rows]
    assert n_pairs == sorted(n_pairs, reverse=True)


def test_cusum_endpoints_near_zero(spark, sf_dir):
    rows = registry.QUERIES["ts_cusum_changepoint"](spark, sf_dir).collect()
    _no_global_window(registry.QUERIES["ts_cusum_changepoint"](spark, sf_dir))
    by_day = sorted(rows, key=lambda r: r.d)
    # CUSUM of deviations from the global mean telescopes to ~0 at the end
    assert abs(by_day[-1].cusum) < 0.02
    assert sum(r.is_changepoint for r in rows) >= 1


def test_lexical_diversity_invariants(spark, sf_dir):
    rows = registry.QUERIES["txt_lexical_diversity"](spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_hapax or r.n_hapax == 0
        assert r.n_hapax <= r.n_types <= r.n_tokens
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.hapax_rate <= 1.0


def test_burstiness_positive_and_df_filtered(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.lexical import BURST_MIN_DF

    rows = registry.QUERIES["txt_token_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.df >= BURST_MIN_DF
        assert r.vmr >= 0.0


def test_stickiness_bounded(spark, sf_dir):
    rows = registry.QUERIES["ev_stickiness_dau_mau"](spark, sf_dir).collect()
    for r in rows:
        assert 0.0 < r.stickiness <= 1.0
        assert r.avg_dau <= r.mau


def test_pareto_tiles_monotone(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["ev_pareto_user_share"](spark, sf_dir).collect(),
        key=lambda r: r.tile,
    )
    # deciles ordered heaviest-first: shares non-increasing, cumulative
    # share increasing to 1.0
    shares = [r.share for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)


def test_l_diversity_bounds(spark, sf_dir):
    rows = registry.QUERIES["dq_l_diversity"](spark, sf_dir).collect()
    # priority has 5 distinct values; every class's l is within [1, 5]
    assert all(1 <= r.l_distinct <= 5 for r in rows)
    assert all(r.l_distinct <= r.n_records for r in rows)


def test_loo_encoding_excludes_own_row(spark, sf_dir):
    df = registry.QUERIES["feat_target_encoding_loo"](spark, sf_dir)
    # the segment stats must broadcast onto the fact scan
    assert "BroadcastHashJoin" in plan(df, "simple")
    rows = df.collect()
    # leave-one-out: the encoding of a segment's max-priced order is
    # strictly below the plain segment mean; check aggregate identity
    # sum_i enc_i * (n-1) == (n-1) * sum/n ... simpler: per segment,
    # mean(enc) == mean(price) exactly (LOO preserves the mean).
    from collections import defaultdict

    by_seg = defaultdict(list)
    for r in rows:
        by_seg[r.c_mktsegment].append(r)
    for seg, rs in by_seg.items():
        mean_price = sum(r.o_totalprice for r in rs) / len(rs)
        mean_enc = sum(r.loo_target_enc for r in rs) / len(rs)
        assert math.isclose(mean_price, mean_enc, rel_tol=1e-6), seg


def test_js_divergence_bounded(spark, sf_dir):
    rows = registry.QUERIES["mon_token_js_divergence"](spark, sf_dir).collect()
    total = sum(r.js_term for r in rows)
    # JSD in nats is bounded by ln 2
    assert 0.0 <= total <= math.log(2) + 1e-9


def test_neighbor_jaccard_consistency(spark, sf_dir):
    rows = registry.QUERIES["gr_neighbor_jaccard"](spark, sf_dir).collect()
    assert rows
    p = plan(registry.QUERIES["gr_neighbor_jaccard"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in p
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.common <= min(r.deg_a, r.deg_b)
