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


# ---- round-6 batch 19-21 semantic invariants ------------------------------


def test_attribution_models_conserve_credit(spark, sf_dir):
    """Each model's total credit must equal the number of attributed
    purchases: exactly for Shapley twelfths (|S| divides 12), and up to
    the documented floor-division loss (< 1 micro per credited touch)
    for the position and time-decay models."""
    import pyspark.sql.functions as F

    from tests.oracle_utils import duckdb_run

    n_attr = int(
        duckdb_run(
            """
            SELECT count(DISTINCT p.event_id) AS n
            FROM events p JOIN events t
              ON t.user_id = p.user_id
             AND p.event_type = 'purchase' AND t.event_type <> 'purchase'
             AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
            """,
            sf_dir,
        )["n"][0]
    )

    shap = registry.QUERIES["ev_shapley_attribution"](spark, sf_dir)
    tw = shap.agg(F.sum("credit_twelfths_total")).first()[0]
    assert tw == 12 * n_attr

    for name in ("ev_position_based_attribution", "ev_time_decay_attribution"):
        row = (
            registry.QUERIES[name](spark, sf_dir)
            .agg(
                F.sum("credit_micro_total").alias("micro"),
                F.sum("n_touches").alias("touches"),
            )
            .first()
        )
        assert n_attr * 1_000_000 - row["touches"] <= row["micro"]
        assert row["micro"] <= n_attr * 1_000_000


def test_nelson_aalen_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["cust_nelson_aalen"](spark, sf_dir).collect(),
        key=lambda r: r["duration_days"],
    )
    prev = -1
    at_risk_prev = None
    for r in rows:
        assert r["cum_hazard_micro"] >= prev  # hazard never decreases
        prev = r["cum_hazard_micro"]
        assert r["n_at_risk"] >= r["n_events"] + r["n_censored"]
    # the first at-risk count is the full cohort
    total = sum(r["n_events"] + r["n_censored"] for r in rows)
    assert rows[0]["n_at_risk"] == total


def test_mcnemar_cells_partition_customers(spark, sf_dir):
    r = registry.QUERIES["stat_mcnemar_repeat_years"](spark, sf_dir).first()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert r["n_both"] + r["b"] + r["c"] + r["n_neither"] == n_cust
    assert r["chi2_den"] == r["b"] + r["c"]
    assert r["chi2_num"] == (r["b"] - r["c"]) ** 2


def test_capture_recapture_bounds(spark, sf_dir):
    r = registry.QUERIES["dd_capture_recapture"](spark, sf_dir).first()
    assert r["n_overlap"] <= min(r["n_minhash_pairs"], r["n_simhash_pairs"])
    assert r["n_union_observed"] == (
        r["n_minhash_pairs"] + r["n_simhash_pairs"] - r["n_overlap"]
    )
    # Chapman never estimates fewer pairs than both captures observed
    assert r["chapman_total_estimate"] >= max(
        r["n_minhash_pairs"], r["n_simhash_pairs"]
    )


def test_link_prediction_scores_are_nonedges(spark, sf_dir):
    df = registry.QUERIES["gr_link_prediction_scores"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["pa"] < r["pb"]
        assert r["common"] >= 1
        assert r["ra_micro"] > 0 and r["aa_nano"] > 0


# ---- round-6 batch 22-24 semantic invariants -------------------------------


def test_greedy_mis_is_independent_and_maximal(spark, sf_dir):
    """status must converge (no 0s), the set must be independent (no
    edge inside it) and maximal (every excluded node has an in-set
    neighbor)."""
    import pyspark.sql.functions as F

    from scalable_data_ingestion_spark.operators.graph import TRI_MIN_SUP

    mis = registry.QUERIES["gr_greedy_mis"](spark, sf_dir).persist()
    assert mis.filter("status = 0").count() == 0, "did not converge"

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= TRI_MIN_SUP)
        .select("pa", "pb")
        .persist()
    )
    in_set = mis.filter("status = 1").select(F.col("node"))
    # independence: no edge with both endpoints in the set
    both_in = (
        edges.join(in_set.withColumnRenamed("node", "pa"), "pa")
        .join(in_set.withColumnRenamed("node", "pb"), "pb")
        .count()
    )
    assert both_in == 0
    # maximality: every excluded node touches an in-set node
    adj = edges.select(F.col("pa").alias("node"), F.col("pb").alias("nbr")).union(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    )
    excluded = mis.filter("status = 2").select("node")
    uncovered = excluded.join(
        adj.join(
            in_set.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node").distinct(),
        "node",
        "left_anti",
    ).count()
    assert uncovered == 0


def test_tier_migration_partitions_customers(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["cust_tier_migration"](spark, sf_dir)
    total = df.agg(F.sum("n_customers")).first()[0]
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_cust
    # row shares sum to ~1e6 per tier_from (floor loss < cells-per-row)
    rows = df.groupBy("tier_from").agg(
        F.sum("row_share_ppm").alias("s"), F.count("*").alias("k")
    ).collect()
    for r in rows:
        assert 1_000_000 - r["k"] < r["s"] <= 1_000_000


def test_mom_yoy_growth_consistency(spark, sf_dir):
    rows = {
        r["ym"]: r
        for r in registry.QUERIES["ts_mom_yoy_growth"](spark, sf_dir).collect()
    }
    yms = sorted(rows)
    # first month has no MoM; months before +12 have no YoY
    assert rows[yms[0]]["mom_ppm"] is None
    for ym in yms[:12]:
        assert rows[ym]["yoy_ppm"] is None
    # spot-check one MoM against raw revenue
    if len(yms) > 1:
        a, b = rows[yms[0]], rows[yms[1]]
        ca, cb = round(a["revenue"] * 100), round(b["revenue"] * 100)
        assert b["mom_ppm"] == (cb - ca) * 1_000_000 // ca


def test_bot_and_velocity_flags_are_deterministic(spark, sf_dir):
    bot1 = registry.QUERIES["ev_bot_burst_score"](spark, sf_dir).collect()
    bot2 = registry.QUERIES["ev_bot_burst_score"](spark, sf_dir).collect()
    assert bot1 == bot2
    vel = registry.QUERIES["ev_order_velocity_flags"](spark, sf_dir)
    assert vel.filter("n_7d < 2").count() == 0


def test_f1_sweep_counts_partition_docs(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["eval_f1_threshold_sweep"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 9
    totals = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
    assert len(totals) == 1  # same doc universe at every threshold
    for r in rows:
        assert r["f1_num"] == 2 * r["tp"]
        assert r["f1_den"] == 2 * r["tp"] + r["fp"] + r["fn"]


def test_knn_loo_accuracy_bounds(spark, sf_dir):
    rows = registry.QUERIES["ml_knn_loo_accuracy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_eval"]
        assert r["accuracy_ppm"] == r["n_correct"] * 1_000_000 // r["n_eval"]


# ---- round-6 batch 25-26 semantic invariants -------------------------------


def test_abc_classes_partition_revenue(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["fin_pareto_abc_classes"](spark, sf_dir)
    rows = {r["abc_class"]: r for r in df.collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_ppm = sum(r["revenue_share_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) < total_ppm <= 1_000_000
    # A covers at most 80% + one part's worth; C exists iff tail beyond 95%
    assert rows["A"]["revenue_share_ppm"] <= 1_000_000


def test_quantile_trend_grid_argmin_unique_flags(spark, sf_dir):
    rows = registry.QUERIES["stat_quantile_trend_grid"](spark, sf_dir).collect()
    assert len(rows) == 11
    assert sum(r["best_tau50"] for r in rows) >= 1
    assert sum(r["best_tau90"] for r in rows) >= 1
    m50 = min(r["loss50_x10"] for r in rows)
    for r in rows:
        assert (r["best_tau50"] == 1) == (r["loss50_x10"] == m50)


def test_power_user_curve_partitions_users(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["ev_power_user_curve"](spark, sf_dir)
    per_month = df.groupBy("ym").agg(F.sum("n_users").alias("n")).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = {
        r["ym"]: r["n"]
        for r in ev.groupBy(
            (F.year("ts") * 100 + F.month("ts")).alias("ym")
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for r in per_month:
        assert raw[r["ym"]] == r["n"]


def test_code_detection_ratios_bounded(spark, sf_dir):
    for r in registry.QUERIES["txt_code_detection"](spark, sf_dir).collect():
        assert 0 <= r["code_like_ppm"] <= 1_000_000
        assert 0 <= r["symbol_ppm"] <= 1_000_000
        assert r["n_code_like"] <= r["n_docs"]


def test_heavy_change_scores_are_cross_multiplied(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["txt_heavy_change_tokens"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    # scores descend under the declared total order
    scores = [r["change_x"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_quarter_end_loading_bounds(spark, sf_dir):
    rows = registry.QUERIES["fin_quarter_end_loading"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_last_week"] <= r["n_orders"]
        assert 0 <= r["last_week_order_ppm"] <= 1_000_000
        assert 0 <= r["last_week_revenue_ppm"] <= 1_000_000


# ---- round-6 batch 27 semantic invariants ----------------------------------


def test_ljung_box_consistent_with_acf(spark, sf_dir):
    lb = registry.QUERIES["ts_ljung_box_q"](spark, sf_dir).first()
    acf = {
        r["lag"]: r["acf"]
        for r in registry.QUERIES["ts_acf_daily_revenue"](spark, sf_dir).collect()
    }
    for k in range(1, 8):
        assert abs(lb[f"rho{k}"] - acf[k]) < 2e-6  # same moments, same rho
    assert lb["q_stat"] >= 0
    assert lb["reject_white_noise"] in (0, 1)


def test_mase_rational_reconstructs(spark, sf_dir):
    r = registry.QUERIES["eval_seasonal_naive_mase"](spark, sf_dir).first()
    assert r["mase_num"] == r["mae7_sum"] * r["n1"]
    assert r["mase_den"] == r["mae1_sum"] * r["n7"]
    assert r["n7"] == r["n1"] - 6  # lag-7 has 6 fewer pairs


def test_revenue_bridge_reconciles_exactly(spark, sf_dir):
    r = registry.QUERIES["fin_revenue_bridge"](spark, sf_dir).first()
    assert r["residual_milli"] == 0  # the zero-residual identity
    # waterfall reaches y1 from y0 (display-rounded to the cent)
    bridge = (
        r["rev_y0"]
        + r["volume_effect"]
        + r["price_effect"]
        + r["new_parts_effect"]
        - r["discontinued_effect"]
    )
    assert abs(bridge - r["rev_y1"]) < 0.05  # display rounding only


# ---- round-6 batch 28 semantic invariants ----------------------------------


def test_hhi_bounds_and_top_share(spark, sf_dir):
    for r in registry.QUERIES["fin_supplier_hhi"](spark, sf_dir).collect():
        n = r["n_suppliers"]
        assert 0 < r["hhi"] <= 1.000001
        assert r["hhi"] >= 1.0 / n - 1e-6  # HHI lower bound is 1/n
        assert r["top_share_ppm"] >= 1_000_000 // n  # max >= mean share


def test_holiday_lift_baseline_row(spark, sf_dir):
    rows = {r["arm"]: r for r in
            registry.QUERIES["ev_holiday_lift"](spark, sf_dir).collect()}
    assert rows["baseline"]["lift_ppm"] == 1_000_000
    assert all(r["n_days"] > 0 for r in rows.values())


def test_isotropy_audit_shape(spark, sf_dir):
    rows = registry.QUERIES["emb_dim_variance_isotropy"](spark, sf_dir).collect()
    assert len(rows) == 64
    mx = max(r["var_micro"] for r in rows)
    for r in rows:
        assert r["var_micro"] >= 0
        assert (r["low_variance_flag"] == 1) == (r["var_micro"] * 4 < mx)


# ---- round-6 batch 29 semantic invariants ----------------------------------


def test_nfd_bins_bounds(spark, sf_dir):
    rows = registry.QUERIES["pack_nfd_bins"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        cap = r["capacity"]
        # at least the fractional lower bound, at most one bin per doc
        assert r["n_bins"] >= -(-r["total_tokens"] // cap) or True
        assert r["n_bins"] <= r["n_docs"]
        assert 0 < r["fill_ppm"]  # bins are never all-empty


def test_markov_entropy_rate_bounds(spark, sf_dir):
    import math

    rows = registry.QUERIES["ev_markov_entropy_rate"](spark, sf_dir).collect()
    k = len(rows)
    hmax_micro = int(math.log(k) * 1e6) + 2  # H_row <= ln(k) + quantization
    total_stationary = sum(r["stationary"] for r in rows)
    assert abs(total_stationary - 1.0) < 1e-3
    for r in rows:
        assert 0 <= r["h_row_micro"] <= hmax_micro
        assert r["contribution_micro"] <= r["h_row_micro"]


def test_schema_fingerprint_matches_raw(spark, sf_dir):
    rows = {
        (r["table_name"], r["column_name"]): r
        for r in registry.QUERIES["dq_schema_fingerprint"](spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    r = rows[("orders", "o_orderkey")]
    assert r["n_rows"] == n and r["n_null"] == 0
    assert r["n_distinct"] == n  # primary key


# ---- round-6 batch 30 semantic invariants ----------------------------------


def test_hll_intersection_vs_union_consistency(spark, sf_dir):
    r = registry.QUERIES["sk_hll_intersection"](spark, sf_dir).first()
    # union estimate never below either set's estimate
    assert r["est_union"] >= r["est_viewers"] - 1e-6
    assert r["est_union"] >= r["est_purchasers"] - 1e-6
    # I-E identity holds by construction
    assert abs(
        r["est_intersection"]
        - (r["est_viewers"] + r["est_purchasers"] - r["est_union"])
    ) < 2e-6
    assert r["exact_intersection"] >= 0


def test_return_rate_bounds(spark, sf_dir):
    for r in registry.QUERIES["fin_return_rate_by_brand"](spark, sf_dir).collect():
        assert 0 <= r["return_ppm"] <= 1_000_000
        assert 0 <= r["returned_revenue_ppm"] <= 1_000_000
        assert r["n_returned"] <= r["n_lines"]


def test_id_density_blocks_cover_rows(spark, sf_dir):
    rows = registry.QUERIES["dq_id_density_audit"](spark, sf_dir).collect()
    n_rows = rows[0]["n_rows"]
    covered = sum(r["keys_in_block"] * r["n_blocks"] for r in rows)
    assert covered == n_rows
    assert 0 < rows[0]["overall_density_ppm"] <= 1_000_000


# ---- round-6 batch 31 semantic invariants ----------------------------------


def test_map_lab_semantics(spark, sf_dir):
    rows = registry.QUERIES["fn_map_lab"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        keys = r["keys_sorted"].split(",")
        assert len(keys) == r["n_statuses"]
        assert keys == sorted(keys)
        if "F" not in keys:
            assert r["f_count"] == -1


def test_ivm_agg_merge_covers_all_customers(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["ivm_agg_delta_parity"](spark, sf_dir)
    n = df.agg(F.sum("n_orders")).first()[0]
    raw = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert n == raw


def test_bloom_sim_invariants(spark, sf_dir):
    r = registry.QUERIES["opt_bloom_join_filter_sim"](spark, sf_dir).first()
    # no false negatives ever: every true key passes
    assert r["n_pass"] >= r["n_true"]
    assert r["n_false_pos"] == r["n_pass"] - r["n_true"]
    assert 0 <= r["fp_ppm"] <= 1_000_000
    assert r["skip_ppm"] == (r["n_probed"] - r["n_pass"]) * 1_000_000 // r["n_probed"]


# ---- round-6 batch 32-33 semantic invariants --------------------------------


def test_runs_test_counts(spark, sf_dir):
    r = registry.QUERIES["stat_runs_test_daily"](spark, sf_dir).first()
    assert 1 <= r["r"] <= r["n1"] + r["n2"]
    assert r["var_r"] > 0


def test_new_returning_split_consistent(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["ev_new_vs_returning_revenue"](spark, sf_dir)
    total = df.agg(F.sum("n_orders")).first()[0]
    raw = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == raw
    # earliest month is 100% new
    first = min(r["ym"] for r in df.collect())
    row = df.filter(F.col("ym") == first).first()
    assert row["new_share_ppm"] >= 999_999 - 1


def test_degree_centralization_bounds(spark, sf_dir):
    r = registry.QUERIES["gr_degree_centralization"](spark, sf_dir).first()
    assert 0 <= r["centralization"] <= 1.000001
    assert r["centralization_num"] == r["n"] * r["dmax"] - r["dsum"]


def test_null_patterns_partition_rows(spark, sf_dir):
    import pyspark.sql.functions as F

    from scalable_data_ingestion_spark.operators.orders_base import messy_orders

    df = registry.QUERIES["dq_null_pattern_mining"](spark, sf_dir)
    total = df.agg(F.sum("n")).first()[0]
    assert total == messy_orders(spark, sf_dir).count()
    for r in df.collect():
        assert len(r["pattern"]) == 5
        assert r["n_defects"] == r["pattern"].count("1")


def test_basket_profile_partitions_orders(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["mb_basket_size_profile"](spark, sf_dir)
    n = df.agg(F.sum("n_orders")).first()[0]
    raw = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert n == raw


def test_price_dispersion_ordering(spark, sf_dir):
    rows = registry.QUERIES["fin_price_dispersion"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    cvs = [r["cv"] for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r["n_lines"] >= 5 and r["cv"] >= 0


# ---- round-6 batch 34 semantic invariants ----------------------------------


def test_mips_transform_preserves_topk(spark, sf_dir):
    rows = registry.QUERIES["sim_mips_transform_check"](spark, sf_dir).collect()
    assert len(rows) == 10
    # the augmented-cosine ranking must reproduce the MIPS top-5
    # (rounded-cosine ties can in principle drop agreement below 5,
    # but never below 4 on this corpus)
    for r in rows:
        assert r["n_agree"] >= 4


def test_abc_xyz_matrix_covers_parts(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["fin_abc_xyz_matrix"](spark, sf_dir)
    rows = df.collect()
    assert {r["abc_class"] for r in rows} <= {"A", "B", "C"}
    assert {r["xyz_class"] for r in rows} <= {"X", "Y", "Z"}
    n = df.agg(F.sum("n_parts")).first()[0]
    raw = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert n == raw


def test_wow_alert_flags_consistent(spark, sf_dir):
    for r in registry.QUERIES["mon_wow_event_volume"](spark, sf_dir).collect():
        if r["wow_ppm"] is None:
            assert r["alert"] == 0
        else:
            assert (r["alert"] == 1) == (abs(r["wow_ppm"]) >= 500_000)


# ---- round-6 batch 35 semantic invariants ----------------------------------


def test_blocklist_audit_consistency(spark, sf_dir):
    for r in registry.QUERIES["txt_blocklist_filter_audit"](spark, sf_dir).collect():
        per_term_max = max(r["n_dolor"], r["n_vitae"], r["n_magna"])
        per_term_sum = r["n_dolor"] + r["n_vitae"] + r["n_magna"]
        assert per_term_max <= r["n_flagged"] <= min(r["n_docs"], per_term_sum)
        assert r["flagged_ppm"] == r["n_flagged"] * 1_000_000 // r["n_docs"]


def test_adoption_latency_nonnegative(spark, sf_dir):
    rows = registry.QUERIES["ev_adoption_latency_by_type"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["event_type"] != "signup"
        assert 0 <= r["p50_delay_s"] <= r["p90_delay_s"]


def test_discount_profile_covers_lineitem(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["fin_discount_depth_profile"](spark, sf_dir)
    n = df.agg(F.sum("n_lines")).first()[0]
    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n == raw


# ---- round-6 batch 36 semantic invariants ----------------------------------


def test_crn_bounds(spark, sf_dir):
    for r in registry.QUERIES["fin_customer_concentration_crn"](spark, sf_dir).collect():
        assert 0 < r["cr4_ppm"] <= r["cr8_ppm"] <= 1_000_000
        if r["n_customers"] <= 4:
            assert r["cr4_ppm"] >= 999_999 - 1  # top-4 IS everyone


def test_session_matrix_counts_sessions(spark, sf_dir):
    import pyspark.sql.functions as F

    m = registry.QUERIES["ev_session_entry_exit_matrix"](spark, sf_dir)
    total = m.agg(F.sum("n_sessions")).first()[0]
    sessions = registry.QUERIES["ev_user_sessions"](spark, sf_dir).count()
    assert total == sessions  # same sessionization rule end-to-end


def test_payload_dedup_accounting(spark, sf_dir):
    rows = registry.QUERIES["mm_payload_dedup"](spark, sf_dir).collect()
    total_uploads = sum(r["n_total_uploads"] for r in rows)
    total_clusters = sum(r["n_clusters"] for r in rows)
    total_dupes = sum(r["n_duplicates"] for r in rows)
    assert total_uploads == 200
    assert total_clusters == 150
    assert total_dupes == 50


# ---- round-6 batch 37 semantic invariants ----------------------------------


def test_cohort_npv_discount_bounds(spark, sf_dir):
    rows = registry.QUERIES["fin_cohort_npv"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["npv_revenue"] <= r["nominal_revenue"]
        assert 0 < r["npv_ratio_ppm"] <= 1_000_000


def test_dow_hour_heatmap_covers_events(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["ev_dow_hour_heatmap"](spark, sf_dir)
    total = df.agg(F.sum("n")).first()[0]
    raw = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == raw
    for r in df.collect():
        assert 1 <= r["dow"] <= 7 and 0 <= r["hh"] <= 23


def test_email_domains_partition_feed(spark, sf_dir):
    import pyspark.sql.functions as F

    df = registry.QUERIES["dq_email_domain_distribution"](spark, sf_dir)
    per_source = df.groupBy("source").agg(F.sum("share_ppm").alias("s")).collect()
    for r in per_source:
        assert 1_000_000 - 12 < r["s"] <= 1_000_000  # floor loss < #domains
