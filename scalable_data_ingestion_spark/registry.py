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

Cache policy for library callers: query builders persist()
intermediate relations that their own plan references more than once
(MEMORY_AND_DISK, never eagerly materialized) and deliberately do NOT
unpersist — the cache entry must outlive the builder because the
returned DataFrame's plan still references it, and an unpersist-on-
return would silently re-execute the shared subtree per reference.
Spark evicts these LRU under memory pressure, so correctness never
depends on them; but a long-lived session running MANY registered
queries accumulates entries that can evict later queries' working
sets. Harness runners (bench.py, tools/parity_sweep.py) therefore call
``spark.catalog.clearCache()`` between queries; a library caller
running more than a handful of queries in one session should wrap each
build-and-consume in :func:`cache_scope` (the same clear, packaged as
the contract). Single-query sessions need nothing.
"""

from __future__ import annotations

import contextlib
import importlib
import json
from collections.abc import Callable, Iterator
from pathlib import Path

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
    "scalable_data_ingestion_spark.operators.winnow",
    "scalable_data_ingestion_spark.operators.reweight",
    "scalable_data_ingestion_spark.operators.incremental_dedup",
    "scalable_data_ingestion_spark.operators.text",
    "scalable_data_ingestion_spark.operators.curation",
    "scalable_data_ingestion_spark.operators.gopher",
    "scalable_data_ingestion_spark.operators.retrieval",
    "scalable_data_ingestion_spark.operators.prefixjoin",
    "scalable_data_ingestion_spark.operators.features",
    "scalable_data_ingestion_spark.operators.softdedup",
    "scalable_data_ingestion_spark.operators.splits",
    "scalable_data_ingestion_spark.operators.corpus",
    "scalable_data_ingestion_spark.operators.clustering",
    "scalable_data_ingestion_spark.operators.analytics",
    "scalable_data_ingestion_spark.operators.scd",
    "scalable_data_ingestion_spark.operators.filtering",
    "scalable_data_ingestion_spark.operators.graph",
    "scalable_data_ingestion_spark.operators.entity",
    "scalable_data_ingestion_spark.operators.pq",
    "scalable_data_ingestion_spark.operators.opq",
    "scalable_data_ingestion_spark.operators.monitor",
    "scalable_data_ingestion_spark.operators.stattests",
    "scalable_data_ingestion_spark.operators.lexical",
    "scalable_data_ingestion_spark.operators.dq",
    "scalable_data_ingestion_spark.operators.timeseries",
    "scalable_data_ingestion_spark.operators.projection",
    "scalable_data_ingestion_spark.operators.similarity",
    "scalable_data_ingestion_spark.operators.multivector",
    "scalable_data_ingestion_spark.operators.sketches",
    "scalable_data_ingestion_spark.operators.multimodal",
    "scalable_data_ingestion_spark.operators.skew",
    "scalable_data_ingestion_spark.operators.layout",
    "scalable_data_ingestion_spark.operators.bpe",
    "scalable_data_ingestion_spark.operators.sgd",
    "scalable_data_ingestion_spark.operators.asof",
    "scalable_data_ingestion_spark.streaming.queries",
    "scalable_data_ingestion_spark.streaming.span_dedup",
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


@contextlib.contextmanager
def cache_scope(spark: SparkSession) -> Iterator[SparkSession]:
    """Cache lifecycle for library callers (the module-docstring policy
    as a helper): build a registered query AND run its action inside
    this scope; every cache the builder persisted is dropped on exit.

        with registry.cache_scope(spark):
            rows = registry.queries()["dd_minhash_lsh_pairs"](spark, sf).collect()

    Builders cannot unpersist their own caches (the returned DataFrame
    is lazy — its plan still references the persisted subtrees, and the
    consuming action runs after the builder returns), so the lifecycle
    belongs to the consumer. The scope clears the session's WHOLE cache
    (``spark.catalog.clearCache()``) — per-entry tracking would need
    every one of the ~150 persist sites routed through a choke point
    for no behavioural difference to a caller that scopes one query at
    a time, which is the contract. An application holding its OWN
    long-lived caches in the same session should run registry queries
    in a separate SparkSession (cheap: sessions share the SparkContext
    via ``spark.newSession()`` but cache registration is per-context,
    so truly isolated caching needs a separate context/process — or
    simply re-persist after the scope).

    Exception-safe: caches are dropped even when the query raises
    (e.g. dd_prefix_jaccard_pairs' PJ_CANDIDATE_CAP guard).
    """
    try:
        yield spark
    finally:
        spark.catalog.clearCache()


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


# Curated registry ordering. The driver's CORRECTNESS harness checks the
# first N registered queries (N=50), so the leading entries rotate each
# round to converge the driver's own record on the full registry.
# Round-7 window: union of driver-green CORRECTNESS_r01-r06 = 275
# distinct names of 431 registered, leaving 156 never-driver-hashed.
# This tuple is EXACTLY that 156-query never-checked set, in the same
# newest-batches-first order the r6 rotation established, so the
# driver's 50-query window is 50/50 first-timers and any larger window
# burns more debt. Per the r6 verdict, net-new operator registration is
# frozen this round; everything not listed keeps registration order and
# stays covered by tools/parity_sweep.py locally (431/431 green at r6
# HEAD; 431/431 strict bit-exact at r7).
#
# Since round 7 the ordering SELF-ROTATES: _ordered() floats the
# _PRIORITY names that no CORRECTNESS_r*.json has recorded yet ahead of
# the already-hashed ones, so when the round-7 driver file lands, the
# round-8 window automatically becomes the next 50 never-hashed names
# without editing this tuple.
_PRIORITY = (
    "sim_mips_transform_check",
    "fin_abc_xyz_matrix",
    "mon_wow_event_volume",
    "txt_blocklist_filter_audit",
    "ev_adoption_latency_by_type",
    "fin_discount_depth_profile",
    "fin_customer_concentration_crn",
    "ev_session_entry_exit_matrix",
    "mm_payload_dedup",
    "fin_cohort_npv",
    "ev_dow_hour_heatmap",
    "dq_email_domain_distribution",
    "ev_markov_stationary",
    "ts_rolling_origin_backtest",
    "dd_lsh_bands_curve",
    "ev_activity_streaks",
    "stat_skew_kurtosis_by_segment",
    "txt_heaps_law_fit",
    "dq_functional_dependencies",
    "opt_column_encoding_stats",
    "ev_ips_policy_value",
    "opt_compaction_plan",
    "rj_binned_interval_revenue",
    "fn_array_lab",
    "sk_hll_rolling_7d_users",
    "opt_join_qerror",
    "sla_business_day_leadtime",
    "ev_user_value_trend",
    "fn_window_lab",
    "mm_patch_grid",
    "dq_expectation_suite",
    "ev_ab_proportion_ztest",
    "txt_ccnet_ppl_buckets",
    "ev_frequent_trigrams",
    "tok_fertility_by_lang",
    "gr_hits_supply_graph",
    "ev_did_estimate",
    "emb_grid_outliers",
    "txt_boilerplate_lines",
    "emb_silhouette_by_cluster",
    "sql_lateral_topn_orders",
    "pipe_source_scorecard",
    "gr_triangle_total_degree_oriented",
    "sk_cms_join_size_estimate",
    "samp_length_matched",
    "txt_trigram_coverage_curve",
    "ts_stl_daily_revenue",
    "dq_profile_drift",
    "ev_ab_power_analysis",
    "ts_stl_residual_anomalies",
    "gr_community_conductance",
    "ev_sprt_monitor",
    "gr_partition_modularity",
    "sim_pq_distortion",
    "sql_recursive_reachability",
    "opt_equidepth_histogram",
    "hist_equidepth_price",
    "dd_line_dedup_stats",
    "txt_kneser_ney_logprob",
    "txt_heldout_perplexity",
    "txt_textrank_keywords",
    "txt_skipgram_pmi",
    "sim_hard_negative_mining",
    "sim_hard_negatives",
    "sim_binary_hamming_recall",
    "zo_zonemap_extents",
    "tok_bpe_merges",
    "tok_bpe_compression",
    "ml_logreg_gd_path",
    "ml_logreg_learning_curve",
    "eval_decile_lift",
    "ev_cuped_variance_reduction",
    "uv_part_measures_long",
    "stat_qty_line_corr",
    "pe_embedding_dim_means",
    "ns_status_nullsafe_join",
    "fn_scalar_lab",
    "fn_date_lab",
    "agg_segments_per_nation",
    "stat_price_qty_regression",
    "ev_top_event_types",
    "ev_json_props_stats",
    "ev_daily_activity",
    "ev_user_profiles",
    "ev_props_struct_extract",
    "ev_variant_props_percentiles",
    "pivot_status_by_priority",
    "hist_order_value_buckets",
    "qa_price_outliers_iqr",
    "stat_bootstrap_mean_ci",
    "stat_weighted_median_len",
    "sla_ship_leadtime",
    "dd_winnow_fingerprints",
    "txt_fingerprints",
    "samp_docs_upsample_by_tier",
    "pack_length_buckets",
    "pii_summary_by_segment",
    "feat_user_activity_matrix",
    "feat_order_value_woe",
    "feat_target_encoding_loo",
    "feat_next_event_sequences",
    "pipe_curation_funnel",
    "samp_kfold_assign",
    "samp_mix_waterfill",
    "dd_quality_survivors",
    "txt_bpe_token_stats",
    "txt_length_histogram",
    "emb_cluster_profile",
    "sim_ivf_incremental_assign",
    "ev_cohort_ltv",
    "ev_interarrival_stats",
    "ev_time_to_convert",
    "cust_survival_km",
    "ev_stickiness_dau_mau",
    "ev_pareto_user_share",
    "snap_orders_diff",
    "ev_daily_bounce_rate",
    "ev_markov_path_likelihood",
    "eval_classifier_calibration",
    "gr_two_hop_features",
    "gr_edge_churn",
    "gr_clustering_coefficient",
    "gr_common_neighbor_links",
    "gr_neighbor_jaccard",
    "gr_kcore_decomposition",
    "er_party_entities",
    "mon_daily_volume_anomaly",
    "mon_source_freshness",
    "mon_category_drift_tvd",
    "mon_token_js_divergence",
    "stat_mann_kendall_trend",
    "stat_theil_sen_slope",
    "stat_ks_two_sample",
    "stat_chi2_segment_priority",
    "stat_winsorized_order_value",
    "txt_lexical_diversity",
    "txt_token_burstiness",
    "dq_l_diversity",
    "ts_dow_seasonality",
    "ts_rolling_view_purchase_corr",
    "ts_holt_linear",
    "ts_acf_daily_revenue",
    "ts_cusum_changepoint",
    "emb_random_projection",
    "mon_embedding_drift_psi",
    "emb_int8_quantize",
    "sim_abtt_recall",
    "sim_ivf_knn",
    "sim_rerank_maxsim",
    "sim_rerank_agreement",
    "sk_hll_users_by_event",
    "mm_frame_sample",
    "sk_join_key_skew_report",
    "dd_cross_source_matrix",
    "sk_approx_event_profile",
    "sk_approx_order_quantiles",
)


def _driver_hashed() -> frozenset[str]:
    """Names already value-checked by a driver CORRECTNESS_r*.json record.

    Read fresh on every ordering call (the files are tiny) so the
    rotation self-advances: the round-N driver run lands a new file,
    and from that moment the round-N+1 window automatically leads with
    the remaining never-hashed names — no manual _PRIORITY rewrite per
    round, no stale-window round like r5->r6. Outside a repo checkout
    (no CORRECTNESS files found) this returns empty and the static
    _PRIORITY order applies unchanged.

    POST-FREEZE REGISTRATION POLICY (r7 verdict #7, binding from the
    round the never-hashed debt reaches zero, expected r9): net-new
    query registration per round must never exceed what one driver
    window hashes (<= 50 net-new names per round). New names enter the
    front of the rotation automatically (they are never-hashed), so
    respecting the cap guarantees every registered query gets its
    driver hash within one round of landing and the debt can never
    re-accumulate. Until the debt clears, registration stays frozen
    (r6 verdict #1).
    """
    root = Path(__file__).resolve().parents[1]
    names: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            names |= set(json.loads(f.read_text()))
        except (OSError, ValueError):
            continue
    return frozenset(names)


def _ordered(mapping: dict[str, object]) -> dict:
    hashed = _driver_hashed()
    priority = [k for k in _PRIORITY if k in mapping]
    rest = [k for k in mapping if k not in set(priority)]
    fresh = [k for k in priority + rest if k not in hashed]
    seen = [k for k in priority + rest if k in hashed]
    return {k: mapping[k] for k in fresh + seen}


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
