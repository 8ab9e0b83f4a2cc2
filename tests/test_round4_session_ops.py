"""Plan/property gates for the retrieval, prefix-join, HLL, AUC, and
attribution operators. Value correctness is covered by the automatic
oracle sweep (tests/test_oracle_parity.py); these pin the structural
properties that make the operators right at scale.
"""

from __future__ import annotations

import contextlib
import io

from scalable_data_ingestion_spark import registry

registry.load_all()


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_prefix_join_equals_exhaustive_join(spark, sf_dir):
    # The AllPairs guarantee: prefix filtering drops NO qualifying pair,
    # so the output is identical to the full inverted-index join at the
    # same threshold.
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry.QUERIES["dd_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry.QUERIES["dd_prefix_jaccard_pairs"](spark, sf_dir).collect()
    }
    assert pref == full


def test_bm25_plan_is_jvm_side_and_broadcasts_dims(spark, sf_dir):
    p = plan(registry.QUERIES["txt_bm25_topk"](spark, sf_dir))
    assert "BatchEvalPython" not in p
    # df / corpus-stats relations ride as broadcast joins.
    assert "BroadcastExchange" in p


def test_bm25_scores_ordered_and_bounded(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.retrieval import BM25_TOPK

    rows = registry.QUERIES["txt_bm25_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    by_rank = sorted(rows, key=lambda r: r.rank)
    scores = [r.bm25_score for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)  # Lucene idf is non-negative


def test_hll_register_file_consistency(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.sketches import HLL_M

    row = registry.QUERIES["sk_hll_user_estimate"](spark, sf_dir).collect()[0]
    assert row.m == HLL_M
    assert 0 <= row.n_zero_registers <= HLL_M
    # standard HLL error is ~1.04/sqrt(m) (~6.5% at m=256); allow 4 sigma.
    assert abs(row.rel_err) < 4 * 1.04 / (HLL_M ** 0.5)


def test_auc_is_a_valid_probability(spark, sf_dir):
    row = registry.QUERIES["eval_classifier_auc"](spark, sf_dir).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0 <= row.u2 <= 2 * row.n_pos * row.n_neg
    assert 0.0 <= row.auc <= 1.0


def test_attribution_credit_conservation(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.analytics import (
        ATTR_MICRO,
        ATTR_TOUCH_TYPES,
    )

    rows = registry.QUERIES["ev_attribution_linear"](spark, sf_dir).collect()
    assert rows
    assert {r.event_type for r in rows} <= set(ATTR_TOUCH_TYPES)
    # Each credited purchase distributes at most ATTR_MICRO in total
    # (DIV truncation can only lose micro-credits, never create them).
    purchases = {r.event_type: r.n_purchases for r in rows}
    total_micro = sum(r.credit_micro_total for r in rows)
    assert total_micro <= ATTR_MICRO * max(purchases.values()) * len(rows)
