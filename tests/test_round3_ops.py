"""Round-3 operator plan-shape gates: winnowing, DSIR, MaxSim, LPA.

Value correctness for all four families is covered by the automatic
oracle sweep (tests/test_oracle_parity.py); these tests pin the
physical properties that make them scale.
"""

from __future__ import annotations

import contextlib
import io

from scalable_data_ingestion_spark import registry
from scalable_data_ingestion_spark.operators.winnow import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)

registry.load_all()


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_winnow_extraction_is_narrow(spark, sf_dir):
    # Fingerprint selection happens inside one row-local array pipeline:
    # no Exchange (shuffle) and no Window in the extraction plan.
    p = plan(winnow_fingerprints(spark, sf_dir))
    assert "Exchange" not in p
    assert "Window" not in p


def test_winnow_guarantee_on_injected_copies(spark, sf_dir):
    # Winnowing guarantees a shared fingerprint for any shared substring
    # of length >= k + w - 1. The injected truncated copies share a
    # 200-char prefix, so every one of them must surface as a pair.
    rows = registry.QUERIES["dd_winnow_match_pairs"](spark, sf_dir).collect()
    assert WINNOW_K + WINNOW_W - 1 <= 200
    found = {(r.doc_a, r.doc_b) for r in rows}
    docs = registry.QUERIES["dd_winnow_fingerprints"](spark, sf_dir).select(
        "doc_id"
    )
    injected = sorted(
        r.doc_id for r in docs.collect() if r.doc_id >= 1000000
    )
    assert injected, "corpus injection produced no truncated copies"
    for dup in injected:
        assert (dup - 1000000, dup) in found, f"missing pair for {dup}"


def test_dsir_weight_join_broadcasts(spark, sf_dir):
    # The 256-row bucket weight table must broadcast; the corpus side
    # must never shuffle on the bucket key.
    p = plan(registry.QUERIES["samp_dsir_weights"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_maxsim_query_side_broadcasts(spark, sf_dir):
    # Query sub-vectors broadcast to the corpus scan — the corpus is
    # never shuffled for the join itself.
    p = plan(registry.QUERIES["sim_maxsim_multivector"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_lpa_winner_avoids_rank_window(spark, sf_dir):
    # Winner selection is a min_by aggregate, not a row_number window —
    # one shuffle per round instead of two. The only Window in the plan
    # is the final community-size count.
    df = registry.QUERIES["gr_label_propagation"](spark, sf_dir)
    p = plan(df)
    assert "row_number" not in p
    assert "min_by" in p or "SortAggregate" in p or "ObjectHashAggregate" in p


def test_lpa_labels_are_fixpoint_consistent(spark, sf_dir):
    # Every emitted community label must itself be a node of the graph,
    # and community_size must sum back to the node count.
    rows = registry.QUERIES["gr_label_propagation"](spark, sf_dir).collect()
    nodes = {r.part_id for r in rows}
    assert {r.community for r in rows} <= nodes
    from collections import Counter

    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert r.community_size == sizes[r.community]


def test_gopher_rules_is_scan_project(spark, sf_dir):
    # One scan, no shuffle, no UDF: the whole rule stack is a single
    # narrow projection.
    p = plan(registry.QUERIES["txt_gopher_rules"](spark, sf_dir))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p


def test_gopher_keep_is_rule_conjunction(spark, sf_dir):
    rows = registry.QUERIES["txt_gopher_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keep == (
            r.pass_word_count
            and r.pass_mean_word_len
            and r.pass_symbol_ratio
            and r.pass_alpha_frac
            and r.pass_stopwords
        )


def test_rerank_stays_within_candidates(spark, sf_dir):
    # Every re-ranked hit must come from the cosine shortlist, and both
    # ranks must be within their bounds.
    from scalable_data_ingestion_spark.operators.multivector import (
        MV_CAND_K,
        MV_RERANK_K,
    )

    rows = registry.QUERIES["sim_rerank_maxsim"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rerank <= MV_RERANK_K
        assert 1 <= r.cand_rank <= MV_CAND_K


def test_gumbel_topk_is_subset_ordered(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.reweight import DSIR_SAMPLE_K

    rows = registry.QUERIES["samp_dsir_gumbel_topk"](spark, sf_dir).collect()
    assert len(rows) == min(DSIR_SAMPLE_K, 500)
    keys = [r.gumbel_key for r in sorted(rows, key=lambda r: r.rank)]
    assert keys == sorted(keys, reverse=True)
