"""Semantic checks for the curation (repetition/PII) and clustering
(k-means/SemDeDup) operators — properties the DuckDB oracle parity
sweep can't express (it only proves Spark == DuckDB, not that either
does the right thing)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from scalable_data_ingestion_spark.operators.clustering import (
    K,
    emb_kmeans_assign,
    emb_semdedup_keep,
)
from scalable_data_ingestion_spark.operators.curation import (
    EMAIL_RE,
    PHONE_RE,
    pii_scrub_contacts,
    txt_repetition_stats,
)


def test_repetition_fractions_bounded_and_varied(spark, sf_dir):
    rows = txt_repetition_stats(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.dup_token_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        # a doc's most-frequent bigram can't be rarer than uniform
        # (1e-6 absorbs the 6-dp output rounding)
        assert r.top_bigram_frac >= 1.0 / max(r.n_tokens - 1, 1) - 1e-6
    flags = {r.repetition_flag for r in rows}
    assert flags <= {"ok", "repetitive"}


def test_pii_redaction_removes_every_match(spark, sf_dir):
    rows = pii_scrub_contacts(spark, sf_dir).collect()
    assert len(rows) > 0
    email = re.compile(EMAIL_RE)
    phone = re.compile(PHONE_RE)
    n_pii = 0
    for r in rows:
        assert not email.search(r.redacted_blob), r.redacted_blob
        assert not phone.search(r.redacted_blob), r.redacted_blob
        if r.has_pii:
            n_pii += 1
            assert r.emails_found == 1 and r.phones_found == 1
            assert "[EMAIL]" in r.redacted_blob and "[PHONE]" in r.redacted_blob
        else:
            assert r.c_custkey % 3 == 0
    # every third customer has no contact info; the rest all do
    assert n_pii == sum(1 for r in rows if r.c_custkey % 3 != 0)


def test_kmeans_assignment_is_total_and_uses_k_clusters(spark, sf_dir):
    rows = emb_kmeans_assign(spark, sf_dir).collect()
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    clusters = {r.cluster_id for r in rows}
    assert clusters <= set(range(K))
    assert len(clusters) >= 2  # degenerate single-cluster = broken seeding
    for r in rows:
        assert r.sq_dist >= 0.0


def test_semdedup_drops_planted_neardups_keeps_originals(spark, sf_dir):
    rows = emb_semdedup_keep(spark, sf_dir).collect()
    by_id = {r.vec_id: r for r in rows}
    planted = [r for r in rows if r.vec_id >= 1_000_000]
    assert planted, "augmented corpus should contain planted near-dups"
    for r in planted:
        base = by_id[r.vec_id - 1_000_000]
        # planted copy sits in the same cluster as its source and is
        # dropped in favor of the (lower-id) original
        assert r.cluster_id == base.cluster_id
        assert not r.keep
        assert base.keep
