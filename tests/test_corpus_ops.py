"""Semantic checks for the corpus operators (dupspan coverage, RAG
chunking, unigram-LM scoring), multi-probe IVF, and the sketch family —
properties the oracle sweep can't express (Spark == DuckDB doesn't
prove either side computes the right thing; sketches have no oracle at
all)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scalable_data_ingestion_spark.catalog import table
from scalable_data_ingestion_spark.operators.corpus import (
    CHUNK_S,
    CHUNK_W,
    chunk_token_windows,
    dd_dupspan_coverage,
    txt_unigram_logprob,
)
from scalable_data_ingestion_spark.operators.similarity import (
    TOP_K,
    sim_ivf_knn,
    sim_ivf_multiprobe,
    sim_knn_bruteforce,
)
from scalable_data_ingestion_spark.operators.sketches import (
    sk_approx_event_profile,
)


def test_dupspan_coverage_is_bimodal_on_planted_corpus(spark, sf_dir):
    rows = dd_dupspan_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.covered_tokens <= r.n_tokens
        assert abs(r.dup_coverage - round(r.covered_tokens / r.n_tokens, 6)) < 1e-9
        assert r.span_flag == ("duplicated" if r.dup_coverage > 0.5 else "ok")
    # the synthetic corpus has verbatim-repeat docs: both classes occur
    flags = {r.span_flag for r in rows}
    assert flags == {"ok", "duplicated"}


def test_chunks_tile_documents_with_exact_overlap(spark, sf_dir):
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, sf_dir, "documents").collect()
    }
    chunks = chunk_token_windows(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, toks in docs.items():
        cs = sorted(by_doc[doc_id], key=lambda c: c.chunk_idx)
        n = len(toks)
        expect_chunks = max(1, math.ceil((n - CHUNK_W) / CHUNK_S) + 1)
        assert [c.chunk_idx for c in cs] == list(range(expect_chunks))
        covered = set()
        for c in cs:
            start = c.chunk_idx * CHUNK_S  # 0-based
            body = toks[start : start + CHUNK_W]
            assert c.chunk_text.split() == body
            assert c.n_chunk_tokens == len(body)
            assert c.token_start == start + 1
            covered.update(range(start, start + len(body)))
        assert covered == set(range(n))  # every token in >=1 chunk


def test_unigram_logprob_matches_handrolled_model(spark, sf_dir):
    texts = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, sf_dir, "documents").collect()
    }
    counts: dict[str, int] = {}
    for toks in texts.values():
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    fx = {t: math.floor(math.log(c / total) * 1e6 + 0.5) for t, c in counts.items()}
    rows = txt_unigram_logprob(spark, sf_dir).collect()
    assert set(r.doc_id for r in rows) == set(texts)
    for r in rows:
        toks = texts[r.doc_id]
        mean = sum(fx[t] for t in toks) / (1e6 * len(toks))
        assert r.n_tokens == len(toks)
        # engines round half-away-from-zero, Python half-to-even: allow
        # one 6dp/4dp ulp of rounding slack (bit-exactness is the oracle
        # sweep's job; this test checks the model semantics)
        assert abs(r.mean_logprob - mean) < 6e-7
        assert abs(r.perplexity - math.exp(-mean)) < 6e-5
        assert r.mean_logprob < 0


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_knn_bruteforce(spark, sf_dir).collect()
    }
    one = {(r.query_id, r.neighbor_id) for r in sim_ivf_knn(spark, sf_dir).collect()}
    multi = {
        (r.query_id, r.neighbor_id) for r in sim_ivf_multiprobe(spark, sf_dir).collect()
    }
    r1 = len(one & exact) / len(exact)
    r2 = len(multi & exact) / len(exact)
    assert r2 >= r1  # extra probes can only widen the candidate set
    # label cells are a pre-sharded approximation (labels are not cosine
    # clusters in the synthetic data), so recall is modest — the learned
    # quantizer below is the real IVF and is held to a higher bar
    assert r2 >= 0.2
    # per query never more than TOP_K results
    from collections import Counter

    for _, c in Counter(q for q, _ in multi).items():
        assert c <= TOP_K


def test_kmeans_ivf_beats_label_cells(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.clustering import (
        IVF_TOP_K,
        sim_ivf_kmeans_knn,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_knn_bruteforce(spark, sf_dir).collect()
    }
    label2 = {
        (r.query_id, r.neighbor_id) for r in sim_ivf_multiprobe(spark, sf_dir).collect()
    }
    km = {
        (r.query_id, r.neighbor_id)
        for r in sim_ivf_kmeans_knn(spark, sf_dir).collect()
    }
    r_label = len(label2 & exact) / len(exact)
    r_km = len(km & exact) / len(exact)
    assert r_km >= 0.7  # measured 0.88 at sf0.001
    assert r_km > r_label  # learned cells beat arbitrary shards
    from collections import Counter

    for _, c in Counter(q for q, _ in km).items():
        assert c <= IVF_TOP_K


def test_sketches_within_error_bounds(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    rows = sk_approx_event_profile(spark, sf_dir).collect()
    assert set(r.event_type for r in rows) == set(exact)
    # round 11: the profile's distinct-count sketch is the module's own
    # deterministic 256-register md5 HLL (oracle-checkable), rsd =
    # 1.04/sqrt(256) ≈ 0.065; percentiles are exact.
    hll_rsd = 1.04 / (256 ** 0.5)
    for r in rows:
        e = exact[r.event_type]
        assert abs(r.approx_users - e.users) <= max(2.0, 5 * hll_rsd * e.users)
        assert abs(r.approx_p50 - e.p50) <= 1e-9
        assert r.approx_p50 <= r.approx_p90 <= r.approx_p99


def test_tdigest_rank_error_within_scale_function_envelope(spark, sf_dir):
    """The merged digest's estimate at p must have TRUE rank within the
    k1 envelope: widest bins at the median (~1/DELTA), narrow tails.
    Measured err at 3 SFs: p50 <= 0.027, p90 <= 0.0013, p99 <= 0.0067."""
    from scalable_data_ingestion_spark.operators.sketches import (
        TD_DELTA,
        sk_tdigest_order_values,
    )

    est = {
        r.quantile: r for r in sk_tdigest_order_values(spark, sf_dir).collect()
    }
    assert set(est) == {0.5, 0.9, 0.99}
    vals = sorted(
        r.o_totalprice
        for r in table(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    n = len(vals)
    import bisect

    bounds = {0.5: 2.0 / TD_DELTA, 0.9: 1.0 / TD_DELTA, 0.99: 0.5 / TD_DELTA}
    prev = None
    for p in (0.5, 0.9, 0.99):
        r = est[p]
        true_rank = bisect.bisect_right(vals, r.est_value) / n
        assert abs(true_rank - p) <= bounds[p], (p, true_rank)
        assert r.n_centroids <= TD_DELTA
        assert r.total_weight == n
        if prev is not None:
            assert r.est_value >= prev  # quantile estimates monotone in p
        prev = r.est_value


def test_tdigest_drift_monitor_rank_error_per_month(spark, sf_dir):
    """The digest-of-digests drift monitor (round-10): per month, the
    merged digest's p50/p90 estimates must have TRUE within-month rank
    inside the k1 envelope, and each merged digest's total weight must
    equal the month's exact row count — the digest-of-digests merge
    loses no mass."""
    import bisect
    from collections import defaultdict

    from scalable_data_ingestion_spark.operators.monitor import (
        mon_tdigest_drift_monthly,
    )
    from scalable_data_ingestion_spark.operators.sketches import TD_DELTA

    est = {
        r.month_start: r
        for r in mon_tdigest_drift_monthly(spark, sf_dir).collect()
    }
    by_month = defaultdict(list)
    for r in (
        table(spark, sf_dir, "orders")
        .select(F.trunc("o_orderdate", "month").alias("m"), "o_totalprice")
        .collect()
    ):
        by_month[r.m].append(r.o_totalprice)
    assert set(est) == set(by_month)
    bounds = {0.5: 2.0 / TD_DELTA, 0.9: 1.0 / TD_DELTA}
    for m, vals in by_month.items():
        vals.sort()
        n = len(vals)
        r = est[m]
        assert r.n_orders == n  # merge preserves total weight
        for p, col in ((0.5, r.est_p50), (0.9, r.est_p90)):
            true_rank = bisect.bisect_right(vals, col) / n
            # + 1/n: with ~15-row months at the smoke SF, rank is only
            # defined on a 1/n grid — the envelope is continuous.
            assert abs(true_rank - p) <= bounds[p] + 1.0 / n, (m, p, true_rank)
        assert r.est_p50 <= r.est_p90
