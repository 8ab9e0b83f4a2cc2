"""Cache-lifecycle contract (r7 ADVICE, closed r9): query builders
persist shared subtrees and never unpersist — the consumer drops them
via registry.cache_scope. These pin that the helper actually restores
a cache-free session, including on the exception path."""

from __future__ import annotations

import pytest

from scalable_data_ingestion_spark import registry

registry.load_all()


def _n_cached(spark) -> int:
    jsc = spark._jsparkSession.sharedState().cacheManager()
    return 0 if jsc.isEmpty() else 1  # isEmpty is the only stable probe


def test_cache_scope_drops_builder_caches(spark, sf_dir):
    spark.catalog.clearCache()
    with registry.cache_scope(spark):
        # dd_minhash_lsh_pairs caches shingles + signatures at build.
        df = registry.QUERIES["dd_minhash_lsh_pairs"](spark, sf_dir)
        df.count()
        assert _n_cached(spark) == 1  # builder caches live inside scope
    assert _n_cached(spark) == 0  # and are gone on exit


def test_cache_scope_clears_on_exception(spark, sf_dir, monkeypatch):
    from scalable_data_ingestion_spark.operators import prefixjoin

    spark.catalog.clearCache()
    monkeypatch.setattr(prefixjoin, "PJ_CANDIDATE_CAP", 1)
    with pytest.raises(RuntimeError):
        with registry.cache_scope(spark):
            # Trips the candidate-budget guard AFTER caching shingles.
            registry.QUERIES["dd_prefix_jaccard_pairs"](spark, sf_dir)
    assert _n_cached(spark) == 0
