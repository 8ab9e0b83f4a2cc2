"""Every registered query with an oracle must match DuckDB at sf0.001.

This mimics the driver's CORRECTNESS gate (run at sf0.01 there) so
regressions surface locally first.
"""

from __future__ import annotations

import pytest

from scalable_data_ingestion_spark import registry

from .oracle_utils import assert_query_matches_oracle

registry.load_all()
NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = registry.QUERIES[name]
    sql = registry.ORACLES[name]
    assert_query_matches_oracle(spark, name, fn, sql, sf_dir)


def test_every_query_has_callable(spark):
    qs = registry.queries()
    assert len(qs) >= 10
    for name, fn in qs.items():
        assert callable(fn), name
