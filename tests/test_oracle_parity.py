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


def test_coverage_doc_totals_match_registry():
    """COVERAGE.md's header totals must equal the live registry counts.

    Round-6 verdict flagged doc drift (header said 263 while the registry
    held 431); this assertion makes the drift impossible to recommit.
    """
    import pathlib
    import re

    text = pathlib.Path(__file__).resolve().parents[1].joinpath("COVERAGE.md").read_text()
    m = re.search(
        r"Current totals: (\d+) registered queries, (\d+) with DuckDB oracle twins",
        text,
    )
    assert m, "COVERAGE.md header totals line missing or reformatted"
    assert int(m.group(1)) == len(registry.queries())
    assert int(m.group(2)) == len(registry.oracles())


def test_priority_rotation_all_unhashed():
    """registry._PRIORITY must contain only queries with no driver hash yet.

    The driver's CORRECTNESS window checks the first 50 registered names;
    keeping _PRIORITY = the never-hashed set guarantees each round burns
    maximum rotation debt (r6 verdict item #1).
    """
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    hashed: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        hashed |= set(json.loads(f.read_text()))
    qs = registry.queries()
    stale = [k for k in registry._PRIORITY if k in hashed]
    missing = [k for k in registry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    # _ordered() self-rotates: never-hashed _PRIORITY names float ahead
    # of already-hashed ones on every call, so the driver window must be
    # first-timers for as long as any remain — across rounds, with no
    # manual tuple rewrite. `stale` entries are fine (they become hashed
    # when the driver lands a new CORRECTNESS file); a window that still
    # leads with a hashed name while unhashed ones exist is the bug.
    window = list(qs)[:50]
    unhashed_total = [k for k in qs if k not in hashed]
    expect_fresh = min(50, len(unhashed_total))
    fresh_in_window = [k for k in window if k not in hashed]
    assert len(fresh_in_window) == expect_fresh, (
        f"driver window has {len(fresh_in_window)} first-timers, expected "
        f"{expect_fresh}; stale heads: {stale[:10]}"
    )
