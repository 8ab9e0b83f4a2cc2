"""Spot-check named registered queries against their DuckDB oracles.

Usage: python tools/check_queries.py [--sf DIR] name [name ...]
Runs the same comparison as tests/test_oracle_parity.py but for an
explicit subset — the fast feedback loop while developing an operator.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from oracle_utils import assert_query_matches_oracle  # noqa: E402

from scalable_data_ingestion_spark import registry  # noqa: E402
from scalable_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    queries = registry.queries()
    oracles = registry.oracles()
    spark = get_spark("check-queries")
    failed = []
    for name in args.names:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            assert_query_matches_oracle(
                spark, name, queries[name], oracles[name], args.sf
            )
            print(f"{name}: OK ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAIL ({time.time() - t0:.1f}s) {exc}")
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
