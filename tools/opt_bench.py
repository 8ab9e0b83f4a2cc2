"""Round-10 optimization subset bench.

Times a named subset of registered queries under bench.py's EXACT
protocol (sf0.001 codegen warmup pass, then cold+warm noop-sink pairs
at the target SF with clearCache between queries) so a single query's
before/after can be measured in ~seconds instead of a full 13-minute
bench run. Numbers are bench-comparable by construction; still run the
full bench.py for the record at round close.

Usage:
    python tools/opt_bench.py name1 name2 ... [--sf /root/testdata/sf0.1]
        [--runs 1] [--json /tmp/opt_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_data_ingestion_spark import registry  # noqa: E402
from scalable_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1, help="cold+warm pairs per query")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("sdi-opt-bench")
    queries = registry.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in args.names:
            run(name, warm_dir)
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in args.names:
        colds, warms = [], []
        for _ in range(args.runs):
            colds.append(round(run(name, args.sf), 3))
            warms.append(round(run(name, args.sf), 3))
            spark.catalog.clearCache()
        out[name] = {"cold": colds, "warm": warms}
        print(f"{name:40s} cold={colds} warm={warms}", flush=True)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    total_warm = round(sum(min(v["warm"]) for v in out.values()), 3)
    print(json.dumps({"total_warm_min": total_warm, "n": len(out)}))


if __name__ == "__main__":
    main()
