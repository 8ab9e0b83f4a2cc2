"""3-SF scaling sweep over the FULL bench headline set (VERDICT r3 #5).

Runs every headline query warm (second run) at sf0.001 / sf0.01 / sf0.1
in one JVM and writes a markdown table to stdout plus a JSON record.
Usage: python tools/scaling_sweep.py [--out /tmp/scaling.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402
from scalable_data_ingestion_spark import registry  # noqa: E402
from scalable_data_ingestion_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaling_sweep.json")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated registered query names (any query, not "
        "just the bench headline set)",
    )
    args = ap.parse_args()

    spark = get_spark("sdi-scaling-sweep")
    queries = registry.queries()
    names = args.only.split(",") if args.only else bench.ALL_HEADLINE

    def run(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    result: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        key = sf_dir.rsplit("sf", 1)[-1]
        for name in names:
            run(name, sf_dir)  # cold/codegen pass
            result.setdefault(name, {})[key] = round(run(name, sf_dir), 3)
        print(f"done {sf_dir}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print("| query | sf0.001 | sf0.01 | sf0.1 | 0.1/0.01 |")
    print("|---|---|---|---|---|")
    for name in names:
        r = result[name]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] else float("inf")
        print(
            f"| {name} | {r['0.001']} | {r['0.01']} | {r['0.1']} | {ratio:.1f}x |"
        )


if __name__ == "__main__":
    main()
