"""Capture .explain("formatted") for registered queries into plans/r10/.

Usage:
    python tools/opt_explain.py name1 name2 ... [--suffix before|after]
        [--sf /root/testdata/sf0.1] [--outdir plans/r10]

Note: queries with eager builders (k-means family, warehouse writes)
run real Spark jobs during plan construction; that is expected.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_data_ingestion_spark import registry  # noqa: E402
from scalable_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--outdir", default="plans/r10")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark("sdi-opt-explain")
    queries = registry.queries()
    for name in args.names:
        df = queries[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count("MapInPandas")
        print(f"{name:40s} -> {path}  Exchange={n_exch} PyNodes={n_py}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
