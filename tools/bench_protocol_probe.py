"""Bench-protocol probe: why do some queries' IN-SEQUENCE warm times
(bench.py, the driver's number of record) exceed their STANDALONE warm
times (tools/sfx10_bench.py protocol) by far more than cache effects
explain? (r7 verdict #3: stat_poisson_bootstrap_ci 3.97 s in-sequence
vs 0.29 s standalone at the same SF = 13x.)

Protocol: replicate bench.py exactly (same session factory, same
sf0.001 codegen warmup, same cold+warm+clearCache loop over
ALL_HEADLINE at the target SF), but additionally record per query:

- build_s   — DataFrame CONSTRUCTION time (driver/Py4J only; eager
              builders like the k-means family run training jobs here)
- cold_s / warm_s — the two timed executions, as bench.py measures
- gc_ms     — JVM GC time accumulated during (build + cold + warm)
- heap_mb   — JVM heap in use after the query's clearCache

and, BEFORE the sequence starts (same fresh session, right after the
codegen warmup — i.e. identical JIT/codegen state), a "fresh-position"
cold+warm measurement of the probe TARGETS. fresh-warm vs in-sequence
warm on identical plans isolates pure sequence-position effects (GC
pressure, heap occupancy, accumulated JVM state) from plan effects.

Writes /tmp/bench_probe.json and prints a summary table.
Run serialized on a quiet host (memory: concurrent Spark sessions
inflate warm numbers 30-100%).

Round-8 findings from the one recorded run (vs the same-day plain
bench.py run): median per-query ratio 1.08 (host drift); GC total 12 s
across the 246-query sequence; heap plateaus ~2.4 GB of 8 GB; the five
probe targets measured fresh-position ≈ in-sequence (e.g. bootstrap CI
1.86 vs 1.88 s) — NO material position effect in the driver protocol.
CAVEAT: this harness itself inflated BUILD time ~10x on a handful of
queries that execute driver-side jobs during DataFrame construction
(iterative fixed-point loops, ranking-offset collects): e.g.
stat_quantile_trend_grid 19 s here vs 1.55 s in the same-day plain
bench.py. Unexplained harness artifact — trust plain bench.py for
absolute numbers; use this tool only for decomposition/GC/heap shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "stat_poisson_bootstrap_ci",
    "ml_kmeans_elbow",
    "dd_prefix_jaccard_pairs",
    "dd_capture_recapture",
    "tok_bpe_compression",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench  # repo-root bench.py: the sequence definition of record
    from scalable_data_ingestion_spark import registry
    from scalable_data_ingestion_spark.session import get_spark

    spark = get_spark("bench-protocol-probe")
    jvm = spark.sparkContext._jvm
    mgmt = jvm.java.lang.management.ManagementFactory

    def gc_ms() -> int:
        total = 0
        it = mgmt.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return int(total)

    def heap_mb() -> int:
        return int(mgmt.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20))

    queries = registry.queries()

    def run(name: str) -> tuple[float, float, float]:
        """(build_s, exec_s cold-equivalent) single execution."""
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        t1 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        return round(t1 - t0, 3), round(t2 - t1, 3), round(t2 - t0, 3)

    # --- bench.py's codegen warmup, verbatim ---------------------------------
    warm_dir = "/root/testdata/sf0.001"
    t0 = time.monotonic()
    for name in bench.ALL_HEADLINE:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    warmup_s = round(time.monotonic() - t0, 1)
    print(f"warmup done in {warmup_s}s  gc={gc_ms()}ms heap={heap_mb()}MB", flush=True)

    # --- fresh-position measurement of the targets ---------------------------
    fresh: dict[str, dict] = {}
    for name in TARGETS:
        g0 = gc_ms()
        b1, c, _ = run(name)  # cold
        b2, w, _ = run(name)  # warm (inherits own cold caches, like bench)
        fresh[name] = {
            "build_cold_s": b1, "cold_s": c, "build_warm_s": b2, "warm_s": w,
            "gc_ms": gc_ms() - g0,
        }
        spark.catalog.clearCache()
        print(f"fresh {name}: cold={b1 + c:.2f} warm={b2 + w:.2f} "
              f"(build {b1}/{b2}) gc+={fresh[name]['gc_ms']}ms", flush=True)

    # --- the full bench sequence, instrumented --------------------------------
    seq: dict[str, dict] = {}
    for i, name in enumerate(bench.ALL_HEADLINE):
        g0 = gc_ms()
        b1, c, _ = run(name)
        b2, w, _ = run(name)
        spark.catalog.clearCache()
        seq[name] = {
            "pos": i, "build_cold_s": b1, "cold_s": c,
            "build_warm_s": b2, "warm_s": w,
            "gc_ms": gc_ms() - g0, "heap_mb": heap_mb(),
        }
        if name in TARGETS or b2 + w > 2.5:
            print(f"[{i + 1}/{len(bench.ALL_HEADLINE)}] {name}: "
                  f"cold={b1 + c:.2f} warm={b2 + w:.2f} (build {b1}/{b2}) "
                  f"gc+={seq[name]['gc_ms']}ms heap={seq[name]['heap_mb']}MB",
                  flush=True)

    out = {"sf_dir": sf_dir, "warmup_s": warmup_s, "fresh": fresh, "seq": seq}
    with open("/tmp/bench_probe.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    print("\n=== target summary (fresh vs in-sequence, same session) ===")
    for name in TARGETS:
        f, s = fresh[name], seq[name]
        print(f"{name}: fresh warm={f['build_warm_s'] + f['warm_s']:.2f} "
              f"(build {f['build_warm_s']}) | seq warm="
              f"{s['build_warm_s'] + s['warm_s']:.2f} (build {s['build_warm_s']}) "
              f"pos={s['pos']} gc fresh/seq={f['gc_ms']}/{s['gc_ms']}ms")


if __name__ == "__main__":
    main()
