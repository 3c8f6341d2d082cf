"""Generate the BASELINE.md current-band table.

Runs every bench.py HEADLINE query in ISOLATION (one warm-up, then N
timed runs with GC between, the bench_isolated protocol) and prints a
markdown table: per-query isolated band (min-max), median, and the
watch threshold (1.5x median — an in-bench or isolated draw above it
triggers the drift protocol: re-measure alone, diff the plan only if
the isolated number also moved).

Usage: python -m tools.gen_baseline_bands [-n RUNS]   (default 3)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. Prints markdown to
stdout (pipe into BASELINE.md by hand — the table is a measurement,
reviewed before committing, not a build artifact).
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-baseline-bands", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    rows = []
    for name in HEADLINE:
        materialize(name)
        runs = []
        for _ in range(n_runs):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(name)
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        rows.append((name, min(runs), max(runs), med, 1.5 * med))
        print(
            f"| `{name}` | {min(runs):.2f}-{max(runs):.2f} | {med:.2f} "
            f"| {1.5 * med:.2f} |",
            file=sys.stderr,
            flush=True,
        )

    print(f"<!-- generated: python -m tools.gen_baseline_bands -n {n_runs}, "
          f"sf={sf_dir}, local[{cpus}] -->")
    print("| bench query | isolated band (s) | median (s) | watch ≥ (s) |")
    print("|---|---|---|---|")
    for name, lo, hi, med, watch in rows:
        print(f"| `{name}` | {lo:.2f}-{hi:.2f} | {med:.2f} | {watch:.2f} |")
    total = sum(r[3] for r in rows)
    print(f"\nMedian-sum across the {len(rows)}-query suite: {total:.1f} s.")


if __name__ == "__main__":
    main()
