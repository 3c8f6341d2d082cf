"""Isolated warm re-measurement of individual headline queries.

The bench-drift protocol (BASELINE.md round-4 source_json_col
precedent): when a query's in-bench number drifts >1.25x round-over-
round, re-measure it ALONE on an idle box — one warm-up execution, then
N timed runs — and record the isolated band next to the in-bench
numbers. A drift that disappears in isolation is global-state jitter
(JVM/page-cache/GC pressure from the 26-query bench), not a plan
change; one that persists is real and needs a plan diff.

Usage:  python -m tools.bench_isolated [-n RUNS] name [name ...]
Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per query: {"query": ..., "runs": [...], "best":
..., "median": ...}.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n_runs = 5
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-bench-isolated", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in args:
        materialize(name)  # warm-up: JIT, file listing, code cache
        runs = []
        for _ in range(n_runs):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(name)
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "runs": runs,
                    "best": min(runs),
                    "median": round(statistics.median(runs), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
