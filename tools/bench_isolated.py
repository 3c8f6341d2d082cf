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

Besides registry query names, the bench.py auxiliary instruments
`sim_ann_ivfpq_probe_only` and `dedup_semantic_apply_only` are
accepted — their amortized state (trained index / cell assignment)
is built once outside the timed runs, mirroring bench.py, so an
instrument drift can be solo-adjudicated like any headline query.

Box-state SENTINEL (round-13 protocol): agg_group is timed FIRST (same
warm-up + N-run-median protocol) and its median is carried in every
output line. An adjudication compares the target's median to its band
AFTER dividing by sentinel_ratio = sentinel_here / sentinel_in_the_
band_header (BASELINE.md) — rounds 11 and 12 each burned adjudication
effort on drift that was global box temperature, visible as control
queries elevated by the same factor.

Caveat (measured round 13): the cheap sentinel over-reads scheduler/JVM
heat ~1.35x relative to heavy CPU-bound rows. Since round 14 every
line therefore ALSO carries a fixed HEAVY sentinel (dedup_simhash,
timed right after the cheap one with the same protocol): the pair
brackets the box factor — normalize a heavy target by the heavy
sentinel's band ratio, a sub-second target by the cheap one's. For the
strongest adjudication still pass same-family control queries (the
round-12/13 judge practice: the untouched siblings of the mover) —
uniform family elevation is the protocol's named box-state signature.
Run-order matters: put the TARGET LAST (round-14 measured confound —
the first query after session start reads ~1.4x hot while the box
settles; dedup_substring_remove read 2.17 first-in-list vs 1.51
last-in-list on the same tree within minutes).
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

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # bench.py's auxiliary instruments are re-measurable here too, so an
    # instrument drift can be solo-adjudicated exactly like a headline
    # query. Each builds its amortized state ONCE (outside the timed
    # runs), mirroring bench.py.
    def _make_ivfpq_probe():
        from pyspark.sql import functions as F

        from spark_ml_helper_spark.operators.vectors import (
            ivfpq_probe, train_ivfpq)
        from spark_ml_helper_spark.sources.parquet import table

        index = {k: v.localCheckpoint(eager=True)
                 for k, v in train_ivfpq(spark, sf_dir).items()}
        qs = (
            table(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") % 100 == 0)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .localCheckpoint(eager=True)
        )
        return lambda: _noop(ivfpq_probe(index, qs))

    def _make_semdedup_apply():
        from spark_ml_helper_spark.operators.vectors import (
            _km_train, semdedup_apply)

        _, _, final = _km_train(spark, sf_dir)
        final = final.localCheckpoint(eager=True)
        return lambda: _noop(semdedup_apply(final))

    INSTRUMENTS = {
        "sim_ann_ivfpq_probe_only": _make_ivfpq_probe,
        "dedup_semantic_apply_only": _make_semdedup_apply,
    }

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def timed_runs(materialize_fn, n: int) -> list:
        materialize_fn()  # warm-up: JIT, file listing, code cache
        runs = []
        for _ in range(n):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize_fn()
            runs.append(round(time.perf_counter() - t0, 3))
        return runs

    # box-state sentinel PAIR FIRST (round-13 protocol, round-14 heavy
    # addition; see module docstring): the cheap sentinel over-reads
    # scheduler heat ~1.35x vs heavy plans, so every adjudication line
    # carries BOTH — the pair brackets the box factor without needing
    # the full suite median.
    from tools.measure import HEAVY_SENTINEL_QUERY, SENTINEL_QUERY

    # throwaway SETTLE run before the cheap sentinel's timed block
    # (round-15, advisor finding): the first query after session start
    # reads ~1.4x hot while the box settles (measured round 14), and the
    # cheap sentinel used to BE that first query — its own single
    # warm-up doesn't absorb the settle, so the recorded cheap sentinel
    # carried the confound into every bracket that referenced it. One
    # untimed heavy execution burns the settle window instead.
    materialize(HEAVY_SENTINEL_QUERY)

    sentinel = round(
        statistics.median(timed_runs(lambda: materialize(SENTINEL_QUERY), n_runs)),
        3,
    )
    heavy = round(
        statistics.median(
            timed_runs(lambda: materialize(HEAVY_SENTINEL_QUERY), n_runs)
        ),
        3,
    )

    from spark_ml_helper_spark.operators.graph_bench import SYNTH_GRAPH_BENCH

    for name in args:
        if name in INSTRUMENTS:
            materialize_fn = INSTRUMENTS[name]()
        elif name in SYNTH_GRAPH_BENCH:
            # pinned synthetic fixpoint row (round 14): solo adjudication
            # measures the same loop-only quantity as bench.py / the band
            materialize_fn = SYNTH_GRAPH_BENCH[name](spark)
        else:
            materialize_fn = lambda: materialize(name)  # noqa: B023
        runs = timed_runs(materialize_fn, n_runs)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "runs": runs,
                    "best": min(runs),
                    "median": round(statistics.median(runs), 3),
                    "sentinel": {"query": SENTINEL_QUERY, "sec": sentinel},
                    "heavy_sentinel": {
                        "query": HEAVY_SENTINEL_QUERY,
                        "sec": heavy,
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
