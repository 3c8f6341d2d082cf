"""Shared bench/band measurement loop (round 14).

bench.py and tools/gen_baseline_bands must sample the suite the SAME
way — one warm-up pass, then N timed ROUND-ROBIN passes with Python+JVM
GC before every run — or BENCH-vs-band comparisons re-acquire the
position-vs-box-state confound the interleaving removed (two same-day
sequential draws measured opposite-sign intra-draw gradients; see
BASELINE.md protocol 2d). Keeping the loop here makes that invariant
structural instead of copy-paste discipline across the two callers
(round-14 review finding); tools/bench_isolated deliberately keeps its
own sequential solo protocol (that is its whole point) but shares the
SYNTH_GRAPH_BENCH runner branch via make_runners' table.
"""

from __future__ import annotations

import gc
import time

from spark_ml_helper_spark.operators.graph_bench import SYNTH_GRAPH_BENCH


def make_runners(spark, names, materialize) -> dict:
    """name -> zero-arg thunk executing one full materialization.

    Synthetic fixpoint rows get their pinned inputs built and
    localCheckpoint-ed HERE, outside any timed run — the thunk times
    the loop only."""
    return {
        name: (
            SYNTH_GRAPH_BENCH[name](spark)
            if name in SYNTH_GRAPH_BENCH
            else (lambda n=name: materialize(n))
        )
        for name in names
    }


def collect_garbage(spark) -> None:
    """Python then JVM GC: drops Python-side DataFrame refs so the
    ContextCleaner can reclaim localCheckpoint blocks before the next
    timed run."""
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def run_interleaved(spark, runners: dict, order, n_passes: int) -> dict:
    """One warm-up pass (JIT, plan cache, file listing), then
    ``n_passes`` timed round-robin passes; returns {name: [sec/pass]}."""
    for name in order:
        runners[name]()
    all_runs: dict = {name: [] for name in order}
    for _ in range(n_passes):
        for name in order:
            collect_garbage(spark)
            t0 = time.perf_counter()
            runners[name]()
            all_runs[name].append(time.perf_counter() - t0)
    return all_runs
