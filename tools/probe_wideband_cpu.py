"""Round-15 probe, stage 2: discriminate WHAT the wide band-row passes
spend their excess seconds on.

Stage 1 (tools/probe_wideband) measured the full interleaved draw and
EXCLUDED the two named hypotheses for the round-14 wide rows: the >1.5x
passes carry <=0.28 s of in-run JVM GC (vs 2-7 s of excess wall) and
<=166 MB / 43 RDDs of pre-run storage residue on a 32 GB heap — neither
stop-the-world GC nor ContextCleaner/localCheckpoint lag can account for
them. The spread also has no draw-position gradient (pass totals
115.6/105.6/110.8 s; hottest-pass histogram 15/12/13), and WHICH row
goes wide is a per-draw lottery (r14: vec_pca_power/graph_mst/
pipeline_pretrain_report; stage-1 draw: graph_louvain 1.72x and
ml_gmm_em 1.52x — all from the same many-tiny-job iterative family).

This stage times the iterative family alone with three extra meters
around every run:

- JVM process CPU time (utime+stime from /proc/<jvm pid>/stat — the
  com.sun.management bean method is not reachable through Py4J's
  interface binding): flat CPU + inflated wall = the JVM was WAITING
  (scheduling stall / straggler task), not doing more work;
- /proc/stat whole-box jiffy deltas (user/system/idle/iowait/steal):
  rules external CPU theft in or out;
- in-run GC ms (as stage 1).

Usage: python -m tools.probe_wideband_cpu [-n PASSES]   (default 6)
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

ROWS = [
    "agg_group",            # cheap sentinel (control)
    "dedup_simhash",        # heavy sentinel (control)
    "vec_pca_power",
    "graph_louvain",
    "ml_gmm_em",
    "pipeline_pretrain_report",
    "graph_mst",
]


def read_proc_stat() -> dict:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return dict(zip(keys, map(int, parts[1 : 1 + len(keys)])))


def main() -> None:
    n_passes = 6
    args = sys.argv[1:]
    it = iter(args)
    for a in it:
        if a == "-n":
            n_passes = int(next(it))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from spark_ml_helper_spark.benchlib import make_runners
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-probe-wideband-cpu", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    jvm_pid = jvm.java.lang.ProcessHandle.current().pid()
    clk = os.sysconf("SC_CLK_TCK")

    def jvm_cpu_s() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        # fields after comm: state is parts[0]; utime/stime are 14/15
        # in the 1-based full layout = parts[11]/parts[12] here
        return (int(parts[11]) + int(parts[12])) / clk

    def gc_ms() -> int:
        return sum(
            max(b.getCollectionTime(), 0)
            for b in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        )

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runners = make_runners(spark, ROWS, materialize)
    for name in ROWS:
        runners[name]()

    records = []
    for p in range(n_passes):
        for name in ROWS:
            gc.collect()
            jvm.System.gc()
            g0 = gc_ms()
            cpu0 = jvm_cpu_s()
            st0 = read_proc_stat()
            t0 = time.perf_counter()
            runners[name]()
            wall = time.perf_counter() - t0
            st1 = read_proc_stat()
            cpu1 = jvm_cpu_s()
            g1 = gc_ms()
            dstat = {k: st1[k] - st0[k] for k in st0}
            total_j = sum(dstat.values()) or 1
            rec = {
                "pass": p,
                "query": name,
                "wall_s": round(wall, 3),
                "jvm_cpu_s": round(cpu1 - cpu0, 2),
                "inrun_gc_ms": g1 - g0,
                "box_busy_pct": round(100 * (1 - (dstat["idle"] + dstat["iowait"]) / total_j), 1),
                "box_steal_pct": round(100 * dstat["steal"] / total_j, 2),
                "box_iowait_pct": round(100 * dstat["iowait"] / total_j, 1),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    print("\nsummary:", file=sys.stderr)
    for name in ROWS:
        rs = [r for r in records if r["query"] == name]
        walls = [r["wall_s"] for r in rs]
        med = statistics.median(walls)
        hot = max(rs, key=lambda r: r["wall_s"])
        cold = min(rs, key=lambda r: r["wall_s"])
        print(
            f"{name:26s} med={med:.2f} max/med={max(walls) / med:.2f} | "
            f"hot: wall={hot['wall_s']:.2f} cpu={hot['jvm_cpu_s']:.1f} "
            f"gc={hot['inrun_gc_ms']}ms busy={hot['box_busy_pct']}% "
            f"steal={hot['box_steal_pct']}% | "
            f"cold: wall={cold['wall_s']:.2f} cpu={cold['jvm_cpu_s']:.1f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
