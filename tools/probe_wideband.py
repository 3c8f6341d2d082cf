"""Round-15 probe: name the cause of the three wide per-row spreads in
the round-14 interleaved band draw (verdict item 2).

`vec_pca_power` (band 2.82-10.02 s), `graph_mst` (4.31-13.53) and
`pipeline_pretrain_report` (4.73-9.97) each had one pass read 2-3x their
median INSIDE one GC-disciplined 3-pass draw. Candidate causes named by
the judge: ContextCleaner lag reclaiming localCheckpoint blocks
mid-pass, or a straggler-task floor.

This tool reruns the full HEADLINE interleaved draw (same protocol as
gen_baseline_bands: one warm-up pass, N timed round-robin passes,
Python+JVM GC before every run) and, around EVERY timed run, records:

- in-run JVM GC time/count (GarbageCollectorMXBean deltas): a
  stop-the-world collection landing inside the timed window shows up
  here 1:1;
- RDD storage state before (post-GC) and after the run (numRdds,
  memory used): dead localCheckpoint blocks the ContextCleaner has not
  yet reclaimed show as a pre-run residue that grows across passes;
- the wall cost of the pre-run collect_garbage itself (outside the
  timed window) — where the reclaim is supposed to happen.

Output: one JSON line per timed run to stdout (pipe to a file), plus a
per-query summary table on stderr for the three target rows.

Usage: python -m tools.probe_wideband [-n PASSES]   (default 3)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

TARGETS = ("vec_pca_power", "graph_mst", "pipeline_pretrain_report")


def main() -> None:
    n_passes = 3
    args = sys.argv[1:]
    it = iter(args)
    for a in it:
        if a == "-n":
            n_passes = int(next(it))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import HEADLINE

    from spark_ml_helper_spark.benchlib import make_runners
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
    from spark_ml_helper_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="smhs-probe-wideband", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc.sc()

    def gc_stats() -> tuple[int, int]:
        """(total GC ms, total GC count) across all collector beans."""
        ms = n = 0
        for bean in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans():
            ms += max(bean.getCollectionTime(), 0)
            n += max(bean.getCollectionCount(), 0)
        return ms, n

    def storage_stats() -> tuple[int, int]:
        """(cached RDD count, total storage memory used in bytes)."""
        infos = jsc.getRDDStorageInfo()
        return len(infos), sum(i.memSize() for i in infos)

    def materialize(name: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runners = make_runners(spark, HEADLINE, materialize)

    for name in HEADLINE:  # warm-up pass (protocol 2d)
        runners[name]()

    records: list[dict] = []
    for p in range(n_passes):
        for name in HEADLINE:
            t0 = time.perf_counter()
            gc.collect()
            jvm.System.gc()
            t_cg = time.perf_counter() - t0
            n_rdd0, mem0 = storage_stats()
            gms0, gcount0 = gc_stats()
            t0 = time.perf_counter()
            runners[name]()
            wall = time.perf_counter() - t0
            gms1, gcount1 = gc_stats()
            n_rdd1, mem1 = storage_stats()
            rec = {
                "pass": p,
                "query": name,
                "wall_s": round(wall, 3),
                "pregc_s": round(t_cg, 3),
                "inrun_gc_ms": gms1 - gms0,
                "inrun_gc_count": gcount1 - gcount0,
                "rdds_pre": n_rdd0,
                "mem_pre_mb": round(mem0 / 1e6, 1),
                "rdds_post": n_rdd1,
                "mem_post_mb": round(mem1 / 1e6, 1),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    print("\nper-query summary (all rows):", file=sys.stderr)
    for name in HEADLINE:
        rs = [r for r in records if r["query"] == name]
        walls = [r["wall_s"] for r in rs]
        med = statistics.median(walls)
        hot = max(rs, key=lambda r: r["wall_s"])
        flag = " <== TARGET" if name in TARGETS else ""
        if max(walls) > 1.5 * med or flag:
            print(
                f"{name:28s} walls={['%.2f' % w for w in walls]} "
                f"max/med={max(walls) / med:.2f} "
                f"hot-pass: gc={hot['inrun_gc_ms']}ms/{hot['inrun_gc_count']} "
                f"rdds_pre={hot['rdds_pre']} mem_pre={hot['mem_pre_mb']}MB"
                f"{flag}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
