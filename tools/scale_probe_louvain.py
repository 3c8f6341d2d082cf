"""Louvain scale probe (SCALE.md evidence for graph_louvain_multilevel).

Replicates the customer-supplier co-occurrence graph as KEY-SHIFTED
DISJOINT copies (the graph_triangles probe technique): orders/lineitem
are cross-joined with a replica index k and every graph key is shifted
by a per-copy stride, so a factor-N corpus is N independent copies of
the base graph — community structure, degrees, and round counts are
identical per copy, which makes growth attributable to DATA VOLUME
alone. Strides keep the bipartite node encoding intact: customers stay
below _CC_SUPP_OFFSET (custkey <= 1500 at the sf0.01 base, stride 9000,
max 892.5k < 1e6 at 100 copies) and suppliers above it.

Two cells per scale, each in its OWN SUBPROCESS with a fresh session
(the bench_isolated discipline — long-lived probe sessions skew later
cells 2-3x):

- phase1: graph_louvain — 3 alternating-side local-move rounds, every
  stage corpus-shaped (the part that must scale).
- both:   graph_louvain_multilevel — phase 1 PLUS the contraction
  groupBy and 2 weighted local-move rounds on the supergraph.

The claim under test: the contracted graph has |communities| nodes, so
phase 2 adds one corpus-shaped shuffle (the contraction) and otherwise
broadcast-sized work — (both - phase1) should stay a small, roughly
flat increment across decades while phase 1 grows with the corpus.

Usage:  python -m tools.scale_probe_louvain [factor]    (default 100)
Base tables: SPARK_GRAFT_PROBE_BASE (default /root/testdata/sf0.01).
Prints one JSON line per (cell, scale).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CUST_STRIDE = 9_000  # * 100 copies + max custkey 1500 stays < 1e6 offset
SUPP_STRIDE = 5_000
ORDER_STRIDE = 10_000_000
N_RUNS = 3


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    from spark_ml_helper_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smhs-scale-probe-louvain")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _ensure_replicated(spark, base_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "lineitem.parquet", "_SUCCESS")):
        return
    reps = spark.range(factor).withColumnRenamed("id", "k")
    orders = (
        spark.read.parquet(f"{base_dir}/orders.parquet")
        .crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("k") * ORDER_STRIDE)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("k") * CUST_STRIDE)
        .drop("k")
        .repartition(32)
    )
    lineitem = (
        spark.read.parquet(f"{base_dir}/lineitem.parquet")
        .crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("k") * ORDER_STRIDE)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("k") * SUPP_STRIDE)
        .drop("k")
        .repartition(32)
    )
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    lineitem.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def _single(cell: str, sf_dir: str, scale: int) -> None:
    from spark_ml_helper_spark.operators.graph import (
        graph_louvain,
        graph_louvain_multilevel,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fn = graph_louvain if cell == "phase1" else graph_louvain_multilevel

    def run() -> tuple[int, int]:
        df = fn(spark, sf_dir)
        comms = df.select("community").distinct().count()
        return df.count(), comms

    rows, comms = run()  # warm-up (cold JVM, file listing)
    runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        rows, comms = run()
        runs.append(round(time.time() - t0, 2))
    runs_sorted = sorted(runs)
    print(
        "PROBE "
        + json.dumps(
            {
                "cell": cell,
                "scale": scale,
                "nodes": rows,
                "communities": comms,
                "runs": runs,
                "best": runs_sorted[0],
                "median": runs_sorted[len(runs) // 2],
            }
        ),
        flush=True,
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        _single(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    # custkey stride invariant: max base custkey (1500 at the sf0.01 base)
    # + (factor-1)*CUST_STRIDE must stay below the 1e6 supplier offset or
    # customer/supplier node ids silently collide
    if factor * CUST_STRIDE >= 1_000_000:
        raise SystemExit(f"factor {factor} breaks the < 1e6 custkey invariant")
    base_dir = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.01")

    scales = [(base_dir, 1)]
    for f in (factor // 10, factor):
        if f > 1:
            probe_dir = f"/tmp/smhs_probe_louvain_{f}x"
            spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            spark.sparkContext.setLogLevel("ERROR")
            _ensure_replicated(spark, base_dir, f, probe_dir)
            spark.stop()
            scales.append((probe_dir, f))

    for sf_dir, scale in scales:
        for cell in ["phase1", "both"]:
            out = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "tools.scale_probe_louvain",
                    "--single",
                    cell,
                    sf_dir,
                    str(scale),
                ],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for line in out.stdout.splitlines():
                if line.startswith("PROBE "):
                    print(line, flush=True)
            if out.returncode != 0:
                print(
                    json.dumps({"cell": cell, "scale": scale, "error": out.stderr[-500:]}),
                    flush=True,
                )


if __name__ == "__main__":
    main()
