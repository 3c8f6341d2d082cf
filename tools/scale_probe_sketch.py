"""Replayable-sketch scale probe (SCALE.md evidence for agg_hll_manual /
agg_cms_sketch / agg_bloom_filter).

Replicates customer and orders as KEY-SHIFTED DISJOINT copies (the
louvain-probe technique: custkeys shift by a stride, so a factor-N
corpus has N x the key cardinality and N x the stream mass with
per-copy structure unchanged) and runs the three sketch operators
end to end at 1x/10x/100x, each scale in its own subprocess
(bench_isolated discipline).

The claims under test, each visible in the output rows:

- HLL: the register frame stays 256 rows while true cardinality grows
  100x, and est_hll tracks n_exact within the 1.04/sqrt(m) sigma at
  every decade — accuracy is a property of m, not of the corpus.
- CMS: the cell frame stays d x w rows; the w=64 overestimate grows
  ~linearly with stream mass (eps*N additive error, the paper's bound)
  while w=2048 stays near-exact — the width dial measured.
- Bloom: with m=4096 bits FIXED while members grow 100x, the fill
  ratio saturates and the measured FPR climbs toward 1 — the sketch's
  failure mode made visible (the production response is sizing m to
  n, which the fill_ratio column shows directly).

Usage:  python -m tools.scale_probe_sketch [factor]     (default 100)
Base tables: SPARK_GRAFT_PROBE_BASE (default /root/testdata/sf0.01).
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CUST_STRIDE = 1_000_000
ORDER_STRIDE = 10_000_000
N_RUNS = 3


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    from spark_ml_helper_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smhs-scale-probe-sketch")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _ensure_replicated(spark, base_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "orders.parquet", "_SUCCESS")):
        return
    reps = spark.range(factor).withColumnRenamed("id", "k")
    cust = (
        spark.read.parquet(f"{base_dir}/customer.parquet")
        .crossJoin(F.broadcast(reps))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("k") * CUST_STRIDE)
        .drop("k")
        .repartition(32)
    )
    orders = (
        spark.read.parquet(f"{base_dir}/orders.parquet")
        .crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("k") * ORDER_STRIDE)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("k") * CUST_STRIDE)
        .drop("k")
        .repartition(32)
    )
    cust.write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def _single(op: str, sf_dir: str, scale: int) -> None:
    from spark_ml_helper_spark.operators.aggregates import (
        agg_bloom_filter,
        agg_cms_sketch,
        agg_hll_manual,
    )

    fn = {"hll": agg_hll_manual, "cms": agg_cms_sketch, "bloom": agg_bloom_filter}[op]
    spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    def run():
        return fn(spark, sf_dir).collect()

    rows = run()  # warm-up
    runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        rows = run()
        runs.append(round(time.time() - t0, 2))
    summary: dict = {"op": op, "scale": scale, "runs": runs,
                     "median": sorted(runs)[len(runs) // 2]}
    if op == "hll":
        r = rows[0]
        summary.update(
            n_exact=r.n_exact, est_hll=r.est_hll,
            err_pct=round(100.0 * (r.est_hll - r.n_exact) / r.n_exact, 2),
        )
    elif op == "cms":
        summary.update(
            probe_rows=len(rows),
            max_over_w64=max(r.over_w64 for r in rows),
            max_over_w2048=max(r.over_w2048 for r in rows),
        )
    else:
        r = rows[0]
        summary.update(
            n_members=r.n_members, fill_ratio=r.fill_ratio,
            fpr_measured=r.fpr_measured, n_false_neg=r.n_false_neg,
        )
    print("PROBE " + json.dumps(summary), flush=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        _single(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base_dir = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.01")

    scales = [(base_dir, 1)]
    for f in (factor // 10, factor):
        if f > 1:
            probe_dir = f"/tmp/smhs_probe_sketch_{f}x"
            spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            spark.sparkContext.setLogLevel("ERROR")
            _ensure_replicated(spark, base_dir, f, probe_dir)
            spark.stop()
            scales.append((probe_dir, f))

    for sf_dir, scale in scales:
        for op in ["hll", "cms", "bloom"]:
            out = subprocess.run(
                [sys.executable, "-m", "tools.scale_probe_sketch",
                 "--single", op, sf_dir, str(scale)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for line in out.stdout.splitlines():
                if line.startswith("PROBE "):
                    print(line, flush=True)
            if out.returncode != 0:
                print(json.dumps({"op": op, "scale": scale,
                                  "error": out.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
