"""Incremental-dedup scale probe (SCALE.md evidence for dedup_incremental).

Holds the BATCH fixed (the base corpus's doc_id % 10 == 0 docs — one
crawl snapshot) while the INDEX corpus decades: index-residue documents
are replicated N× by key-shifted doc_id with UNCHANGED texts (the
stride is a multiple of 10, so replicas keep their index residue;
batch-residue replicas are dropped to pin the snapshot).

Two cells per scale, each in its OWN SUBPROCESS with a fresh session
(the bench_isolated / ivfpq-probe discipline — long-lived probe
sessions skew later cells 2-3×):

- build:  hash_documents + build_dedup_index over the index docs, reps
  and bands WRITTEN to parquet — the once-per-snapshot amortized cost.
- decide: load the persisted reps/bands, hash the (fixed) batch, run
  incremental_decisions — the per-snapshot online cost.

The claim under test: replicas collapse into the SAME representatives
(identical text ⇒ identical skey, and set_id = min doc_id stays the
base id), so reps/bands/candidates stay FLAT as the index corpus grows —
the decide cell should be ~flat across decades while only the build
cell grows with corpus size. The decision table itself must be
IDENTICAL at every scale (the probe asserts the row count).

Usage:  python -m tools.scale_probe_incremental [factor]   (default 10)
Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per (cell, scale).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ID_STRIDE = 1_000_000  # multiple of 10: replicas keep their batch/index residue
N_RUNS = 3


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    from spark_ml_helper_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smhs-scale-probe-incr")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _ensure_replicated(spark, base_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        return
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    reps = spark.range(factor).withColumnRenamed("id", "k")
    out = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * ID_STRIDE)
        # batch snapshot pinned to the base corpus; index replicas only
        .where((F.col("k") == 0) | (F.col("doc_id") % 10 != 0))
        .drop("k")
        .repartition(64)
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def _single(cell: str, sf_dir: str, scale: int, art_dir: str) -> None:
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.text import (
        build_dedup_index,
        hash_documents,
        incremental_decisions,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run_build() -> int:
        hashed = hash_documents(docs.where(F.col("doc_id") % 10 != 0))
        reps, bands = build_dedup_index(hashed)
        reps.write.mode("overwrite").parquet(f"{art_dir}/reps.parquet")
        bands.write.mode("overwrite").parquet(f"{art_dir}/bands.parquet")
        return spark.read.parquet(f"{art_dir}/reps.parquet").count()

    def run_decide() -> int:
        reps = spark.read.parquet(f"{art_dir}/reps.parquet")
        bands = spark.read.parquet(f"{art_dir}/bands.parquet")
        batch = hash_documents(docs.where(F.col("doc_id") % 10 == 0))
        return incremental_decisions(batch, reps, bands).count()

    fn = run_build if cell == "build" else run_decide
    rows = fn()  # warm-up (cold JVM, file listing)
    runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        rows = fn()
        runs.append(round(time.time() - t0, 2))
    runs_sorted = sorted(runs)
    print(
        "PROBE "
        + json.dumps(
            {
                "cell": cell,
                "scale": scale,
                "rows": rows,
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
        _single(sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
        return

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    scales = [(base_dir, 1)]
    if factor > 1:
        probe_dir = f"/tmp/smhs_probe_incr_{factor}x"
        spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark.sparkContext.setLogLevel("ERROR")
        _ensure_replicated(spark, base_dir, factor, probe_dir)
        spark.stop()
        scales.append((probe_dir, factor))

    for sf_dir, scale in scales:
        art_dir = f"/tmp/smhs_probe_incr_art_{scale}x"
        for cell in ["build", "decide"]:
            out = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "tools.scale_probe_incremental",
                    "--single",
                    cell,
                    sf_dir,
                    str(scale),
                    art_dir,
                ],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for line in out.stdout.splitlines():
                if line.startswith("PROBE "):
                    print(line[6:], flush=True)
                    break
            else:
                print(
                    json.dumps({"cell": cell, "scale": scale, "error": out.stderr[-500:]}),
                    flush=True,
                )


if __name__ == "__main__":
    main()
