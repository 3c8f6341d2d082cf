"""IVF×PQ scale probe (SCALE.md evidence for the composed ANN path).

Replicates `embeddings` N times by key-shifted ``vec_id`` with UNCHANGED
vectors and labels. Base ids cover every residue mod 100, so no stride
alone can keep replicas out of the ``vec_id % 100 == 0`` query set — the
replication instead DROPS the ~1% of replica rows that would land on the
query residue, pinning the query workload to the base corpus's queries
(the realistic shape: queries are workload, corpus is data). Then times
``sim_pq_adc`` (full-corpus ADC scan) against ``sim_ann_ivfpq`` (ADC
restricted to the query's nprobe=2 probed cells) at 1x and Nx.

Each (op, scale) cell runs in its OWN SUBPROCESS with a fresh
SparkSession — long-lived probe sessions accumulate checkpoint blocks
and GC pressure that skewed early same-process drafts of this probe by
2-3x on the later cells. Inside the subprocess: one warm-up execution,
then 3 timed runs; best and median are reported (the drift protocol's
bench_isolated discipline).

The claim under test is the one the round-5 PQ probe named as the next
decade's dial: IVF-ing the codes drops the per-query ADC scan from
|corpus| to |corpus|·nprobe/cells. Both queries also pay the SHARED
corpus-linear PQ-training + coarse-assignment passes, which dominate
end-to-end wall at this toy scale — the per-query scan term the IVF cut
targets is what grows with |queries|×|corpus| at production scale.

Usage:  python -m tools.scale_probe_ivfpq [factor]    (default 10)
Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE_OPS = ["sim_pq_adc", "sim_ann_ivfpq"]
ID_STRIDE = 1_000_003
N_RUNS = 3


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    from spark_ml_helper_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smhs-scale-probe-ivfpq")
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

    if os.path.exists(os.path.join(out_dir, "embeddings.parquet", "_SUCCESS")):
        return
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    reps = spark.range(factor).withColumnRenamed("id", "k")
    out = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("k") * ID_STRIDE)
        .where((F.col("k") == 0) | (F.col("vec_id") % 100 != 0))
        .drop("k")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def _single(op: str, sf_dir: str, scale: int) -> None:
    """Subprocess body: fresh session, 1 warm-up + N_RUNS timed runs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    rows = REGISTRY[op].fn(spark, sf_dir).count()  # warm-up (cold JVM)
    runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        rows = REGISTRY[op].fn(spark, sf_dir).count()
        runs.append(round(time.time() - t0, 2))
    runs_sorted = sorted(runs)
    print(
        "PROBE "
        + json.dumps(
            {
                "op": op,
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
        _single(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    probe_dir = f"/tmp/smhs_probe_emb_{factor}x"

    from spark_ml_helper_spark.registry import load_all_operators

    load_all_operators()
    spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_replicated(spark, base_dir, factor, probe_dir)
    spark.stop()

    for sf_dir, scale in [(base_dir, 1), (probe_dir, factor)]:
        for op in PROBE_OPS:
            out = subprocess.run(
                [sys.executable, "-m", "tools.scale_probe_ivfpq", "--single", op, sf_dir, str(scale)],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for line in out.stdout.splitlines():
                if line.startswith("PROBE "):
                    print(line[6:], flush=True)
                    break
            else:
                print(json.dumps({"op": op, "scale": scale, "error": out.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
