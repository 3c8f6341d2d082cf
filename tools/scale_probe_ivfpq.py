"""IVF×PQ scale probe (SCALE.md evidence for the composed ANN path).

Replicates `embeddings` N times by key-shifted ``vec_id`` with UNCHANGED
vectors and labels, using a stride that is NOT a multiple of 100 so the
query set (vec_id % 100 == 0) stays FIXED at the base corpus's queries —
the realistic shape: queries are workload, corpus is data. Then times
``sim_pq_adc`` (full-corpus ADC scan) against ``sim_ann_ivfpq`` (ADC
restricted to the query's nprobe=2 probed cells) at 1x and Nx.

The claim under test is the one the round-5 PQ probe named as the next
decade's dial: IVF-ing the codes drops the per-query ADC scan from
|corpus| to |corpus|·nprobe/cells, so the composed query's growth with N
should sit well under the full scan's. (Both still pay the corpus-linear
PQ training + coarse assignment passes, which are shared, mergeable-
partial shapes.)

Usage:  python -m tools.scale_probe_ivfpq [factor]    (default 10)
Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

PROBE_OPS = ["sim_pq_adc", "sim_ann_ivfpq"]
# NOT divisible by 100: replica ids never enter the vec_id % 100 == 0
# query set, so |queries| is pinned while the corpus scales.
ID_STRIDE = 1_000_003


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
        .drop("k")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    probe_dir = f"/tmp/smhs_probe_emb_{factor}x"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    _ensure_replicated(spark, base_dir, factor, probe_dir)

    def collect_garbage() -> None:
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for sf_dir, scale in [(base_dir, 1), (probe_dir, factor)]:
        for name in PROBE_OPS:
            collect_garbage()
            times = []
            rows = None
            for _ in range(2):  # cold, then warm
                t0 = time.time()
                rows = REGISTRY[name].fn(spark, sf_dir).count()
                times.append(round(time.time() - t0, 2))
            print(
                json.dumps(
                    {
                        "op": name,
                        "scale": scale,
                        "rows": rows,
                        "cold_s": times[0],
                        "warm_s": times[1],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
