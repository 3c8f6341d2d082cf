"""100x composite scale probe for the dedup path (SCALE.md evidence).

Replicates `documents` N times by key-shifted ``doc_id`` with UNCHANGED
texts — the adversarial shape for dedup, because every duplicate group's
membership grows Nx while distinct content stays fixed — then runs the
rep-level production pipeline (``dedup_exact`` → ``dedup_minhash`` →
``dedup_clusters``) at 1x and Nx, recording wall-clock (cold + warm),
output rows, and per-run shuffle-write volume (total and peak stage)
from the Spark UI REST API.

The claim under test is the one SCALE.md makes for 100 TB: candidate
generation scales with DISTINCT content (replicas collapse into the same
representative sets before any pair generation), so Nx replication should
cost ~flat on the LSH/CC core and only the final membership expansion
should grow with N.

Usage:  python -m tools.scale_probe_dedup [factor]    (default 100)
Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per (op, scale) and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

PROBE_OPS = ["dedup_exact", "dedup_minhash", "dedup_clusters"]
ID_STRIDE = 1_000_000  # doc_id shift per replica; base ids are ~5k at sf0.1


def _build_session(cpus: str):
    """Mirror session.get_spark confs but keep the UI on for stage metrics."""
    from pyspark.sql import SparkSession

    from spark_ml_helper_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smhs-scale-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _completed_stages(ui_url: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui_url}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    # (stageId, attemptId) keys; retries are separate attempts
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def _shuffle_delta(before: dict, after: dict) -> dict:
    new = [s for k, s in after.items() if k not in before]
    writes = [s.get("shuffleWriteBytes", 0) for s in new]
    return {
        "stages": len(new),
        "shuffle_write_mb": round(sum(writes) / 1e6, 1),
        "peak_stage_shuffle_mb": round(max(writes, default=0) / 1e6, 1),
    }


def _ensure_replicated(spark, base_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        return
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    reps = spark.range(factor).withColumnRenamed("id", "k")
    out = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * ID_STRIDE)
        .drop("k")
        .repartition(64)
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    probe_dir = f"/tmp/smhs_probe_docs_{factor}x"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl

    _ensure_replicated(spark, base_dir, factor, probe_dir)

    def collect_garbage() -> None:
        # same hygiene as bench.py: localCheckpoint blocks from a previous
        # op otherwise squeeze execution memory and distort the next timing
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    results = []
    for sf_dir, scale in [(base_dir, 1), (probe_dir, factor)]:
        for name in PROBE_OPS:
            times = []
            rows = None
            collect_garbage()
            before = _completed_stages(ui_url)
            for _ in range(2):  # cold, then warm
                t0 = time.time()
                rows = REGISTRY[name].fn(spark, sf_dir).count()
                times.append(round(time.time() - t0, 2))
            rec = {
                "op": name,
                "scale": scale,
                "rows": rows,
                "cold_s": times[0],
                "warm_s": times[1],
                **_shuffle_delta(before, _completed_stages(ui_url)),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    by_op = {}
    for r in results:
        by_op.setdefault(r["op"], {})[r["scale"]] = r
    summary = {
        op: {
            "warm_factor": round(d[factor]["warm_s"] / max(d[1]["warm_s"], 1e-9), 2),
            "rows_factor": round(d[factor]["rows"] / max(d[1]["rows"], 1), 2),
            "shuffle_factor": round(
                d[factor]["shuffle_write_mb"] / max(d[1]["shuffle_write_mb"], 0.1), 2
            ),
        }
        for op, d in by_op.items()
        if 1 in d and factor in d
    }
    print(json.dumps({"factor": factor, "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
