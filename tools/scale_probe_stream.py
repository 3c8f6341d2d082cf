"""Streaming state-store scale probe (SCALE.md evidence).

Runs the two stateful streaming programs from ``streaming/runs.py`` —
the watermarked keyed windowed aggregation (append mode) and
``dropDuplicatesWithinWatermark`` — at 1x / 10x / 100x DISTINCT-KEY
cardinality on BOTH state-store providers (HDFSBacked default and
RocksDB), recording per-micro-batch wall time and state-store size
(rows + bytes) from the StreamingQueryProgress stateOperators metrics.

The claim under test is the one SCALE.md's other families already have
measured decades for: watermark-bounded state grows with LIVE KEYS
(keys x windows inside the watermark horizon), NOT with stream length,
and per-batch cost is input-row-bound once state fits memory. The knob
named by the result rows: ``numRowsTotal`` tracks key cardinality
linearly while batch wall time stays input-bound — and the RocksDB
provider trades a constant per-batch overhead for off-heap state that
keeps growing past executor memory (the 100 TB choice).

Input synthesis (probe-only, not a production path): a fixed 1.2M-event
stream over a 2h span staged as 8 time-ranged files (mtime-ordered, the
runs.py staging discipline) so availableNow + maxFilesPerTrigger=2
yields 4 real micro-batches with an advancing watermark; key cardinality
scales 5k -> 50k -> 500k while event count stays FIXED, isolating
state-store cost from input cost.

Usage:  python -m tools.scale_probe_stream [base_keys] [factors...]
        (defaults: 5000 1 10 100)
Prints one JSON line per (program, provider, scale, batch) + summaries.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _stage_events(spark, n_events: int, n_keys: int, n_files: int = 8) -> str:
    """Synthesize n_events over a 2h span with user_id in [0, n_keys),
    staged as n_files time-ranged single-file parquets with strictly
    increasing mtimes (FileStreamSource lists mtime-then-path)."""
    from pyspark.sql import functions as F

    out = os.path.join(
        tempfile.mkdtemp(prefix="smhs_stream_probe_"), f"events_{n_keys}"
    )
    os.makedirs(out, exist_ok=True)
    span_us = 2 * 3600 * 1_000_000
    base_us = 1_600_000_000 * 1_000_000
    per_file = n_events // n_files
    mt = 1_600_000_000
    for k in range(n_files):
        sl = (
            spark.range(k * per_file, (k + 1) * per_file)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_keys).alias("user_id"),
                (F.col("id") % 8).cast("int").alias("event_type"),
                F.timestamp_micros(
                    F.lit(base_us) + (F.col("id") * (span_us // n_events))
                ).alias("ts"),
            )
        )
        tmp = os.path.join(out, f"_tmp{k}")
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        dst = os.path.join(out, f"{k:02d}.parquet")
        os.replace(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (mt + k, mt + k))
        mt += 0  # mtimes strictly increase via +k
    return out


def _windowed_agg(stream):
    from pyspark.sql import functions as F

    return (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "user_id", "n")
    )


def _dedup(stream):
    return (
        stream.withWatermark("ts", "30 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )


PROGRAMS = {"windowed_agg": _windowed_agg, "dedup_watermark": _dedup}


def _run_once(spark, path: str, program, provider: str | None):
    """Execute one availableNow run; return (wall_s, rows_out, batches)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if provider:
        spark.conf.set(key, provider)
    try:
        reader = spark.readStream.schema(spark.read.parquet(path).schema)
        stream = reader.option("maxFilesPerTrigger", 2).parquet(path)
        df = program(stream)
        name = "p" + uuid.uuid4().hex[:12]
        t0 = time.time()
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="smhs_probe_ckpt_"),
            )
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        batches = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            op = ops[0]
            batches.append(
                {
                    "batch": p.get("batchId"),
                    "batch_ms": (p.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                    "state_rows": op.get("numRowsTotal"),
                    "state_bytes": op.get("memoryUsedBytes"),
                    "rows_updated": op.get("numRowsUpdated"),
                    "rows_removed": op.get("numRowsRemoved"),
                }
            )
        rows_out = spark.table(name).count()
        return wall, rows_out, batches
    finally:
        if provider:
            if prev:
                spark.conf.set(key, prev)
            else:
                spark.conf.unset(key)


def main() -> None:
    base_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-stream-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n_events = 1_200_000
    for factor in factors:
        n_keys = base_keys * factor
        path = _stage_events(spark, n_events, n_keys)
        for pname, program in PROGRAMS.items():
            for plabel, provider in (("hdfs", None), ("rocksdb", ROCKSDB)):
                wall, rows_out, batches = _run_once(
                    spark, path, program, provider
                )
                peak_rows = max(
                    (b["state_rows"] or 0 for b in batches), default=0
                )
                peak_bytes = max(
                    (b["state_bytes"] or 0 for b in batches), default=0
                )
                print(
                    json.dumps(
                        {
                            "program": pname,
                            "provider": plabel,
                            "keys": n_keys,
                            "factor": factor,
                            "events": n_events,
                            "wall_s": round(wall, 2),
                            "rows_out": rows_out,
                            "peak_state_rows": peak_rows,
                            "peak_state_mb": round(peak_bytes / 1e6, 1),
                            "batches": batches,
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
