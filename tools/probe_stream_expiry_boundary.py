"""Probe: the EXACT eviction/emission boundary of watermarked streaming ops.

ADVICE r15 flagged that STREAM_JOIN_OUTER_ORACLE null-expires views with
``v_ts + 1h < wm`` (strict) while every windowed/session oracle uses
``<=`` — a latent data-dependent hash mismatch if a match-window end ever
lands EXACTLY on the final watermark at ms precision. No amount of
fixture-sweep evidence settles this (the boundary case may simply never
occur in the fixtures), so this probe CONSTRUCTS the boundary case and
observes what the engine does.

Two experiments, both on a crafted parquet file-source stream executed
under Trigger.AvailableNow (the final no-data micro-batch advances the
watermark over the whole input — same machinery as streaming/runs.py):

1. **Left-outer stream-stream join** (30-min watermarks both sides,
   b_ts in [v_ts, v_ts + 1h]):
   - view A's match window ends EXACTLY at the final global watermark
     (v_ts + 1h == wm == min(max_v, max_b) - 30min),
   - view D's match window ends 1 ms BEFORE the watermark (control: its
     null row must emit under any sane boundary),
   - views B / purchase C only pin the two side maxima and match nothing.
   Expected output: 1 null row (strict `<`) or 2 null rows (`<=`).

2. **Append-mode windowed aggregation** (30-min watermark, 1h tumbling):
   one window's end EXACTLY equals the final watermark; a second window
   closes well before it (control). Expected: 1 emitted window (strict)
   or 2 (`<=`, what the repo's _WM_MS oracles assume).

MEASURED RESULT (2026-08-16, Spark 4.1.2 local, this probe; re-measured
same day on the production type chain — timestamp_ntz stream +
cast("timestamp") before withWatermark — identical outcome):
  join null-expiry rows: 1  -> STRICT `<` (window end == wm does NOT expire)
  append-mode windows:   2  -> `<=`      (window end == wm DOES emit)

So the two operators genuinely sit on opposite sides of the boundary:
WatermarkSupport's eviction predicate for aggregation state is
``window.end <= watermark`` (emit-on-equal), while the join's
one-side state watermark from StreamingJoinHelper is applied as
``value < stateValueWatermark`` (keep-on-equal: a purchase with
b_ts == wm is not yet provably late, so the view must keep waiting).
STREAM_JOIN_OUTER_ORACLE's strict `<` is therefore EXACT, not a bug —
pinned structurally by
tests/test_pipeline.py::test_stream_expiry_boundary_join_strict_agg_inclusive.

Run: python -m tools.probe_stream_expiry_boundary
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from spark_ml_helper_spark.session import get_spark, staging_dir


def _stage(spark, rows):
    """Write crafted events as ONE parquet file; return the directory.

    ts is staged as timestamp_ntz — the type _events_stream yields — so the
    CI-pinned boundary runs the production type chain exactly: NTZ on the
    stream, then cast("timestamp") immediately before withWatermark (the
    cast every runs.py query performs, identity on the stored micros under
    the pinned UTC session; withWatermark itself REJECTS raw NTZ with
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). ADVICE r16; previously the probe
    staged session-tz TimestampType directly."""
    out = os.path.join(staging_dir(prefix="smhs_probe_wm_"), "events")
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _run_append(df):
    name = "m" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def probe_join_boundary(spark) -> list:
    """Null-expiry rows from the boundary-crafted left-outer join."""
    # wm = min(max_v, max_b) floor-ms - 30min = 11:00:00.000
    rows = [
        (1, 10, "view", "2024-01-01 10:00:00.000", 0.0),  # A: end == wm
        (4, 40, "view", "2024-01-01 09:59:59.999", 0.0),  # D: end == wm - 1ms
        (2, 20, "view", "2024-01-01 11:30:00.000", 0.0),  # B: pins max_v
        (3, 30, "purchase", "2024-01-01 11:30:00.000", 5.0),  # C: pins max_b
    ]
    path = _stage(spark, rows)
    schema = spark.read.parquet(path).schema
    src = lambda: spark.readStream.schema(schema).parquet(path)  # noqa: E731
    # NTZ stream -> cast("timestamp") before withWatermark: the exact
    # production chain (runs.py stream_run_stream_join / _outer).
    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    buys = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").cast("timestamp").alias("b_ts"),
            F.col("value").alias("b_value"),
        )
        .withWatermark("b_ts", "30 minutes")
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("v_user", "v_id", "v_ts", "b_ts", "b_value")
    return _run_append(joined).filter(F.col("b_ts").isNull()).collect()


def probe_agg_boundary(spark) -> list:
    """Append-emitted windows from the boundary-crafted windowed count."""
    # wm = floor_ms(max ts) - 30min = 12:00:00.000
    rows = [
        (1, 1, "view", "2024-01-01 09:10:00.000", 0.0),  # window [09:00,10:00) — control
        (1, 2, "view", "2024-01-01 11:10:00.000", 0.0),  # window [11:00,12:00): end == wm
        (1, 3, "view", "2024-01-01 12:30:00.000", 0.0),  # pins max ts (its window stays open)
    ]
    path = _stage(spark, rows)
    schema = spark.read.parquet(path).schema
    agg = (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> tz, as in runs.py
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    return _run_append(agg).collect()


def main() -> None:
    spark = get_spark("probe-stream-expiry-boundary", cpus=8)
    jn = probe_join_boundary(spark)
    ag = probe_agg_boundary(spark)
    print(f"PROBE join null-expiry rows (1=strict <, 2=<=): {len(jn)}")
    for r in sorted(jn, key=lambda r: r.v_id):
        print(f"PROBE   join null row: v_id={r.v_id} v_ts={r.v_ts}")
    print(f"PROBE append-mode windows emitted (1=strict <, 2=<=): {len(ag)}")
    for r in sorted(ag, key=lambda r: r.w_start):
        print(f"PROBE   agg window: w_start={r.w_start} n={r.n}")


if __name__ == "__main__":
    main()
