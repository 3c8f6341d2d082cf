"""Skew-salting probe: measure what a hot key does to a shuffle join and
what the explicit hot-key-split salt (operators/scale.join_skew_salted's
pattern) buys back.

The fixture can't show this — TPC-H orderkeys are near-uniform, so the
salted operator's oracle proves only EQUIVALENCE there. This probe builds
a synthetic probe side where ONE key owns fraction p of all rows (the
power-law regime the 100 TB brief names), forces a shuffle join (no
broadcast: `shuffle_hash` hint), and measures, with AQE OFF so the raw
mechanics are visible:

- per-reduce-partition row histogram of the joined stream — computed
  IN-PLAN via spark_partition_id() + count (no task-store spelunking):
  max/median partition rows IS the reducer skew a cluster melts under;
- wall time of plain vs salted;
- and, separately, plain-join wall with AQE skew-join ON (the engine's
  adaptive splitter, for reference — the explicit split composes with
  the downstream aggregation too, which AQE's join-only split does not).

The salted variant re-implements join_skew_salted's exact shape on the
synthetic frames (hot-key dictionary above threshold T -> broadcast;
probe hot rows take salt = row_number % S; build hot rows explode S
ways; cold majority joins untouched; two-phase aggregate) and the probe
asserts its aggregate EQUALS the plain join's before timing anything.

Usage: python -m tools.scale_probe_skew [--rows N] [--hot-frac P]
       (defaults 200_000 rows, p=0.3, decade cell at 10x rows via
       --rows 2_000_000). One JSON line per (variant, n) cell.
Results recorded in SCALE.md round-13 (skew decade).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

S = 16  # salt fan-out
HOT_T = 10_000  # hot-key threshold (rows) — the partition-budget dial
K = 1_000  # distinct cold keys


def synth(spark, n: int, hot_frac: float):
    """(probe, build): probe has n rows, key 0 owns hot_frac of them,
    keys 1..K split the rest ~uniformly; build has one row per key."""
    probe = (
        spark.range(n)
        .select(
            F.when(
                F.col("id") < int(n * hot_frac), F.lit(0)
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(K)) + 1)
            .alias("key"),
            (F.col("id") % 97).cast("double").alias("val"),
            F.col("id").alias("rid"),
        )
        .localCheckpoint(eager=True)
    )
    build = (
        spark.range(K + 1)
        .select(F.col("id").alias("key"), (F.col("id") * 7 % 31).alias("grp"))
        .localCheckpoint(eager=True)
    )
    return probe, build


def plain_join(probe, build):
    return probe.hint("shuffle_hash").join(build, "key")


def salted_join(probe, build):
    """join_skew_salted's hot-key-split shape on the synthetic frames."""
    hot = (
        probe.groupBy("key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > HOT_T)
        .select(F.col("key").alias("hot_key"))
    )
    p_flag = probe.join(F.broadcast(hot), probe.key == F.col("hot_key"), "left")
    p_hot = p_flag.filter(F.col("hot_key").isNotNull()).select(
        "key", "val", F.pmod(F.col("rid"), F.lit(S)).alias("salt")
    )
    p_cold = p_flag.filter(F.col("hot_key").isNull()).select("key", "val")
    b_flag = build.join(F.broadcast(hot), build.key == F.col("hot_key"), "left")
    b_hot = (
        b_flag.filter(F.col("hot_key").isNotNull())
        .select("key", "grp")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(S)]))
        )
    )
    b_cold = b_flag.filter(F.col("hot_key").isNull()).select("key", "grp")
    hot_j = p_hot.hint("shuffle_hash").join(b_hot, ["key", "salt"]).select(
        "key", "grp", "val"
    )
    cold_j = p_cold.hint("shuffle_hash").join(b_cold, "key").select(
        "key", "grp", "val"
    )
    return hot_j.unionByName(cold_j)


def partition_histogram(joined):
    """(max, median, n_parts) of per-partition row counts of the joined
    stream — the reducer-skew measure, computed in-plan."""
    import statistics

    counts = [
        r["cnt"]
        for r in joined.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    return max(counts), statistics.median(counts), len(counts)


def agg_of(joined):
    return {
        (r["grp"],): (r["n"], round(r["s"], 4))
        for r in joined.groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def wall(joined_fn) -> float:
    import gc

    joined_fn().write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(2):
        gc.collect()
        t0 = time.perf_counter()
        joined_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_ml_helper_spark.session import get_spark

    rows = 200_000
    hot_frac = 0.3
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--rows":
            rows = int(next(args))
        elif a == "--hot-frac":
            hot_frac = float(next(args))

    spark = get_spark(app_name="smhs-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe, build = synth(spark, rows, hot_frac)
        # correctness first: the salted plan IS the plain plan's answer
        assert agg_of(salted_join(probe, build)) == agg_of(plain_join(probe, build))
        for variant, fn in (
            ("plain", lambda: plain_join(probe, build)),
            ("salted", lambda: salted_join(probe, build)),
        ):
            mx, med, nparts = partition_histogram(fn())
            w = wall(fn)
            print(
                json.dumps(
                    {
                        "variant": variant,
                        "rows": rows,
                        "hot_frac": hot_frac,
                        "max_part_rows": mx,
                        "med_part_rows": med,
                        "n_parts": nparts,
                        "skew_ratio": round(mx / max(med, 1), 1),
                        "wall_s": w,
                    }
                ),
                flush=True,
            )
        # reference: the engine's adaptive skew-join on the plain plan
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        w = wall(lambda: plain_join(probe, build))
        print(
            json.dumps(
                {"variant": "plain+aqe_skewjoin", "rows": rows, "wall_s": w}
            ),
            flush=True,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
