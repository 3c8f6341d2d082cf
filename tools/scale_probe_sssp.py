"""graph_sssp_weighted delta-frontier scale probe (SCALE.md evidence).

The fixture co-occurrence graph converges in a handful of rounds, so it
cannot show what delta-frontier relaxation buys. This probe builds the
adversarial shape — a LAYERED graph of L layers × W nodes (node
(l, i) → (l+1, i) and (l+1, (i+1) mod W), integer weights 1 + (i+l) mod 5,
seeds = all of layer 0), diameter L−1 — and runs both relaxation forms:

- FULL-FRAME (the unrolled-oracle shape graph_bfs_layers mirrors): every
  round joins the ENTIRE distance frame against the edges — |V| × L
  joined rows across the run;
- DELTA-FRONTIER (``sssp_fixpoint``): every round joins only last
  round's improved nodes — in this DAG shape exactly one layer (W rows)
  per round, Σ|frontier| = |V| total.

Both must produce identical distances (asserted by count + dist-sum +
max-dist). Wall clock and rounds are recorded for SCALE.md.

Usage: python -m tools.scale_probe_sssp [layers] [width]  (default 30 50000)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.graph import sssp_fixpoint
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-sssp-probe")

    # canonical generator (operators/graph_bench.py) — the band rows and
    # this probe measure the same shape by construction (round 14)
    from spark_ml_helper_spark.operators.graph_bench import layered_dag

    edges, seeds = layered_dag(spark, L=L, W=W)

    def summarize(d):
        r = d.agg(
            F.count("*").alias("n"),
            F.sum("dist").alias("s"),
            F.max("dist").alias("mx"),
        ).first()
        return (r["n"], r["s"], r["mx"])

    # delta-frontier
    t0 = time.time()
    d_delta, rounds = sssp_fixpoint(edges, seeds, max_rounds=L + 2)
    sig_delta = summarize(d_delta)
    t_delta = round(time.time() - t0, 2)

    # full-frame (the unrolled-oracle shape), run to the same fixpoint
    t0 = time.time()
    d = seeds.localCheckpoint(eager=True)
    prev = None
    full_rounds = 0
    while True:
        full_rounds += 1
        prop = edges.join(d.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        d = (
            d.unionByName(prop)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        cur = d.agg(F.count("*").alias("n"), F.sum("dist").alias("s")).first()
        if prev == (cur["n"], cur["s"]):
            break
        prev = (cur["n"], cur["s"])
        if full_rounds > L + 2:
            raise RuntimeError("full-frame failed to converge")
    sig_full = summarize(d)
    t_full = round(time.time() - t0, 2)

    assert sig_full == sig_delta, (sig_full, sig_delta)
    print(
        json.dumps(
            {
                "probe": "sssp_delta_frontier",
                "layers": L,
                "width": W,
                "n_nodes": L * W,
                "diameter_rounds": rounds,
                "t_delta_frontier_s": t_delta,
                "t_full_frame_s": t_full,
                "full_frame_rounds": full_rounds,
                "joined_rows_full": L * W * full_rounds,
                "joined_rows_delta": L * W,
                "dist_signature": sig_delta,
            }
        )
    )


if __name__ == "__main__" and not (
    len(sys.argv) > 1 and sys.argv[1] == "--delta-stepping"
):
    main()


def delta_stepping_probe() -> None:
    """Bucketed Δ-stepping (Meyer & Sanders 2003) vs the shipped
    delta-frontier Bellman-Ford, on the shape BF is WORST at: W parallel
    chains of L light edges (w=1) plus heavy "shortcut" edges
    head→(c,i) with w=2i. BF round 1 sets every node to its stale
    shortcut distance 2i, then every later round improves EVERY
    still-stale node by 1 → Σ|frontier| ≈ W·L²/2 relaxations across the
    run. Δ-stepping processes distance buckets of width Δ in order, so
    a node is relaxed-from only once, at (essentially) its final
    distance → Σ|frontier| ≈ W·L + W (the Dijkstra-like bound). Both
    runs share sssp_fixpoint's merge shape (full-outer d⋈prop) so the
    comparison isolates RELAXATION VOLUME — the shuffle-bytes term that
    matters at 100 TB — while round counts stay ~L for both (light
    chains advance one hop per BSP round in ANY frontier algorithm).

    Usage: python -m tools.scale_probe_sssp --delta-stepping [W] [L] [Δ]
    (defaults 5000 64 8). Prints one JSON line; run at W and 10·W for
    the decade.
    """
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    DELTA = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-delta-stepping-probe")
    spark.sparkContext.setLogLevel("ERROR")

    chains = spark.range(W).selectExpr("id AS c").crossJoin(
        spark.range(L - 1).selectExpr("id AS i")
    )
    chain_e = chains.selectExpr(
        f"c * CAST({L} AS BIGINT) + i AS src",
        f"c * CAST({L} AS BIGINT) + i + 1 AS dst",
        "CAST(1 AS BIGINT) AS w",
    )
    short_e = chains.where("i >= 1").selectExpr(
        f"c * CAST({L} AS BIGINT) AS src",
        f"c * CAST({L} AS BIGINT) + i AS dst",
        "CAST(2 * i AS BIGINT) AS w",
    )
    edges = chain_e.unionByName(short_e).localCheckpoint(eager=True)
    light = edges.where(F.col("w") <= DELTA).localCheckpoint(eager=True)
    heavy = edges.where(F.col("w") > DELTA).localCheckpoint(eager=True)
    seeds = spark.range(W).select(
        (F.col("id") * L).alias("node"), F.lit(0).cast("bigint").alias("dist")
    )

    def merge(d, prop):
        m = (
            d.join(prop, "node", "full")
            .select(
                "node",
                F.least("dist", "cand").cast("bigint").alias("dist"),
                (
                    F.col("cand").isNotNull()
                    & (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
                ).alias("improved"),
            )
            .localCheckpoint(eager=True)
        )
        return m.select("node", "dist"), m.where("improved").select("node", "dist")

    def summarize(d):
        r = d.agg(
            F.count("*").alias("n"), F.sum("dist").alias("s"), F.max("dist").alias("m")
        ).first()
        return (r["n"], r["s"], r["m"])

    # --- delta-frontier Bellman-Ford (the shipped sssp_fixpoint recurrence,
    # inlined so Σ|frontier| can be counted)
    t0 = time.time()
    d = seeds.localCheckpoint(eager=True)
    f = d
    bf_rounds, bf_frontier = 0, 0
    while not f.isEmpty():
        bf_rounds += 1
        bf_frontier += f.count()
        prop = (
            edges.join(f.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        d, f = merge(d, prop)
        f = f.localCheckpoint(eager=True)
        if bf_rounds > 2 * L + 4:
            raise RuntimeError("BF failed to converge")
    sig_bf = summarize(d)
    t_bf = round(time.time() - t0, 2)

    # --- Δ-stepping
    t0 = time.time()
    d = seeds.localCheckpoint(eager=True)
    f = d
    ds_rounds, ds_frontier = 0, 0
    bkt = F.floor(F.col("dist") / DELTA)
    while not f.isEmpty():
        b = f.agg(F.min(bkt).alias("b")).first()["b"]
        cur = f.where(bkt == b).localCheckpoint(eager=True)
        f = f.where(bkt > b).localCheckpoint(eager=True)
        settled = cur.select("node")
        while not cur.isEmpty():
            ds_rounds += 1
            ds_frontier += cur.count()
            prop = (
                light.join(
                    F.broadcast(cur).withColumnRenamed("node", "src"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
            )
            d, imp = merge(d, prop)
            imp = imp.localCheckpoint(eager=True)
            cur = imp.where(bkt == b).localCheckpoint(eager=True)
            settled = settled.unionByName(cur.select("node"))
            f = (
                f.join(imp, "node", "left_anti")
                .unionByName(imp.where(bkt > b))
                .localCheckpoint(eager=True)
            )
        s = d.join(
            F.broadcast(settled.distinct()), "node"
        ).localCheckpoint(eager=True)
        ds_rounds += 1
        ds_frontier += s.count()
        prop = (
            heavy.join(F.broadcast(s).withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        d, imp = merge(d, prop)
        imp = imp.localCheckpoint(eager=True)
        # heavy improvements land strictly beyond bucket b (w > Δ)
        f = (
            f.join(imp, "node", "left_anti")
            .unionByName(imp)
            .localCheckpoint(eager=True)
        )
        if ds_rounds > 4 * L + 16:
            raise RuntimeError("delta-stepping failed to converge")
    sig_ds = summarize(d)
    t_ds = round(time.time() - t0, 2)

    assert sig_bf == sig_ds, (sig_bf, sig_ds)
    # analytic check: dist of (c, i) is exactly i
    assert sig_bf == (W * L, W * L * (L - 1) // 2, L - 1), sig_bf
    print(
        json.dumps(
            {
                "probe": "sssp_delta_stepping",
                "width": W,
                "chain_len": L,
                "delta": DELTA,
                "n_nodes": W * L,
                "bf_rounds": bf_rounds,
                "bf_sum_frontier": bf_frontier,
                "bf_wall_s": t_bf,
                "ds_rounds": ds_rounds,
                "ds_sum_frontier": ds_frontier,
                "ds_wall_s": t_ds,
                "frontier_ratio": round(bf_frontier / max(ds_frontier, 1), 2),
            }
        )
    )


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--delta-stepping":
    delta_stepping_probe()
