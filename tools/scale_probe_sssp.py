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

    base = spark.range(L - 1).selectExpr("id AS l").crossJoin(
        spark.range(W).selectExpr("id AS i")
    )
    edges = (
        base.selectExpr(
            "l * CAST({w} AS BIGINT) + i AS src".format(w=W),
            "(l + 1) * CAST({w} AS BIGINT) + i AS dst".format(w=W),
            "CAST(1 + (i + l) % 5 AS BIGINT) AS w",
        )
        .unionByName(
            base.selectExpr(
                "l * CAST({w} AS BIGINT) + i AS src".format(w=W),
                "(l + 1) * CAST({w} AS BIGINT) + (i + 1) % {w} AS dst".format(w=W),
                "CAST(1 + (i + l) % 5 AS BIGINT) AS w",
            )
        )
        .localCheckpoint(eager=True)
    )
    seeds = spark.range(W).select(
        F.col("id").alias("node"), F.lit(0).cast("bigint").alias("dist")
    )

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


if __name__ == "__main__":
    main()
