"""graph_kcore delta-peel scale probe (SCALE.md evidence).

The fixture's k-core converges in <= 4 rounds, so it cannot show what
delta peeling buys. This probe builds the adversarial shape — a RING
core of N nodes (each node connected to i±1, i±2: degree exactly 4,
never peels at k=4) with a STAIRCASE tail of M nodes (each connected to
its 3 predecessors, anchored on three ring nodes: the end node has
degree 3 and peels, dropping its predecessor to degree 3, and so on —
exactly ONE node peels per round, the textbook worst case for
whole-set re-peeling) — and runs both peel forms:

- WHOLE-SET (the shape the oracle CTE chain mirrors): every round
  re-semi-joins the ENTIRE edge list against the survivor set twice —
  ~2·|E| joined rows × M rounds;
- DELTA (``kcore_fixpoint``): every round semi-joins the edge list
  against the one removed node — O(degree) joined rows per round, each
  edge charged at most once across the run.

Both must produce identical cores (asserted by count + degree-sum).

Usage: python -m tools.scale_probe_kcore [ring_n] [stair_m]
       (default 200000 40)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    K = 4
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.graph import kcore_fixpoint
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-kcore-probe")

    ring = spark.range(N).selectExpr("id AS i")
    ring_e = None
    for d in (1, 2):
        e = ring.selectExpr(f"i AS src", f"(i + {d}) % {N} AS dst")
        ring_e = e if ring_e is None else ring_e.unionByName(e)
    # staircase node t (id N+t) -> its 3 predecessors (ring 0,1,2 anchor)
    stair = spark.range(M).selectExpr("id AS t")
    stair_e = None
    for b in (1, 2, 3):
        e = stair.selectExpr(
            f"CAST({N} AS BIGINT) + t AS src",
            f"CASE WHEN t - {b} >= 0 THEN CAST({N} AS BIGINT) + t - {b} "
            f"ELSE CAST({b} - t - 1 AS BIGINT) END AS dst",
        )
        stair_e = e if stair_e is None else stair_e.unionByName(e)
    fwd = ring_e.unionByName(stair_e)
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    n_edges = edges.count()

    def summarize(deg):
        r = deg.agg(F.count("*").alias("n"), F.sum("k").alias("s")).first()
        return (r["n"], r["s"])

    t0 = time.time()
    deg_delta, rounds = kcore_fixpoint(edges, K, max_rounds=M + 3)
    sig_delta = summarize(deg_delta)
    t_delta = round(time.time() - t0, 2)

    # whole-set re-peel (the oracle-chain shape), to the same fixpoint
    t0 = time.time()
    alive = edges.select(F.col("src").alias("node")).distinct()
    prev_n = alive.count()
    ws_rounds = 0
    while True:
        ws_rounds += 1
        nxt = (
            edges.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").cast("bigint").alias("k"))
            .filter(F.col("k") >= K)
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        if n == prev_n:
            break
        alive, prev_n = nxt.select("node"), n
        if ws_rounds > M + 3:
            raise RuntimeError("whole-set peel failed to converge")
    sig_ws = summarize(nxt.select("node", "k"))
    t_ws = round(time.time() - t0, 2)

    assert sig_ws == sig_delta, (sig_ws, sig_delta)
    print(
        json.dumps(
            {
                "probe": "kcore_delta_peel",
                "ring_n": N,
                "stair_m": M,
                "n_edges_directed": n_edges,
                "peel_rounds": rounds,
                "t_delta_s": t_delta,
                "t_whole_set_s": t_ws,
                "whole_set_rounds": ws_rounds,
                "joined_rows_whole_set": 2 * n_edges * ws_rounds,
                "joined_rows_delta_bound": n_edges,
                "core_signature": sig_delta,
            }
        )
    )


if __name__ == "__main__":
    main()
