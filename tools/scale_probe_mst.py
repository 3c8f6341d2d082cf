"""graph_mst Borůvka edge-pruning scale probe (SCALE.md evidence).

The fixture co-occurrence graph converges in 2-3 Borůvka rounds on a
small edge list, so it cannot show what the r11 pruning buys. This
probe builds the adversarial shape — a PATH of N nodes with BINARY
TOURNAMENT weights (edge i→i+1 has w = 1 + v2(i+1), the 2-adic
valuation: weight-1 edges pair nodes up, weight-2 edges pair the
pairs, ...), so every round merges components strictly pairwise and
the loop runs the full log2 N rounds — and runs the SAME
``boruvka_msf`` loop with pruning on and off:

- UNPRUNED: every round joins the FULL |E| = N−1 edge list against the
  labels — Σ ≈ |E| · log2 N joined edge rows across the run;
- PRUNED (production): each round's edge list is the previous round's
  surviving cross edges, which shrink with the component count —
  Σ ≈ 2·|E| total (geometric series).

Both must produce the identical forest (asserted by count + weight sum
+ endpoint sums — the total order (w, lo, hi) makes it unique). The
per-round edge-frame sizes and wall clocks are recorded for SCALE.md.

Usage: python -m tools.scale_probe_mst [N]   (default 50000)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.graph import boruvka_msf
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-mst-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # path graph with binary-tournament weights: w(i) = 1 + v2(i+1).
    # Every component's min incident edge pairs it with exactly one
    # neighbor, so rounds = log2 N and min_label_fixpoint sees perfect
    # matchings (no long merge chains) — isolating the edge-list term.
    # Canonical generator (operators/graph_bench.py, paths=1 is the
    # single-path edge case of the bench bundle) — probe and band rows
    # share one generator by construction (round 14).
    from spark_ml_helper_spark.operators.graph_bench import mst_bench_inputs

    eu = mst_bench_inputs(spark, paths=1, path_len=n)

    def signature(msf):
        r = msf.agg(
            F.count("*").alias("n"),
            F.sum("w").alias("sw"),
            F.sum("lo").alias("sl"),
            F.sum("hi").alias("sh"),
        ).first()
        return (r["n"], r["sw"], r["sl"], r["sh"])

    results = {}
    for label, prune in (("pruned", True), ("unpruned", False)):
        counts: list[int] = []
        t0 = time.time()
        msf = boruvka_msf(eu, prune=prune, round_edge_counts=counts)
        sig = signature(msf)
        results[label] = {
            "wall_s": round(time.time() - t0, 2),
            "rounds": len(counts),
            "edge_rows_per_round": counts,
            "sum_edge_rows": sum(counts),
            "forest_signature": sig,
        }

    assert results["pruned"]["forest_signature"] == results["unpruned"][
        "forest_signature"
    ], (results["pruned"]["forest_signature"],
        results["unpruned"]["forest_signature"])
    # a path's spanning forest is the path itself
    assert results["pruned"]["forest_signature"][0] == n - 1
    print(
        json.dumps(
            {
                "probe": "mst_boruvka_pruning",
                "n_nodes": n,
                "pruned": results["pruned"],
                "unpruned": results["unpruned"],
                "edge_rows_ratio": round(
                    results["unpruned"]["sum_edge_rows"]
                    / max(results["pruned"]["sum_edge_rows"], 1),
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
