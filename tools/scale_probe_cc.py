"""High-diameter connected-components scale probe (SCALE.md evidence).

Builds a PATH graph — the adversarial diameter shape for iterative CC:
N nodes chained 0-1-2-...-N, diameter N — and runs both CC engines:

- ``min_label_fixpoint`` (graph.py): min-label propagation WITH path
  halving (each round also hops through the current label), so rounds
  are O(log N) rather than O(N); forced onto its distributed code path
  (``small_graph_nodes=0``) so the probe measures the cluster-shape
  loop, not the single-task union-find shortcut.
- ``largestar_fixpoint`` (graph.py): alternating large-star/small-star
  (Kiveris et al. 2014), O(log N) rounds by construction.

Both must converge to ONE component labeled 0, and the probe records
rounds + wall-clock for each at two path lengths so the round-growth
claim (log, not linear) is measured, not asserted.

Usage: python -m tools.scale_probe_cc [N]     (default 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.operators.graph import (
        largestar_fixpoint,
        min_label_fixpoint,
    )
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for nodes in (n // 10, n):
        path = spark.range(nodes - 1).select(
            F.col("id").alias("lo"), (F.col("id") + 1).alias("hi")
        )
        canon = path.select("hi", "lo").localCheckpoint(eager=True)
        bidir = (
            path.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionByName(path.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
            .localCheckpoint(eager=True)
        )

        t0 = time.time()
        labels, ls_rounds = largestar_fixpoint(canon)
        ls_comp = labels.select("lab").distinct().count()
        ls = {
            "algo": "largestar",
            "nodes": nodes,
            "rounds": ls_rounds,
            "wall_s": round(time.time() - t0, 2),
            "components": ls_comp,
        }
        print(json.dumps(ls), flush=True)

        t0 = time.time()
        labels2, ml_rounds = min_label_fixpoint(bidir, max_rounds=200, small_graph_nodes=0)
        ml_comp = labels2.select("lab").distinct().count()
        ml = {
            "algo": "minlabel_pathhalving",
            "nodes": nodes,
            "rounds": ml_rounds,
            "wall_s": round(time.time() - t0, 2),
            "components": ml_comp,
        }
        print(json.dumps(ml), flush=True)
        assert ls_comp == ml_comp == 1, (ls_comp, ml_comp)


if __name__ == "__main__":
    main()
