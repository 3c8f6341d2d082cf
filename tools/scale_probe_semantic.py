"""SemDeDup cell-restriction scale probe (SCALE.md evidence).

dedup_semantic's whole scale claim is that restricting the quadratic
cosine search to k-means cells shrinks the pair space from n² to
Σ|cell|². This probe MEASURES that at 10× the sf0.1 embedding count:
replicate embeddings with shifted vec_ids (the standard disjoint-shift
recipe — replicas land in the same cells because the vectors are
identical), train the shared Lloyd chain once, then compare

- global pair space n·(n−1)/2 vs within-cell Σ|cell|·(|cell|−1)/2
  (exact, from the trained assignment), and
- measured candidate-pair counts from ``block_pair_candidates`` with
  and without ``key_col='cluster'`` at the operator's tau, plus wall
  time for each, so the shrinkage is recorded as observed candidate
  volume too, not just arithmetic.

Usage: python -m tools.scale_probe_semantic [replication]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from spark_ml_helper_spark.functions.blockpairs import (
        block_pair_candidates,
        threshold_kernel,
    )
    from spark_ml_helper_spark.functions.vector_math import l2_norm
    from spark_ml_helper_spark.operators.vectors import _SEMDEDUP_TAU, _km_train
    from spark_ml_helper_spark.session import get_spark

    spark = get_spark(app_name="smhs-semantic-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base.count()
    reps = spark.range(rep).select(F.col("id").alias("r"))
    big = (
        base.crossJoin(reps)
        .select((F.col("vec_id") + F.col("r") * n_base).alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    big.createOrReplaceTempView("probe_embeddings")
    n = big.count()

    # Train on the replicated corpus via a staged parquet dir so _km_train's
    # table() call sees it as the embeddings table.
    stage = "/tmp/semantic_probe_stage"
    big.write.mode("overwrite").parquet(f"{stage}/embeddings.parquet")
    t0 = time.time()
    _, _, final = _km_train(spark, stage)
    v = final.select(
        "vec_id",
        F.col("emb").alias("embedding"),
        l2_norm(F.col("emb")).alias("nrm"),
        "cluster",
    ).localCheckpoint(eager=True)
    t_train = time.time() - t0

    cells = v.groupBy("cluster").count().collect()
    global_pairs = n * (n - 1) // 2
    cell_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in cells)

    t0 = time.time()
    n_cand_cell = block_pair_candidates(
        spark, v, threshold_kernel(_SEMDEDUP_TAU), key_col="cluster"
    ).count()
    t_cell = time.time() - t0

    t0 = time.time()
    n_cand_global = block_pair_candidates(
        spark, v, threshold_kernel(_SEMDEDUP_TAU)
    ).count()
    t_global = time.time() - t0

    print(
        json.dumps(
            {
                "probe": "dedup_semantic_cell_restriction",
                "replication": rep,
                "n_vectors": n,
                "n_cells": len(cells),
                "max_cell": max(r["count"] for r in cells),
                "pair_space_global": global_pairs,
                "pair_space_within_cell": cell_pairs,
                "pair_space_shrink": round(global_pairs / max(cell_pairs, 1), 2),
                "cand_pairs_global": n_cand_global,
                "cand_pairs_within_cell": n_cand_cell,
                "t_train_s": round(t_train, 2),
                "t_cand_within_cell_s": round(t_cell, 2),
                "t_cand_global_s": round(t_global, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
