"""Distributed block-matrix pair scaffold for exact vector similarity.

Partition vectors into G blocks, build the G·(G+1)/2 block pairs, and hand
each pair of blocks to a vectorized numpy kernel via cogroup →
applyInPandas. The kernel only PRESELECTS candidate (a_id, b_id) pairs —
callers re-score candidates with the sequential JVM fold so final values
are bit-identical to a naive all-pairs plan (numpy matmul reassociates
floating-point sums; the rescore keeps the oracle contract).

Scale: O(n²/G²) work per task across G² tasks with BLAS inner loops; each
task holds two blocks in memory, so G is the memory dial. Shuffle keys are
block ids, never the pair space.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def block_pair_candidates(
    spark: SparkSession,
    v: DataFrame,
    kernel: Callable,
    n_blocks: int = 8,
    key_col: str | None = None,
) -> DataFrame:
    """``v``: (vec_id, embedding, nrm). ``kernel(sims, a_ids, b_ids)`` gets
    the raw float64 cosine matrix for one block pair — with invalid
    orientations already masked to -inf — and returns (row_idx, col_idx)
    index arrays of the entries to keep. Returns distinct candidate
    (a_id, b_id) pairs, canonically oriented a_id < b_id.

    ``key_col`` (r8, the SemDeDup shape): when given, ``v`` must carry
    that extra column and pairs are formed WITHIN each key group only —
    the cogroup key becomes (key, gi, gj), so the pair space shrinks
    from n² to Σ|cell|² while the per-task memory story (two blocks)
    and the BLAS inner loop are unchanged. With key_col=None the
    behavior (and the physical plan) is exactly the pre-r8 global
    form."""
    G = n_blocks
    blocks = v.withColumn("g", (F.col("vec_id") % G).cast("int"))
    # Re-alias the key on each side: a_side and b_side both derive from
    # `blocks`, so a bare key reference would carry the SAME attribute id
    # into the cogroup and trip Spark's ambiguous-self-join check; each
    # .alias() mints a fresh attribute.
    keys = [F.col(key_col).alias(key_col)] if key_col else []
    key_names = [key_col] if key_col else []

    def gpairs():
        base = (
            spark.range(G)
            .select(F.col("id").cast("int").alias("gi"))
            .crossJoin(spark.range(G).select(F.col("id").cast("int").alias("gj")))
            .filter(F.col("gi") <= F.col("gj"))
        )
        return base

    ga, gb = gpairs(), gpairs()
    a_side = ga.join(blocks, blocks.g == ga.gi).select(
        *keys, "gi", "gj", F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"), F.col("nrm").alias("a_nrm")
    )
    b_side = gb.join(blocks, blocks.g == gb.gj).select(
        *keys, "gi", "gj", F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )

    def apply_kernel(key, pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if pa.empty or pb.empty:
            return pd.DataFrame({"a_id": [], "b_id": []}).astype({"a_id": "int64", "b_id": "int64"})
        A = np.vstack(pa["a_emb"].to_numpy()).astype("float64")
        B = np.vstack(pb["b_emb"].to_numpy()).astype("float64")
        sims = (A @ B.T) / np.outer(pa["a_nrm"].to_numpy(), pb["b_nrm"].to_numpy())
        a_ids = pa["a_id"].to_numpy()
        b_ids = pb["b_id"].to_numpy()
        if key[-2] == key[-1]:
            # diagonal block holds both orientations — keep a_id < b_id
            sims[a_ids[:, None] >= b_ids[None, :]] = -np.inf
        ai, bj = kernel(sims, a_ids, b_ids)
        lo = np.minimum(a_ids[ai], b_ids[bj])
        hi = np.maximum(a_ids[ai], b_ids[bj])
        return pd.DataFrame({"a_id": lo, "b_id": hi})

    return (
        a_side.groupby(*key_names, "gi", "gj")
        .cogroup(b_side.groupby(*key_names, "gi", "gj"))
        .applyInPandas(apply_kernel, schema="a_id bigint, b_id bigint")
        .distinct()
    )


def topk_kernel(k: int):
    """Keep the k highest entries of the block (generous local margin for a
    global top-k: global winners rank ≤ k in their own block pair)."""

    def kernel(sims, a_ids, b_ids):
        import numpy as np

        kk = min(k, sims.size)
        flat = np.argpartition(sims, -kk, axis=None)[-kk:]
        ai, bj = np.unravel_index(flat, sims.shape)
        keep = sims[ai, bj] > -np.inf
        return ai[keep], bj[keep]

    return kernel


def threshold_kernel(tau: float, margin: float = 1e-6):
    """Keep entries ≥ tau − margin (margin absorbs matmul reassociation
    error, ~1e-13, so the exact rescore never misses a true pair)."""

    def kernel(sims, a_ids, b_ids):
        import numpy as np

        ai, bj = np.nonzero(sims >= tau - margin)
        return ai, bj

    return kernel
