"""Exact set-similarity join (Jaccard ≥ τ) with PPJoin-style prefix
filtering — subquadratic candidate generation that is still EXACT, unlike
MinHash banding (probabilistic recall).

Algorithm (all DataFrame ops, no UDFs):
1. Collapse identical element sets to one representative (identical sets
   otherwise multiply every later stage).
2. Build a global element order: rarest-first by corpus frequency. Elements
   are replaced by their integer rank — Jaccard over rank sets equals
   Jaccard over the original sets (the mapping is a bijection), and int
   intersects are ~2-3x cheaper than string intersects.
3. Prefix filter: with sets sorted rarest-first, any pair with
   |A∩B| ≥ o must share an element within the first |A|−o+1 / |B|−o+1
   elements. J(A,B) ≥ τ implies o ≥ ⌈τ·|A|⌉, so exploding only each set's
   (|A| − ⌈τ|A|⌉ + 1)-element prefix and equi-joining on the element rank
   yields a candidate set with NO false negatives. Rare elements have
   short postings lists, so candidates ≪ n²/2.
4. Length filter: J ≥ τ forces τ·|A| ≤ |B| ≤ |A|/τ — applied inside the
   candidate join before any intersect is computed.
5. Exact Jaccard rescore on candidates; expand representatives back to
   doc-level pairs (same-set pairs are J=1 by construction).

Scale: the shuffle keys are the element rank (posting lists), the set key,
and the doc id — never the pair space. The global rank assignment is a
window over the element VOCABULARY (bounded, ≪ corpus); at extreme vocab
sizes swap it for a sorted zipWithIndex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_jaccard_pairs(sets: DataFrame, tau: float, out_col: str) -> DataFrame:
    """``sets``: (doc_id, elems array<string> — distinct elements).
    Returns (a_id, b_id, <out_col>) for every pair with exact
    Jaccard(elems_a, elems_b) ≥ tau, out_col rounded to 6 decimals."""
    # empty sets have undefined Jaccard (0/0) — the oracle form's NULL
    # comparison drops them, so drop them here too
    canon = sets.filter(F.size("elems") > 0).select("doc_id", F.sort_array("elems").alias("elems"))
    reps = canon.groupBy("elems").agg(F.min("doc_id").alias("rep_id"))
    membership = canon.join(reps, "elems").select("doc_id", "rep_id")
    rep_sets = reps.select("rep_id", "elems")

    vocab = (
        rep_sets.select(F.explode("elems").alias("elem"))
        .groupBy("elem")
        .agg(F.count("*").alias("freq"))
        .withColumn("rank", F.row_number().over(Window.orderBy("freq", "elem")))
        .select("elem", "rank")
    )
    ranked = (
        rep_sets.select("rep_id", F.explode("elems").alias("elem"))
        .join(vocab, "elem")
        .groupBy("rep_id")
        .agg(F.sort_array(F.collect_list("rank")).alias("ranks"))
        .withColumn("n", F.size("ranks"))
        .withColumn(
            "prefix",
            F.expr(f"slice(ranks, 1, n - cast(ceil({tau} * n) as int) + 1)"),
        )
    )
    post = ranked.select(
        "rep_id", "n", F.posexplode("prefix").alias("p0", "r")
    ).select("rep_id", "n", (F.col("p0") + 1).alias("p"), "r")
    a = post.select(F.col("rep_id").alias("ra"), F.col("n").alias("na"), F.col("p").alias("pa"), "r")
    b = post.select(F.col("rep_id").alias("rb"), F.col("n").alias("nb"), F.col("p").alias("pb"), "r")
    # positional filter (PPJoin): for the earliest shared element at 1-based
    # positions (pa, pb), |A∩B| ≤ min(na−pa, nb−pb) + 1, and J ≥ τ demands
    # |A∩B| ≥ τ/(1+τ)·(na+nb). Later shared elements only shrink the bound,
    # so a pair survives iff its earliest match passes — no false negatives.
    alpha = F.ceil(F.lit(tau / (1.0 + tau)) * (F.col("na") + F.col("nb")))
    cand = (
        a.join(b, "r")
        .filter(
            (F.col("ra") < F.col("rb"))
            & (F.col("nb") * tau <= F.col("na"))
            & (F.col("na") * tau <= F.col("nb"))
            & (F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")) + 1 >= alpha)
        )
        .select("ra", "rb")
        .distinct()
    )
    inter = F.size(F.array_intersect("a_ranks", "b_ranks")).cast("double")
    union = F.size("a_ranks") + F.size("b_ranks") - F.size(F.array_intersect("a_ranks", "b_ranks"))
    jac = inter / union
    rep_pairs = (
        cand.join(ranked.select(F.col("rep_id").alias("ra"), F.col("ranks").alias("a_ranks")), "ra")
        .join(ranked.select(F.col("rep_id").alias("rb"), F.col("ranks").alias("b_ranks")), "rb")
        .withColumn(out_col, F.round(jac, 6))
        .filter(jac >= tau)
        .select("ra", "rb", out_col)
    )
    cross = (
        rep_pairs.join(membership.select(F.col("rep_id").alias("ra"), F.col("doc_id").alias("da")), "ra")
        .join(membership.select(F.col("rep_id").alias("rb"), F.col("doc_id").alias("db")), "rb")
        .select(F.least("da", "db").alias("a_id"), F.greatest("da", "db").alias("b_id"), out_col)
    )
    m1 = membership.select("rep_id", F.col("doc_id").alias("a_id"))
    m2 = membership.select("rep_id", F.col("doc_id").alias("b_id"))
    within = (
        m1.join(m2, "rep_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(F.lit(1.0), 6).alias(out_col))
    )
    return cross.unionByName(within)
