"""UDF-free vector math over array<float> columns.

Everything here is built from higher-order functions (zip_with / aggregate /
transform) — JVM-evaluated, codegen-friendly, zero Python in the data path.
All arithmetic is promoted to double and accumulates left-to-right, which is
exactly what DuckDB's list_sum/list_transform do — so results are bitwise
reproducible across both engines (then rounded to 6 decimals anyway).

Scale note: per-row vector ops are embarrassingly parallel (no shuffle).
The quadratic *pairing* around them is the scale hazard — see the LSH
operators for the sublinear path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (sequential left-to-right accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    """Σ aᵢ² as double."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity given precomputed norms (precompute per row once —
    never recompute norms inside a pair join)."""
    return dot(a, b) / (norm_a * norm_b)
