"""Projections, filters, predicates — SURVEY.md §2.B.

All expressions stay inside whole-stage codegen (built-in functions only);
simple comparison predicates additionally push down into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table


@query(
    "proj_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 6) AS net_price,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
        FROM lineitem
    """,
    family="filters",
)
def proj_compute(spark, sf_dir):
    """Computed/aliased projection (the TPC-H pricing expressions)."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
    )


@query(
    "filter_basic",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_totalprice BETWEEN 50000.0 AND 150000.0
          AND o_orderstatus IN ('O', 'F')
          AND o_custkey > 100
    """,
    family="filters",
)
def filter_basic(spark, sf_dir):
    """Comparison + AND/OR + BETWEEN + IN predicates (all parquet-pushable)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000.0, 150000.0)
        & F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_custkey") > 100)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


@query(
    "filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_name LIKE '%bolt%' OR regexp_matches(p_name, 'g(ear|izmo)')
    """,
    family="filters",
)
def filter_like(spark, sf_dir):
    """LIKE and regexp predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_name").rlike("g(ear|izmo)")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "filter_null",
    oracle="""
        WITH e AS (
            SELECT event_id,
                   CASE WHEN value < 5.0 THEN NULL ELSE value END AS v
            FROM events
        )
        SELECT event_id,
               (v IS NULL) AS is_missing,
               (v IS NOT DISTINCT FROM NULL) AS nullsafe_eq_null,
               coalesce(v, -1.0) AS v_filled
        FROM e
    """,
    family="filters",
)
def filter_null(spark, sf_dir):
    """IS NULL / null-safe equality / coalesce. The test tables contain no
    physical NULLs, so nulls are synthesized with a CASE first (same on the
    oracle side)."""
    e = table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 5.0, F.lit(None).cast("double")).otherwise(F.col("value"))
    return e.select(
        "event_id",
        v.isNull().alias("is_missing"),
        v.eqNullSafe(F.lit(None).cast("double")).alias("nullsafe_eq_null"),
        F.coalesce(v, F.lit(-1.0)).alias("v_filled"),
    )


@query(
    "proj_case",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000.0 THEN 'big'
                    WHEN o_totalprice > 150000.0 THEN 'mid'
                    ELSE 'small' END AS size_bucket
        FROM orders
    """,
    family="filters",
)
def proj_case(spark, sf_dir):
    """Conditional expression (CASE WHEN chain)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "big")
        .when(F.col("o_totalprice") > 150000.0, "mid")
        .otherwise("small")
        .alias("size_bucket"),
    )
