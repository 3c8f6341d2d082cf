"""Reshape & profiling operators: pivot/unpivot, table profiling,
correlation matrix, one-hot encoding, confusion matrix — the
dataframe-utility surface of an ML-helper library.

All are SQL-oracled: pivots expand to CASE aggregates, unpivot to UNION
ALL, one-hot to boolean projections — so the driver hash-checks every one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_STATUSES = ["F", "O", "P"]


@query(
    "op_pivot",
    oracle=f"""
        SELECT n_nationkey,
               {', '.join(
                   f"round(coalesce(sum(c_acctbal) FILTER (c_mktsegment = '{s}'), 0.0), 6) AS bal_{s.lower()}"
                   for s in _SEGMENTS
               )}
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_nationkey
    """,
    family="reshape",
)
def op_pivot(spark, sf_dir):
    """Long→wide pivot: per-nation account balance split by market segment.
    Pivot values are pinned explicitly — at scale an unpinned pivot does an
    extra distinct-scan to discover them AND risks an unbounded column
    count; pinning makes the plan a single pass of CASE aggregates."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    wide = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum("c_acctbal"))
    )
    out = wide.select(
        "n_nationkey",
        *[F.round(F.coalesce(F.col(s), F.lit(0.0)), 6).alias(f"bal_{s.lower()}") for s in _SEGMENTS],
    )
    return out


@query(
    "op_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, round(val, 6) AS val
        FROM (
            SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
        )
    """,
    family="reshape",
)
def op_unpivot(spark, sf_dir):
    """Wide→long melt of three numeric measures (DataFrame.unpivot =
    Catalyst Expand node: one scan, rows×3 output — not three scans)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"], ["price", "discount", "tax"], "metric", "v"
    ).select("l_orderkey", "l_linenumber", "metric", F.round("v", 6).alias("val"))


@query(
    "profile_table",
    oracle="""
        SELECT 'o_custkey' AS col, count(*) AS n_rows, count(o_custkey) AS n_nonnull,
               count(DISTINCT o_custkey) AS n_distinct,
               round(min(o_custkey), 6) AS min_v, round(max(o_custkey), 6) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(o_totalprice),
               count(DISTINCT o_totalprice),
               round(min(o_totalprice), 6), round(max(o_totalprice), 6)
        FROM orders
    """,
    family="reshape",
)
def profile_table(spark, sf_dir):
    """Column profiling (row/non-null/distinct counts + range) — the
    first-look data-quality summary. One aggregate pass per scan; at scale
    swap exact distinct for approx_count_distinct (agg_approx_distinct)."""
    o = table(spark, sf_dir, "orders")
    profiles = []
    for col in ("o_custkey", "o_totalprice"):
        profiles.append(
            o.agg(
                F.lit(col).alias("col"),
                F.count("*").alias("n_rows"),
                F.count(col).alias("n_nonnull"),
                F.count_distinct(F.col(col)).alias("n_distinct"),
                F.round(F.min(col).cast("double"), 6).alias("min_v"),
                F.round(F.max(col).cast("double"), 6).alias("max_v"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


@query(
    "corr_matrix",
    oracle="""
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
               round(corr(l_quantity, l_discount), 6) AS qty_disc,
               round(corr(l_extendedprice, l_discount), 6) AS price_disc,
               round(corr(l_extendedprice, l_tax), 6) AS price_tax
        FROM lineitem
    """,
    family="reshape",
)
def corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of the numeric lineitem measures in
    one aggregate pass (each corr is a streaming moment computation —
    mergeable partials, no value buffer; MLlib Correlation gives the same
    numbers on a vector column)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_disc"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("price_tax"),
    )


@query(
    "feature_onehot",
    oracle=f"""
        SELECT o_orderkey,
               {', '.join(
                   f"CAST(o_orderstatus = '{s}' AS INTEGER) AS is_{s.lower()}"
                   for s in _STATUSES
               )}
        FROM orders
    """,
    family="reshape",
)
def feature_onehot(spark, sf_dir):
    """One-hot encode a categorical column with a pinned category list
    (OneHotEncoder equivalent, natively): per-row boolean projections,
    shuffle-free, and the category set is explicit — at scale an inferred
    vocabulary is a separate distinct-aggregation you run once and pin."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        *[(F.col("o_orderstatus") == s).cast("int").alias(f"is_{s.lower()}") for s in _STATUSES],
    )


@query(
    "ml_confusion",
    oracle="""
        WITH votes AS (
            SELECT e.label AS true_label,
                   CASE WHEN e.label <= 4 THEN e.label ELSE (e.label + 1) % 10 END AS pred_label
            FROM embeddings e
        )
        SELECT true_label, pred_label, count(*) AS n
        FROM votes
        GROUP BY true_label, pred_label
    """,
    family="reshape",
)
def ml_confusion(spark, sf_dir):
    """Confusion-matrix aggregation (true × predicted counts). The
    'predictions' here are a deterministic stand-in rule so the matrix
    itself is oracle-checkable; with a real model output column the
    aggregation is identical (groupBy two labels — one shuffle on a
    #classes² key space)."""
    e = table(spark, sf_dir, "embeddings")
    pred = F.when(F.col("label") <= 4, F.col("label")).otherwise((F.col("label") + 1) % 10)
    return (
        e.select(F.col("label").alias("true_label"), pred.alias("pred_label"))
        .groupBy("true_label", "pred_label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "op_flatten_nested",
    oracle="""
        SELECT l_orderkey,
               CAST(row_number() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_linenumber, l_quantity,
                                                l_extendedprice) - 1 AS BIGINT) AS pos,
               l_linenumber,
               round(l_quantity, 6) AS qty,
               round(l_extendedprice, 6) AS price
        FROM lineitem
    """,
    family="reshape",
)
def op_flatten_nested(spark, sf_dir):
    """Nested-document round trip: collapse each order's line items into a
    sorted array<struct> (the denormalized single-document shape lakes and
    event logs store), then flatten back to relational rows with
    posexplode — position exposed as a first-class column. array_sort on
    the struct (field order = sort key) pins element
    order — the synthetic lineitem reuses l_linenumber within an order,
    so the whole (linenumber, qty, price) tuple is the sort key; rows
    identical on all three are interchangeable, which keeps positions
    well-defined — and the flatten is the exact
    inverse of the nest: the oracle is simply the original rows with a
    windowed position. Both directions are one shuffle on the collection
    key; at scale the nested form is what you'd persist (co-locates a
    document's rows, prunes via struct-field pushdown) and this flatten
    is the read-path normalizer. Generated-column caveat: posexplode is an
    Expand-style generator — rows×|array| output with no extra shuffle."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("lines")
    )
    return nested.select(
        "l_orderkey", F.posexplode("lines").alias("pos", "ln")
    ).select(
        "l_orderkey",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("ln.l_linenumber").alias("l_linenumber"),
        F.round("ln.l_quantity", 6).alias("qty"),
        F.round("ln.l_extendedprice", 6).alias("price"),
    )
