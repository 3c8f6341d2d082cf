"""Physical-plan inspection utilities.

The engine's scale posture (pushdown reaches the scan, dims broadcast,
aggs have partial phases, no accidental nested-loop joins) is a property
of the PLAN, not of any test dataset — these helpers extract that
evidence from a DataFrame so tests and tools can assert it. Used by the
CI plan audit (tests/test_pipeline.py) and `python -m tools.plan_report`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `explain("formatted")` text, without printing to stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(df: DataFrame) -> dict:
    """One-line health summary of a DataFrame's physical plan.

    Keys: exchanges (shuffle boundaries), reused_exchanges,
    broadcast_joins / sortmerge_joins / nested_loop_joins /
    cartesian_products, partial_aggs (HashAggregate nodes before the
    final merge — partial→final pairs show up as 2 nodes per agg),
    codegen_spans (WholeStageCodegen regions), parquet_scans, and
    scans_with_pushdown (scans whose PushedFilters is non-empty).
    """
    plan = explain_formatted(df)
    # count TREE nodes "(n) Op", not the details section that repeats
    # each operator name as a header. Node names are matched by PREFIX:
    # a catalog-qualified scan renders as e.g.
    # "(1) Scan parquet spark_catalog.db.t" and must still count as a
    # parquet scan (exact-equality matching silently read 0 for those).
    nodes = [n.strip() for n in re.findall(r"\(\d+\) ([A-Za-z][A-Za-z_. ]*)", plan)]

    def count_prefix(prefix: str) -> int:
        return sum(1 for n in nodes if n == prefix or n.startswith(prefix + " "))

    pushed = re.findall(r"PushedFilters: \[(?!\])", plan)
    return {
        "exchanges": count_prefix("Exchange"),
        "reused_exchanges": count_prefix("ReusedExchange"),
        "broadcast_joins": count_prefix("BroadcastHashJoin"),
        "sortmerge_joins": count_prefix("SortMergeJoin"),
        "nested_loop_joins": count_prefix("BroadcastNestedLoopJoin"),
        "cartesian_products": count_prefix("CartesianProduct"),
        "partial_aggs": count_prefix("HashAggregate"),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "parquet_scans": count_prefix("Scan parquet"),
        "scans_with_pushdown": len(pushed),
    }


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — the column-pruning evidence:
    a scan that reads all columns for a two-column projection is wrong."""
    plan = explain_formatted(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def has_nested_loop(df: DataFrame) -> bool:
    return "BroadcastNestedLoopJoin" in explain_formatted(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in explain_formatted(df)
