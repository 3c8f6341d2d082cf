"""Scans, sources, sinks — SURVEY.md §2.A.

Scale notes: parquet scans are the only data entry point; correctness of
pushdown here is what makes every downstream operator viable at 100 TB.
``scan_pruned`` is paired with an explain()-based test asserting
PushedFilters/ReadSchema actually reach the scan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table


@query(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    family="scans",
)
def scan_parquet(spark, sf_dir):
    """Full-fidelity parquet scan of the widest table (all columns)."""
    return table(spark, sf_dir, "lineitem")


@query(
    "scan_pruned",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 200000.0
    """,
    family="scans",
)
def scan_pruned(spark, sf_dir):
    """Column-pruned + predicate-pushed scan: only 2 of 6 columns read, and
    the filter reaches the parquet reader (verified via explain in tests)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "sink_parquet",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",
    family="scans",
)
def sink_parquet(spark, sf_dir):
    """Write → re-read round trip (parquet sink fidelity, incl. ntz
    timestamps). Scale note: on a cluster the write is the shuffle-free
    per-partition path; here we write to a temp dir and read it back."""
    out = tempfile.mkdtemp(prefix="smhs_sink_") + "/orders_roundtrip"
    df = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "source_json_col",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    family="scans",
)
def source_json_col(spark, sf_dir):
    """Parse a JSON-encoded string column (events.props = '{"k": <int>}').

    Uses get_json_object (JVM-side, codegen'd); at scale this beats any
    Python-side json.loads by orders of magnitude."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
