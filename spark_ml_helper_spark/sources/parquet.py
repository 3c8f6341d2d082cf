"""Parquet sources: the ten driver-provided tables.

Storage is self-describing parquet (schema from footers — no inference
pass), read with the vectorized parquet reader; filters and column
projections placed on these DataFrames push down to the scan (assert with
``plans.explain_utils``).

Special case: ``events.ts`` is parquet TIMESTAMP(NANOS, ntz) which Spark 4
cannot read natively (FIXTURES.md "events"); with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as LongType nanos
and we floor-divide to micros — exactly what DuckDB's native nanos→micros
read does — then cast to timestamp_ntz (session is pinned to UTC so the
cast is identity on the stored value).

Scale note (100 TB): at the design target each "table" is a directory of
many files, possibly partitioned; ``spark.read.parquet`` handles both
identically. Nothing here collects to the driver; schema-only reads are
footer metadata ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_helper_spark.session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, applying per-table ingestion fixes."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros floor division (integer `div`, NOT double `/`:
        # nanos ~1.7e18 exceeds double's 2^53 integer range), then to NTZ.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all ten tables and register them as temp views (mirrors the
    DuckDB oracle side, which pre-registers the same view names)."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
