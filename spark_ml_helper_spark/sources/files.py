"""Non-parquet file sources: CSV and JSON-lines readers.

The ingestion half of the ETL surface (the sink halves are sink_csv /
sink_json in operators/scale.py): stage a fixture table into the text
format once per sf_dir, then prove the READ path — explicit schema (never
inference at scale: schema inference is a full extra pass over 100 TB),
header/quote/escape handling for CSV, permissive-mode line parsing for
JSONL. The oracle reads the ORIGINAL parquet: a hash match proves the
text round-trip was lossless.

Scale notes:
- Both readers are splittable at the file level (and CSV/JSONL at line
  boundaries within uncompressed files), so a directory of files scans
  partition-parallel exactly like parquet — but with no column pruning,
  no predicate pushdown, and no row-group skipping. The operators keep a
  projection on top so Catalyst at least prunes parsed fields
  (CSV/JSON parsers in Spark prune unneeded fields from parsing).
- Money columns are 2-decimal doubles; both writers print them
  shortest-round-trip, so the read-back double is bit-identical and safe
  to hash against parquet without rounding.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table

_STAGED: dict[tuple[str, str], str] = {}


def _stage(spark, sf_dir: str, fmt: str):
    """Write customer once per (sf_dir, fmt) into a temp dir; return path."""
    key = (sf_dir, fmt)
    if key not in _STAGED:
        out = os.path.join(tempfile.mkdtemp(prefix=f"smhs_src_{fmt}_"), "customer")
        w = table(spark, sf_dir, "customer").write.mode("overwrite")
        if fmt == "csv":
            # header + explicit quoting (robust to delimiters in strings)
            w.option("header", True).option("quoteAll", True).csv(out)
        else:
            w.json(out)
        _STAGED[key] = out
    return _STAGED[key]


# exact on-disk schema (FIXTURES.md customer: 5 columns, c_nationkey INT32)
_CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)

_ORACLE = """
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > 0
"""


@query("source_csv", oracle=_ORACLE, family="sources")
def source_csv(spark, sf_dir):
    """CSV source: stage customer to quoted CSV-with-header, read it back
    with an EXPLICIT schema (no inference pass), filter + project. The
    oracle reads the original parquet — hash match proves the text
    round-trip (quoting, header, float formatting) is lossless."""
    path = _stage(spark, sf_dir, "csv")
    df = spark.read.schema(_CUSTOMER_SCHEMA).option("header", True).csv(path)
    return df.filter(F.col("c_acctbal") > 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@query("source_jsonl", oracle=_ORACLE, family="sources")
def source_jsonl(spark, sf_dir):
    """JSON-lines source: stage customer to JSONL, read back with an
    explicit schema (PERMISSIVE mode — malformed lines would land in a
    corrupt-record column rather than failing the scan at the 100 TB
    target). Same lossless round-trip proof as source_csv."""
    path = _stage(spark, sf_dir, "json")
    df = spark.read.schema(_CUSTOMER_SCHEMA).json(path)
    return df.filter(F.col("c_acctbal") > 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    )
