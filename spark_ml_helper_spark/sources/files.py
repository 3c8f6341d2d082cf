"""Non-parquet file sources: CSV, JSON-lines, and XML readers.

(Format-availability probe, round 5: Avro is Spark's one remaining
built-in-but-EXTERNAL module — `format("avro")` fails without the
spark-avro jar, which this offline container cannot fetch; XML became a
true built-in in Spark 4.0 and is covered by source_xml below.)

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
from spark_ml_helper_spark.session import staging_dir
from spark_ml_helper_spark.sources.parquet import table

_STAGED: dict[tuple[str, str], str] = {}


def _stage(spark, sf_dir: str, fmt: str):
    """Write customer once per (sf_dir, fmt) into a temp dir; return path."""
    key = (sf_dir, fmt)
    if key not in _STAGED:
        out = os.path.join(staging_dir(prefix=f"smhs_src_{fmt}_"), "customer")
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


@query(
    "source_pyds",
    oracle="""
        SELECT i AS id,
               CAST(i % 7 AS INTEGER) AS bucket,
               round((i * 31 % 1000) / 10.0, 6) AS score
        FROM range(0, 20000) r(i)
    """,
    family="sources",
)
def source_pyds(spark, sf_dir):
    """Custom PYTHON DATA SOURCE (Spark 4 `pyspark.sql.datasource` API):
    a deterministic synthetic generator registered as a named format and
    read through the normal `spark.read.format(...).load()` path, with
    REAL partition planning — `partitions()` returns 8 splits and each
    executor reads only its stripe, so the source scales out like any
    file source. This is the extension point for reading systems Spark
    has no built-in connector for (internal APIs, custom binary stores);
    the generator stands in for the external system, and the DuckDB
    range() oracle proves the partition-striped read reassembles the
    exact row set."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    N, PARTS = 20000, 8

    class _Reader(DataSourceReader):
        def partitions(self):
            return [InputPartition(p) for p in range(PARTS)]

        def read(self, partition):
            chunk = N // PARTS
            p = partition.value
            lo, hi = p * chunk, N if p == PARTS - 1 else (p + 1) * chunk
            for i in range(lo, hi):
                yield (i, i % 7, round((i * 31 % 1000) / 10.0, 6))

    class SyntheticSource(DataSource):
        @classmethod
        def name(cls):
            return "smhs_synthetic"

        def schema(self):
            return "id bigint, bucket int, score double"

        def reader(self, schema):
            return _Reader()

    spark.dataSource.register(SyntheticSource)
    return spark.read.format("smhs_synthetic").load()


@query(
    "source_schema_evolution",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS price,
               CAST(NULL AS VARCHAR) AS priority
        FROM orders WHERE year(o_orderdate) <= 1995
        UNION ALL
        SELECT o_orderkey, round(o_totalprice, 2), o_orderpriority
        FROM orders WHERE year(o_orderdate) > 1995
    """,
    family="sources",
)
def source_schema_evolution(spark, sf_dir):
    """Schema evolution on read: two parquet batches written with
    DIFFERENT schemas (the later batch adds a `priority` column) read as
    one table with mergeSchema=true — old rows surface NULL for the added
    column. This is the additive-column contract every long-lived lake
    table relies on; without mergeSchema the scan would pin whichever
    footer it sampled first. (Column REMOVAL/retype needs a table format
    with real schema enforcement — Delta/Iceberg — not plain parquet.)"""
    out = os.path.join(staging_dir(prefix="smhs_evo_"), "orders_evo")
    o = table(spark, sf_dir, "orders")
    old = o.filter(F.year("o_orderdate") <= 1995).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    new = o.filter(F.year("o_orderdate") > 1995).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    old.write.mode("overwrite").parquet(os.path.join(out, "batch=0"))
    new.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    return (
        spark.read.option("mergeSchema", True)
        .parquet(out)
        .select("o_orderkey", "price", "priority")
    )


@query(
    "source_binary_files",
    oracle="""
        SELECT CAST(doc_id AS VARCHAR) || '.txt' AS fname,
               CAST(n_chars AS BIGINT) AS n_bytes,
               text AS decoded
        FROM documents WHERE doc_id < 100
    """,
    family="sources",
)
def source_binary_files(spark, sf_dir):
    """The multimodal ingestion front door: Spark's `binaryFile` source
    reads a directory of opaque files into (path, modificationTime,
    length, content binary) rows — the layout every image/audio corpus
    lands in before decode UDFs run. Fixture: the first 100 documents
    staged as one .txt file each; the read-back bytes are UTF-8-decoded
    and hash-checked against the source table (filename ↔ doc_id, length
    ↔ n_chars, content ↔ text — proving content arrives bit-exact).
    Scale notes: binaryFile is file-granular (one file = one row, files
    > 2 GB unsupported), listing is driver-side — at 100 TB point it at
    partitioned prefixes and raise
    spark.sql.sources.parallelPartitionDiscovery.threshold; decode
    stays in Arrow-batched UDFs downstream (see multimodal ops), never
    in the source."""
    import os
    import tempfile

    key = (sf_dir, "binary")
    if key not in _STAGED:
        out = staging_dir(prefix="smhs_src_bin_")
        rows = (
            table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100)
            .select("doc_id", "text")
            .collect()  # 100 tiny rows — fixture staging only, not a data path
        )
        for r in rows:
            data = r.text.encode("utf-8")
            # The oracle equates file byte length with n_chars, which only
            # holds for ASCII; assert it at staging time so a future
            # non-ASCII fixture fails loudly here, not as an oracle
            # hash-mismatch (ADVICE r2).
            assert len(data) == len(r.text), f"non-ASCII text in doc {r.doc_id}"
            with open(os.path.join(out, f"{r.doc_id}.txt"), "wb") as f:
                f.write(data)
        _STAGED[key] = out
    return (
        spark.read.format("binaryFile")
        .load(_STAGED[key])
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
            F.col("length").alias("n_bytes"),
            F.col("content").cast("string").alias("decoded"),
        )
    )


@query(
    "sink_pyds",
    oracle="""
        SELECT n_name, CAST(n_nationkey AS BIGINT) AS nationkey
        FROM nation
    """,
    family="sources",
)
def sink_pyds(spark, sf_dir):
    """Custom Python Data Source WRITER (the other half of source_pyds'
    Spark 4 `pyspark.sql.datasource` surface): a `DataSourceWriter` whose
    `write(iterator)` runs once per partition on the executors and
    commits per-partition results through `WriterCommitMessage` —
    Spark's two-phase commit for arbitrary external systems (each task
    stages, the driver's `commit()` sees every message, aborts discard).
    The fixture sink appends each partition to a task-unique local file;
    the query then reads the committed files back and must reproduce the
    source rows exactly. (The shared-filesystem read-back is a local-mode
    fixture convenience — on a cluster the writer targets the external
    system itself, which is the point of the API.) This is the extension
    point for writing to systems with no built-in connector — internal
    KV stores, feature stores, custom wire formats."""
    import glob
    import json as _json
    import os
    import tempfile

    from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

    out_dir = staging_dir(prefix="smhs_sink_pyds_")

    class _Writer(DataSourceWriter):
        def __init__(self, path):
            self.path = path

        def write(self, iterator):
            import uuid as _uuid

            rows = [{"n_name": r.n_name, "nationkey": r.nationkey} for r in iterator]
            fname = os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
            if rows:
                with open(fname, "w") as f:
                    for row in rows:
                        f.write(_json.dumps(row) + "\n")
            return WriterCommitMessage()

    class KVSink(DataSource):
        @classmethod
        def name(cls):
            return "smhs_kv_sink"

        def writer(self, schema, overwrite):
            return _Writer(self.options["path"])

    spark.dataSource.register(KVSink)
    (
        table(spark, sf_dir, "nation")
        .select("n_name", F.col("n_nationkey").cast("bigint").alias("nationkey"))
        .write.format("smhs_kv_sink")
        .option("path", out_dir)
        .mode("append")
        .save()
    )
    committed = sorted(glob.glob(os.path.join(out_dir, "part-*.jsonl")))
    return spark.read.schema("n_name string, nationkey bigint").json(committed)


@query(
    "source_csv_corrupt",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE c_custkey % 50 = 0) AS BIGINT)
                   AS n_corrupt,
               CAST(count(*) FILTER (WHERE c_custkey % 50 <> 0) AS BIGINT)
                   AS n_good,
               CAST(sum(c_custkey) FILTER (WHERE c_custkey % 50 <> 0)
                    AS BIGINT) AS sum_good_keys
        FROM customer
    """,
    family="sources",
)
def source_csv_corrupt(spark, sf_dir):
    """Malformed-input handling on the CSV read path: stage customer
    with every 50th row DELIBERATELY CORRUPTED (a non-numeric key —
    the classic upstream-export bug), read in PERMISSIVE mode with a
    `_corrupt_record` column, and report good/corrupt/total counts —
    the quarantine pattern that keeps a 100 TB ingest alive when 0.1%
    of rows are garbage (FAILFAST would kill the job; DROPMALFORMED
    would LIE about volumes). The corruption is deterministic
    (key % 50), so the oracle knows exactly which rows must land in
    quarantine; the sum over surviving keys proves good rows parse
    intact. PERMISSIVE needs the corrupt column NOT pruned away — the
    implementation counts via the materialized frame, the documented
    Spark subtlety (SPARK-38523: referencing _corrupt_record alone
    over a pruned parse is disallowed)."""
    out = os.path.join(staging_dir(prefix="smhs_src_corrupt_"), "customer")
    c = table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 50 == 0, F.lit("BADKEY"))
        .otherwise(F.col("c_custkey").cast("string"))
        .alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    c.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(out)
    schema = _CUSTOMER_SCHEMA + ", _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .cache()  # SPARK-38523: don't query _corrupt_record off a pruned parse
    )
    good = F.col("_corrupt_record").isNull() & F.col("c_custkey").isNotNull()
    res = df.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(~good, 1)).alias("n_corrupt"),
        F.count(F.when(good, 1)).alias("n_good"),
        F.sum(F.when(good, F.col("c_custkey"))).alias("sum_good_keys"),
    )
    return res


@query("source_xml", oracle=_ORACLE, family="sources")
def source_xml(spark, sf_dir):
    """XML source — Spark 4's BUILT-IN xml data source (the spark-xml
    package was folded into core in 4.0; no external jar): stage
    customer to one-row-per-<customer>-element XML via the xml WRITER,
    read it back with an explicit schema and rowTag, filter + project.
    Same lossless round-trip proof as source_csv — the oracle reads the
    original parquet, so element escaping, float formatting, and the
    row-tag walk all have to survive the text round trip. Scale note:
    XML scan parallelism is per-file (multi-line documents can't split
    on newlines the way JSONL does), so the stage writes many part
    files — at 100 TB keep XML inputs sharded or convert-once to
    parquet (compact_small_files is the repair tool)."""
    key = (sf_dir, "xml")
    if key not in _STAGED:
        out = os.path.join(staging_dir(prefix="smhs_src_xml_"), "customer")
        (
            table(spark, sf_dir, "customer")
            .write.mode("overwrite")
            .option("rowTag", "customer")
            .format("xml")
            .save(out)
        )
        _STAGED[key] = out
    df = (
        spark.read.schema(_CUSTOMER_SCHEMA)
        .option("rowTag", "customer")
        .format("xml")
        .load(_STAGED[key])
    )
    return df.filter(F.col("c_acctbal") > 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    )
