"""UDF / UDAF / UDTF surface — SURVEY.md §2.J.

The sanctioned escape hatches, each in its fastest public form:
- scalar Python UDF (row-at-a-time — kept ONLY as the API demonstration;
  the pandas UDF below is the production form),
- Arrow-vectorized pandas UDF (~10-100× the row form),
- grouped UDAF via applyInPandas (Arrow batch per group),
- Python UDTF (Spark ≥3.5) in a LATERAL join.

Every one of these still runs inside the distributed plan — Python workers
per partition, Arrow exchange, no driver-side loops.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table


@query(
    "udf_python",
    oracle="""
        SELECT doc_id, upper(trim(regexp_replace(text, ' +', ' ', 'g'))) AS clean
        FROM documents
    """,
    family="udfs",
)
def udf_python(spark, sf_dir):
    """Scalar Python UDF: whitespace-normalize + uppercase. (The logic is
    SQL-expressible on purpose — that's what makes it oracle-checkable;
    production code would use the built-ins.)"""

    @F.udf(returnType=StringType())
    def clean(s: str) -> str:
        return " ".join(s.split()).upper()

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", clean("text").alias("clean"))


@query(
    "udf_pandas",
    oracle="""
        SELECT vec_id,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 6) AS dot_self
        FROM embeddings
    """,
    family="udfs",
)
def udf_pandas(spark, sf_dir):
    """Arrow-vectorized pandas UDF: squared L2 norm via numpy over the
    Arrow batch. Numerically identical to the HOF form at 6 decimals."""
    import numpy as np

    @F.pandas_udf("double")
    def dot_self(emb: pd.Series) -> pd.Series:
        return emb.map(lambda v: round(float(np.asarray(v, dtype=np.float64) @ np.asarray(v, dtype=np.float64)), 6))

    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", dot_self("embedding").alias("dot_self"))


@query(
    "udf_arrow",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
               CAST(length(text) AS INTEGER) AS n_chars_m
        FROM documents
    """,
    family="udfs",
)
def udf_arrow(spark, sf_dir):
    """Arrow-optimized scalar Python UDF (Spark 3.5+/4 `useArrow=True`):
    same row-at-a-time author experience as udf_python but the data
    crosses the boundary as Arrow batches instead of pickled rows —
    measured ~2-5x on string-heavy inputs. The third Python-UDF execution
    mode next to pickled (udf_python) and pandas-vectorized (udf_pandas)."""

    @F.udf(returnType="int", useArrow=True)
    def n_words(s: str) -> int:
        return len(s.split(" "))

    @F.udf(returnType="int", useArrow=True)
    def n_chars(s: str) -> int:
        return len(s)

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", n_words("text").alias("n_words"), n_chars("text").alias("n_chars_m"))


@query(
    "udaf_grouped",
    oracle="""
        SELECT label,
               count(*) AS n,
               min(vec_id) AS min_id,
               max(vec_id) AS max_id,
               round(avg(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS mean_norm
        FROM embeddings
        GROUP BY label
    """,
    family="udfs",
)
def udaf_grouped(spark, sf_dir):
    """Grouped custom aggregation via applyInPandas: per-label count, id
    range, and mean embedding norm (numpy inside the Arrow group batch).
    Scale note: applyInPandas shuffles whole groups to one worker — fine
    for bounded groups (10 labels), wrong for unbounded ones; bounded-state
    alternatives are the HOF aggregates."""
    import numpy as np

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        embs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((embs * embs).sum(axis=1))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n": [len(pdf)],
                "min_id": [int(pdf["vec_id"].min())],
                "max_id": [int(pdf["vec_id"].max())],
                "mean_norm": [round(float(norms.mean()), 6)],
            }
        )

    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        stats, schema="label int, n bigint, min_id bigint, max_id bigint, mean_norm double"
    )


@query(
    "udtf_python",
    oracle="""
        SELECT doc_id,
               unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS pos,
               unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    """,
    family="udfs",
)
def udtf_python(spark, sf_dir):
    """Python UDTF exploding each document into (doc_id, pos, token) rows,
    invoked in a LATERAL join (Spark ≥3.5 table-function API)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.lower().split(" ")):
                yield i + 1, tok

    spark.udtf.register("smhs_tokenize", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM documents d, LATERAL smhs_tokenize(d.text) t"
    )
