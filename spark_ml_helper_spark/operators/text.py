"""Text-analysis + deduplication operators — SURVEY.md §2.I (text half).

The training-data-pipeline surface: tokenize → n-grams → term stats →
TF-IDF → exact/near dedup. Tokenization is native split (JVM); TF-IDF is
implemented natively (exact, oracle-checkable) instead of MLlib HashingTF
(hash-bucketed, not comparable). Near-dup has two forms: the exact
quadratic Jaccard (ground truth at test scale) and MinHash-LSH (the 100 TB
path — sublinear candidate generation; its recall is measured against the
exact twin in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table


def _tokens(col="text"):
    return F.split(F.lower(F.col(col)), " ")


@query(
    "text_tokenize",
    oracle="""
        SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM documents
    """,
    family="text",
)
def text_tokenize(spark, sf_dir):
    """Lowercase + whitespace tokenization (per-row, shuffle-free)."""
    return table(spark, sf_dir, "documents").select("doc_id", _tokens().alias("toks"))


@query(
    "text_ngrams",
    oracle="""
        SELECT doc_id,
               list_transform(
                   range(1, len(string_split(lower(text), ' '))),
                   i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i + 1]
               ) AS bigrams
        FROM documents
    """,
    family="text",
)
def text_ngrams(spark, sf_dir):
    """Word bigrams via sequence+transform (Spark array indexing is 0-based
    in SQL expressions; guarded for <2-token docs where sequence() would
    reverse)."""
    d = table(spark, sf_dir, "documents").select("doc_id", _tokens().alias("toks"))
    return d.select(
        "doc_id",
        F.when(F.size("toks") < 2, F.expr("cast(array() as array<string>)"))
        .otherwise(
            F.expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))")
        )
        .alias("bigrams"),
    )


@query(
    "text_wordcount",
    oracle="""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        GROUP BY token
    """,
    family="text",
)
def text_wordcount(spark, sf_dir):
    """Corpus term frequencies (explode → hash agg; the shuffle carries one
    row per distinct term per map task thanks to partial aggregation)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_stats",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               round(avg(n_chars), 6) AS avg_chars,
               round(avg(len(string_split(text, ' '))), 6) AS avg_toks
        FROM documents
        GROUP BY lang, source
    """,
    family="text",
)
def text_stats(spark, sf_dir):
    """Per-(lang, source) document statistics."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.col("text"), " ")).cast("bigint")), 6).alias("avg_toks"),
    )


@query(
    "text_tfidf",
    oracle="""
        WITH tf AS (
            SELECT doc_id, token AS term, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents)
            GROUP BY doc_id, token
        ),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * (ln((n.n_docs + 1.0) / (dft.df + 1.0)) + 1.0), 6) AS score
        FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
    """,
    family="text",
)
def text_tfidf(spark, sf_dir):
    """Exact TF-IDF per (doc, term): tf · (ln((N+1)/(df+1)) + 1) — smoothed
    idf, sklearn-style. Native implementation (not HashingTF) so the scores
    are exact and oracle-checkable. Plan: one explode + two hash aggs + a
    broadcast join on term stats + a 1-row broadcast for N — two shuffles
    total, both on bounded-cardinality keys (vocab size, not corpus size)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
            ).alias("score"),
        )
    )


@query(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents
        GROUP BY text
    """,
    family="text",
)
def dedup_exact(spark, sf_dir):
    """Exact text dedup: group identical texts, keep the min doc_id.
    Scale note: at 100 TB you group on md5/sha2(text) (fixed 16/32-byte
    shuffle key) rather than the full text; grouping by the digest is
    exact dedup for all practical purposes (collision ~2⁻⁶⁴)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "keep_id", "n_copies")
    )


@query(
    "dedup_jaccard",
    oracle="""
        WITH ts AS (
            SELECT doc_id, list_sort(list_distinct(string_split(lower(text), ' '))) AS tokset
            FROM documents
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(
                   CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
                   / (len(a.tokset) + len(b.tokset) - len(list_intersect(a.tokset, b.tokset))),
                   6
               ) AS jac
        FROM ts a JOIN ts b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
              / (len(a.tokset) + len(b.tokset) - len(list_intersect(a.tokset, b.tokset))) >= 0.8
    """,
    family="text",
)
def dedup_jaccard(spark, sf_dir):
    """Exact Jaccard-similar pairs (token-set similarity ≥ 0.8) — the
    ground truth that dedup_minhash's LSH recall is measured against.
    Quadratic by construction: fine at test scale, replaced by the LSH
    candidate-generation path at 100 TB (this pair of operators IS the
    exact-vs-approx design contract)."""
    d = table(spark, sf_dir, "documents")
    ts = d.select(
        "doc_id", F.sort_array(F.array_distinct(_tokens())).alias("tokset")
    )
    a = ts.select(F.col("doc_id").alias("a_id"), F.col("tokset").alias("a_set"))
    b = ts.select(F.col("doc_id").alias("b_id"), F.col("tokset").alias("b_set"))
    inter = F.size(F.array_intersect("a_set", "b_set")).cast("double")
    union = F.size("a_set") + F.size("b_set") - F.size(F.array_intersect("a_set", "b_set"))
    jac = inter / union
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("jac", F.round(jac, 6))
        .filter(jac >= 0.8)
        .select("a_id", "b_id", "jac")
    )


@query("dedup_minhash", oracle=None, family="text")
def dedup_minhash(spark, sf_dir):
    """Near-dup candidate pairs via MinHash-LSH over binary token vectors
    (MLlib MinHashLSH, seeded). Rows-only: LSH output is approximate; its
    recall against dedup_jaccard is asserted in tests.

    Scale design: approxSimilarityJoin compiles to explode(hash tables) →
    equi-join on (table, band hash) → exact-distance filter, i.e. candidate
    generation is an EQUI-join on a bounded key — the sublinear 100 TB path
    (vs the quadratic exact twin). numHashTables trades recall for cost."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    d = table(spark, sf_dir, "documents").select("doc_id", _tokens().alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True, minDF=1.0)
    fdf = cv.fit(d).transform(d)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(fdf)
    pairs = model.approxSimilarityJoin(fdf, fdf, 0.2, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jac_approx"),
        )
    )
