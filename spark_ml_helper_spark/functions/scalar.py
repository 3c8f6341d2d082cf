"""Scalar function families — SURVEY.md §2.G.

One composite query per family; every function in the family contributes an
aliased output column so the oracle hash covers each one. All expressions
are built-in pyspark.sql.functions (JVM, whole-stage codegen) — no Python in
any of these paths.

Cross-engine alignment notes (verified against DuckDB 1.0.0):
- dayofweek: Spark 1=Sunday, DuckDB 0=Sunday → Spark emits dayofweek-1.
- length/size/ceil/floor: DuckDB returns BIGINT where Spark returns INT (or
  v.v.) → explicit casts on whichever side is narrower.
- date_trunc('month'): DuckDB → DATE, Spark → timestamp → Spark casts.
- regexp_replace: DuckDB replaces first match only → 'g' flag in oracle.
- sign(): both cast to INT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_helper_spark.functions.canon import (
    join_double_array,
    join_int_array,
    join_str_array,
)
from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table


@query(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               concat(p_brand, '-', p_type)            AS brand_type,
               substring(p_name, 1, 5)                 AS name5,
               upper(p_name)                           AS name_up,
               lower(p_brand)                          AS brand_lo,
               trim('  ' || p_name || ' ')             AS name_trim,
               CAST(length(p_name) AS INTEGER)         AS name_len,
               lpad(p_brand, 12, '*')                  AS brand_pad,
               string_split(p_name, ' ')[1]            AS first_word,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
               regexp_replace(p_name, ' ', '_', 'g')   AS name_snake,
               replace(p_type, 'O', '0')               AS type_l33t,
               starts_with(p_name, 'small')            AS is_small
        FROM part
    """,
    family="functions",
)
def fn_string(spark, sf_dir):
    """String function family over part names/brands/types."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_l33t"),
        F.col("p_name").startswith("small").alias("is_small"),
    )


@query(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER)     AS yr,
               CAST(month(o_orderdate) AS INTEGER)    AS mo,
               CAST(day(o_orderdate) AS INTEGER)      AS dy,
               CAST(quarter(o_orderdate) AS INTEGER)  AS qtr,
               CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(datediff('day', o_orderdate, TIMESTAMP '1998-09-02') AS INTEGER) AS days_to_cutoff,
               CAST(CAST(o_orderdate AS DATE) + 5 AS TIMESTAMP)    AS plus5,
               CAST(last_day(o_orderdate) AS TIMESTAMP)            AS eom,
               CAST(epoch(o_orderdate) AS BIGINT)     AS epoch_s,
               make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000) AS ts_roundtrip
        FROM orders
    """,
    family="functions",
)
def fn_date(spark, sf_dir):
    """Date/time family over o_orderdate (timestamp_ntz, midnight-aligned).
    dow normalized to DuckDB's 0=Sunday; epoch round-trip goes through
    integer seconds (NTZ + UTC session → identity)."""
    o = table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    epoch_s = F.unix_timestamp(ts.cast("timestamp")).alias("epoch_s")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("yr"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("dy"),
        F.quarter(ts).alias("qtr"),
        (F.dayofweek(ts) - 1).alias("dow"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("1998-09-02").cast("date"), ts.cast("date")).alias("days_to_cutoff"),
        F.date_add(ts.cast("date"), 5).cast("timestamp_ntz").alias("plus5"),
        F.last_day(ts.cast("date")).cast("timestamp_ntz").alias("eom"),
        F.unix_timestamp(ts.cast("timestamp")).alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp(ts.cast("timestamp"))).cast("timestamp_ntz").alias("ts_roundtrip"),
    )


@query(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice / 7.0, 4)                  AS price_div7,
               round(abs(l_discount - 0.05), 6)                 AS disc_dev,
               CAST(ceil(l_extendedprice / 1000.0) AS BIGINT)   AS price_k_ceil,
               CAST(floor(l_extendedprice / 1000.0) AS BIGINT)  AS price_k_floor,
               round(exp(l_discount), 6)                        AS exp_disc,
               round(ln(l_extendedprice), 6)                    AS ln_price,
               round(log10(l_extendedprice), 6)                 AS log10_price,
               round(pow(l_quantity, 2.0), 6)                   AS qty_sq,
               round(sqrt(l_extendedprice), 6)                  AS sqrt_price,
               CAST(sign(l_extendedprice - 50000.0) AS INTEGER) AS price_side,
               l_orderkey % 7                                   AS key_mod7,
               round(greatest(l_tax, l_discount), 6)            AS max_rate,
               round(least(l_tax, l_discount), 6)               AS min_rate
        FROM lineitem
    """,
    family="functions",
)
def fn_math(spark, sf_dir):
    """Math family over lineitem prices (all arguments strictly positive
    where ln/sqrt require it — ANSI mode stays on)."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price / 7.0, 4).alias("price_div7"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil(price / 1000.0).alias("price_k_ceil"),
        F.floor(price / 1000.0).alias("price_k_floor"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.log10(price), 6).alias("log10_price"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("qty_sq"),
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.signum(price - 50000.0).cast("int").alias("price_side"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.greatest("l_tax", "l_discount"), 6).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 6).alias("min_rate"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS INTEGER)        AS n_toks,
               list_contains(string_split(d.text, ' '), 'spark')      AS has_spark,
               array_to_string(string_split(d.text, ' ')[1:3], '|')   AS first3,
               array_to_string(list_sort(list_distinct(string_split(d.text, ' '))), '|') AS vocab,
               CAST(len(e.embedding) AS INTEGER)                      AS dim,
               round(CAST(e.embedding[1] AS DOUBLE), 6)               AS e1
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    family="functions",
)
def fn_array(spark, sf_dir):
    """Array family: size/contains/slice/sort/distinct over token arrays,
    element_at over the embedding vector (docs⋈embeddings is 1:1)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    toks = F.split(F.col("text"), " ")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.size(toks).alias("n_toks"),
            F.array_contains(toks, "spark").alias("has_spark"),
            join_str_array(F.slice(toks, 1, 3)).alias("first3"),
            join_str_array(F.sort_array(F.array_distinct(toks))).alias("vocab"),
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
        )
    )


@query(
    "fn_higher_order",
    oracle="""
        SELECT vec_id,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 6) AS dot_self,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)                  AS n_pos,
               array_to_string(list_transform(embedding[1:3],
                   x -> CAST(CAST(round(CAST(x AS DOUBLE) * 2, 6) AS DECIMAL(38,6)) AS VARCHAR)), '|') AS scaled3,
               round(list_sum(list_transform(range(1, 65),
                     i -> CAST(embedding[i] AS DOUBLE) * embedding[65 - i])), 6)         AS rev_dot
        FROM embeddings
    """,
    family="functions",
)
def fn_higher_order(spark, sf_dir):
    """Higher-order functions on arrays: transform / filter / aggregate /
    zip_with — the UDF-free vector-math core every similarity operator
    builds on (JVM-side, no Python, no shuffle)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            6,
        ).alias("dot_self"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        join_double_array(
            F.transform(F.slice(F.col("embedding"), 1, 3), lambda x: x.cast("double") * 2)
        ).alias("scaled3"),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.reverse(F.col("embedding")),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("rev_dot"),
    )


@query(
    "fn_map",
    oracle="""
        SELECT event_id,
               'k'                                                          AS prop_keys,
               CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR) AS prop_vals,
               CAST(json_extract_string(props, '$.k') AS INTEGER)           AS k_val
        FROM events
    """,
    family="functions",
)
def fn_map(spark, sf_dir):
    """Map family: JSON string → map<string,int>, then map_keys/map_values/
    element_at. (events.props is always a single-key object, so the oracle
    can state the key list literally.)"""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        join_str_array(F.map_keys(m)).alias("prop_keys"),
        join_int_array(F.map_values(m)).alias("prop_vals"),
        F.element_at(m, "k").alias("k_val"),
    )


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')                    AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int,
               to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER))) AS js
        FROM events
    """,
    family="functions",
)
def fn_json(spark, sf_dir):
    """JSON family: path extraction (string + typed), struct re-encoding
    (round-trip '{"k":N}')."""
    e = table(spark, sf_dir, "events")
    k_int = F.from_json("props", "k INT").getField("k")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.struct(k_int.alias("k"))).alias("js"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS b_and,
               o_orderkey | 16 AS b_or,
               xor(o_orderkey, 255) AS b_xor,
               o_orderkey << 2 AS b_shl,
               o_orderkey >> 1 AS b_shr,
               CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop
        FROM orders
    """,
    family="functions",
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family over int64 keys: and/or/xor, shifts, popcount —
    the primitives under hash partitioners, bitmap indexes, and the
    SimHash/MinHash signatures elsewhere in this repo. Per-row, codegen,
    shuffle-free."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(16)).alias("b_or"),
        k.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.shiftleft(k, 2).cast("long").alias("b_shl"),
        F.shiftright(k, 1).cast("long").alias("b_shr"),
        F.bit_count(k).cast("long").alias("b_pop"),
    )


@query(
    "fn_try",
    oracle="""
        SELECT o_orderkey,
               TRY_CAST(o_orderpriority AS INTEGER)            AS pri_int,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_digit,
               round(o_totalprice / nullif(o_orderkey % 10, 0), 6) AS risky_div,
               CAST(NULL AS TIMESTAMP) AS bad_ts
        FROM orders
    """,
    family="functions",
)
def fn_try(spark, sf_dir):
    """ANSI-safe try_* family: Spark 4 runs with ANSI mode ON (bad casts /
    division by zero THROW), so total pipelines over dirty data need the
    try_ variants — try_cast returns NULL where cast raises, try_divide
    NULLs the zero-divisor rows, and an unparseable timestamp yields NULL
    instead of killing the job. The oracle mirrors with DuckDB TRY_CAST /
    nullif-guarded division. ('1-URGENT' fails the full cast; its leading
    digit succeeds — both outcomes exercised.)"""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("pri_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("pri_digit"),
        F.round(F.try_divide("o_totalprice", F.col("o_orderkey") % 10), 6).alias("risky_div"),
        F.lit("not a time").try_cast("timestamp").alias("bad_ts"),
    )


@query(
    "fn_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
               CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing
        FROM events
    """,
    family="functions",
)
def fn_variant(spark, sf_dir):
    """VARIANT semi-structured type (Spark 4): parse_json → open binary
    variant, then typed path extraction with variant_get — the
    schema-on-read path for JSON columns whose shape drifts, replacing
    brittle from_json fixed schemas. Unlike get_json_object (string in,
    string out, re-parse per call), the variant parses ONCE and every
    extraction reads the binary encoding. Missing paths yield NULL (not
    an error) — the semantics bulk ingestion needs."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_typed"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "int").alias("k_missing"),
    )


@query(
    "fn_url",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/corpus/' ||
                   CAST(doc_id AS VARCHAR) || '?lang=' || lang || '#top' AS url
            FROM documents
        )
        SELECT doc_id, url,
               'https' AS scheme,
               split_part(split_part(url, '://', 2), '/', 1) AS host,
               '/corpus/' || CAST(doc_id AS VARCHAR) AS path,
               'lang=' || split_part(split_part(url, 'lang=', 2), '#', 1) AS query,
               split_part(split_part(url, 'lang=', 2), '#', 1) AS lang_param
        FROM u
    """,
    family="functions",
)
def fn_url(spark, sf_dir):
    """URL family: synthesize a canonical URL per document (web corpora
    carry one per record), then decompose it with Spark's parse_url —
    scheme/host/path/query plus a single query parameter. The DuckDB
    oracle reconstructs the identical parts with string surgery, so the
    hash match proves parse_url's RFC behavior agrees with the plain
    decomposition on well-formed URLs. URL-keyed dedup and domain-level
    mixing at 100 TB hang off exactly these columns (host → domain
    weights, path → canonical id). Per-row, shuffle-free."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/corpus/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"), F.lit("#top"),
    )
    u = d.select("doc_id", url.alias("url"))
    p = lambda part: F.parse_url(F.col("url"), F.lit(part))  # noqa: E731
    return u.select(
        "doc_id",
        "url",
        F.lower(p("PROTOCOL")).alias("scheme"),
        p("HOST").alias("host"),
        p("PATH").alias("path"),
        p("QUERY").alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_struct",
    oracle="""
        WITH s AS (
            SELECT o_orderkey,
                   {'status': o_orderstatus, 'total': round(o_totalprice, 2),
                    'yr': CAST(date_part('year', o_orderdate) AS BIGINT)} AS o
            FROM orders
        )
        SELECT o_orderkey,
               o.status AS status,
               o.total AS total,
               o.yr AS yr,
               o.status || '/' || CAST(o.yr AS VARCHAR) AS status_yr
        FROM s
    """,
    family="functions",
)
def fn_struct(spark, sf_dir):
    """Struct family: build a nested struct per row, access its fields,
    and derive from them — the nested-record idiom parquet lakes use for
    grouped columns (address structs, metrics structs). Catalyst flattens
    field accesses at optimization time (no struct is materialized unless
    the full struct is selected), so nesting is free in the scan —
    column pruning reaches THROUGH struct fields into parquet. Per-row,
    shuffle-free."""
    o = table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("total"),
            F.year("o_orderdate").cast("long").alias("yr"),
        ).alias("o"),
    )
    return s.select(
        "o_orderkey",
        F.col("o.status").alias("status"),
        F.col("o.total").alias("total"),
        F.col("o.yr").alias("yr"),
        F.concat(F.col("o.status"), F.lit("/"), F.col("o.yr").cast("string")).alias("status_yr"),
    )


@query(
    "fn_regexp",
    oracle="""
        SELECT p_partkey,
               array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words,
               CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
               regexp_matches(p_name, '^[a-z]+ ')                          AS multi_word,
               regexp_extract(p_type, '([A-Z]+)$', 1)                     AS last_caps,
               regexp_replace(p_name, '[aeiou]', '.', 'g')                AS devoweled
        FROM part
    """,
    family="functions",
)
def fn_regexp(spark, sf_dir):
    """Regexp function family beyond fn_string's basics: extract-all (list
    of matches, '|'-canonicalized for the comparator), match counting
    (regexp_count), boolean rlike, anchored group extraction, and global
    class replacement. Patterns stay in the RE2-compatible subset (no
    backreferences/lookahead) so Java's and DuckDB's engines agree by
    construction. Map-only, codegen, pushdown-transparent."""
    from spark_ml_helper_spark.functions.canon import join_str_array

    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        join_str_array(F.regexp_extract_all("p_name", F.lit("[a-z]+"), F.lit(0))).alias("words"),
        F.regexp_count("p_name", F.lit("[aeiou]+")).cast("bigint").alias("n_vowel_runs"),
        F.col("p_name").rlike("^[a-z]+ ").alias("multi_word"),
        F.regexp_extract("p_type", "([A-Z]+)$", 1).alias("last_caps"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("devoweled"),
    )


@query(
    "fn_encoding",
    oracle="""
        SELECT p_partkey,
               to_base64(encode(p_name))                 AS name_b64,
               hex(encode(p_brand))                      AS brand_hex,
               md5(p_name)                               AS name_md5,
               decode(from_base64(to_base64(encode(p_name)))) AS roundtrip,
               CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes
        FROM part
    """,
    family="functions",
)
def fn_encoding(spark, sf_dir):
    """Binary/encoding function family: base64, hex, md5 digests, a
    base64 round-trip, and byte length. Everything goes through an
    explicit string→binary cast so both engines hash/encode the same
    bytes (the SURVEY §7.4 hazard-6 rule: engine-native hash() functions
    differ, digest functions over identical bytes do not). Map-only,
    codegen."""
    p = table(spark, sf_dir, "part")
    as_bin = lambda c: F.col(c).cast("binary")  # noqa: E731
    return p.select(
        "p_partkey",
        F.base64(as_bin("p_name")).alias("name_b64"),
        F.hex(as_bin("p_brand")).alias("brand_hex"),
        F.md5(as_bin("p_name")).alias("name_md5"),
        F.unbase64(F.base64(as_bin("p_name"))).cast("string").alias("roundtrip"),
        F.octet_length("p_name").cast("bigint").alias("n_bytes"),
    )
