"""The SQL entry point (SURVEY.md §3.3): operators expressed as ANSI SQL
strings over registered temp views, exercising Spark's parser → analyzer →
Catalyst path end-to-end. Same engine, same plans — a user who prefers
`spark.sql(...)` over the DataFrame builder gets identical physical
strategies (broadcasts, partial aggs, pushdown), which `sql_star_join`
demonstrates on the densest multi-join shape in the fixture schema.
"""

from __future__ import annotations

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table

_Q5 = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
    GROUP BY n_name
"""


@query("sql_star_join", oracle=_Q5, family="sqlapi")
def sql_star_join(spark, sf_dir):
    """TPC-H Q5-shape local-supplier revenue, submitted as ONE SQL string
    (the oracle IS the query — both engines parse the identical text, the
    strongest possible statement of SQL-surface parity). Catalyst turns it
    into the same plan the DataFrame form would get: region/nation/supplier
    broadcast, the lineitem⋈orders⋈customer chain shuffles on the fact
    keys, aggregation is partial-then-final. The date predicate pushes to
    the orders scan."""
    for t in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5)


_Q3 = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@query("sql_shipping_priority", oracle=_Q3, family="sqlapi")
def sql_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shape shipping-priority query as ONE SQL string (the
    oracle IS the query text, like sql_star_join): top-10 highest-value
    BUILDING-segment orders taken before the cutoff date but with
    lineitems still shipping after it. Catalyst plans it exactly as the
    DataFrame form would: both date predicates push into the parquet
    scans (orders AND lineitem prune before the join), the
    customer-segment filter reduces the build side, the fact join
    shuffles on the order key, aggregation is partial-then-final, and
    the ORDER BY ... LIMIT 10 is TakeOrderedAndProject — no global
    sort. The sort key is the ROUNDED revenue (a per-order sum of ~4
    products, drift ≪ the 1e-6 grid) with l_orderkey as unique
    tie-break, so the top-10 cut is deterministic on both engines."""
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3)
