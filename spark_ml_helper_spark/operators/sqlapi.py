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


_Q6 = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("sql_revenue_q6", oracle=_Q6, family="sqlapi")
def sql_revenue_q6(spark, sf_dir):
    """TPC-H Q6-shape forecast-revenue-change query as ONE SQL string
    (oracle IS the query — both engines parse identical text). The
    pure scan-filter-aggregate shape: every predicate (date range,
    discount band, quantity cap) pushes to the parquet reader, the
    aggregate is a 1-row partial→final fold, and the whole plan is one
    stage with no shuffle beyond the final merge — the query whose
    100 TB cost is EXACTLY the I/O the pushdown leaves behind, which
    is why it's the canonical pushdown benchmark. The discount band
    sits on the 2-dp value grid (0.05/0.07 are exact fixture values;
    BETWEEN on doubles is engine-identical at these magnitudes); the
    revenue sum rounds at 2 dp per the money-grid rule."""
    from spark_ml_helper_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_Q6)


_RECURSIVE_SPINE = """
    WITH RECURSIVE spine(d) AS (
        SELECT TIMESTAMP '2024-01-01'
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM spine
        WHERE d < TIMESTAMP '2024-01-30'
    ),
    daily AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT spine.d, coalesce(daily.n_events, 0) AS n_events
    FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SPINE, family="sqlapi")
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4's recursive CTE support) generating the
    January 2024 day spine, left-joined to daily event counts so
    silent days surface as explicit zeros — the standard-SQL twin of
    ts_gap_fill's sequence()-generated spine, submitted as ONE SQL
    string both engines parse identically. The recursion is
    DRIVER-BOUNDED (30 iterations of a 1-row frame, a UnionLoop over
    constant-size steps), so unlike a data-recursive CTE it adds no
    scale risk; the event side is one hash agg to the day grid and
    the join broadcasts the 30-row spine. Recursive CTEs at 100 TB
    are for bounded structural recursion (date spines, org charts,
    BOM explosions with depth caps) — unbounded transitive closure
    belongs to the iterative operators (graph_cc) with explicit
    convergence checks, and this docstring is where that line is
    drawn."""
    from spark_ml_helper_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE)


_VALUES_LOOKUP = """
    WITH sla(priority, sla_days) AS (
        VALUES ('1-URGENT', 7), ('2-HIGH', 14), ('3-MEDIUM', 30),
               ('4-NOT SPECIFIED', 45), ('5-LOW', 60)
    )
    SELECT s.priority, CAST(s.sla_days AS BIGINT) AS sla_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN sla s ON o.o_orderpriority = s.priority
    GROUP BY s.priority, s.sla_days
"""


@query("sql_values_lookup", oracle=_VALUES_LOOKUP, family="sqlapi")
def sql_values_lookup(spark, sf_dir):
    """Inline VALUES-clause lookup table joined onto the fact — the
    "business rules in the query" pattern (SLA days per priority,
    country groupings, status decodes) that avoids a dim-table
    round-trip for 5-row reference data, submitted as ONE SQL string
    both engines parse. Catalyst plans the VALUES relation as a
    LocalRelation and broadcasts it — zero I/O, map-side join; the
    aggregate is the usual partial→final. The rule: inline VALUES for
    single-query constants, a real dimension table the moment two
    queries share the mapping."""
    from spark_ml_helper_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_VALUES_LOOKUP)


_PIVOT_SPARK = """
    SELECT * FROM (
        SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
    )
    PIVOT (
        round(sum(o_totalprice), 2) AS rev
        FOR o_orderstatus IN ('O' AS status_o, 'F' AS status_f, 'P' AS status_p)
    )
"""


@query(
    "sql_pivot",
    oracle="""
        SELECT o_orderpriority,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
                   AS status_o,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
                   AS status_f,
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
                   AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    family="sqlapi",
)
def sql_pivot(spark, sf_dir):
    """SQL PIVOT clause (Spark's `PIVOT (agg FOR col IN (...))`
    syntax): revenue cross-tab of priority × status as ONE SQL string
    — the SQL-surface twin of op_pivot's DataFrame groupBy().pivot()
    (identical physical plan: Catalyst rewrites PIVOT into the
    conditional-aggregate form the ORACLE spells out longhand, which
    is also why the pivot column list must be EXPLICIT at scale —
    an open-ended IN list needs a pre-pass to enumerate values, the
    documented two-step for dynamic pivots). Money sums round at 2 dp
    per the money-grid rule."""
    from spark_ml_helper_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_PIVOT_SPARK)


_LATERAL_TOPK = """
    SELECT c.c_custkey, c.c_acctbal, t.o_orderkey, t.o_totalprice, t.rnk
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(row_number() OVER (
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS BIGINT) AS rnk
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 3
    ) t
    WHERE c.c_acctbal > 9000
"""


@query("sql_lateral_topk", oracle=_LATERAL_TOPK, family="sqlapi")
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery — top-3 orders per high-balance
    customer, written the way an analyst writes it (per-row subquery
    with ORDER BY ... LIMIT) rather than the window-function rewrite
    win_topk_group uses. The IDENTICAL SQL string runs on both
    engines: Spark 4 supports lateral correlated derived tables and
    Catalyst DECORRELATES the subquery into the same
    partitioned-window + filter plan the explicit rewrite produces —
    per-customer ranks shuffle once on the join key, no per-row
    re-execution survives optimization (DuckDB's optimizer performs
    the same decorrelation). The full tiebreak (o_totalprice DESC,
    o_orderkey) makes the LIMIT deterministic cross-engine. At 100 TB
    this is the pattern to TEACH: the lateral form is the readable
    spec, and the decorrelated plan is what actually runs — asserting
    the two stay equivalent is exactly what this oracle pairing
    does."""
    from spark_ml_helper_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK)


_Q4_SHAPE = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sql_exists_semijoin", oracle=_Q4_SHAPE, family="sqlapi")
def sql_exists_semijoin(spark, sf_dir):
    """TPC-H Q4-shape order-priority checking: a correlated EXISTS over
    the fact table (orders with at least one line shipped after the
    order date), counted per priority — the canonical
    subquery-to-SEMI-JOIN decorrelation. One SQL text, both engines
    (the sql_star_join discipline). Catalyst rewrites the EXISTS into a
    left-semi hash join on l_orderkey with the correlated predicate as
    the join condition; at 100 TB that semi join shuffles on the
    already-partitioned order key and the date filter pushes to the
    orders scan — EXISTS never materializes the subquery result."""
    for t in ("orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q4_SHAPE)


_Q18_SHAPE = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


@query("sql_in_agg_subquery", oracle=_Q18_SHAPE, family="sqlapi")
def sql_in_agg_subquery(spark, sf_dir):
    """TPC-H Q18-shape large-volume customers: IN over an AGGREGATED
    subquery (orders whose total quantity beats a threshold), re-joined
    to the customer/orders detail. The IN-subquery becomes a semi join
    against the aggregated frame — the aggregate runs ONCE, partial
    map-side, keyed on the same l_orderkey the outer join uses, so at
    100 TB the subquery agg and the semi join share a partitioning and
    AQE plans them back to back without an extra exchange. Total order
    (o_totalprice DESC, o_orderkey) makes the top-20 deterministic."""
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q18_SHAPE)


_Q21_SHAPE = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@query("sql_exists_notexists", oracle=_Q21_SHAPE, family="sqlapi")
def sql_exists_notexists(spark, sf_dir):
    """TPC-H Q21-shape suppliers-who-kept-orders-waiting, adapted to the
    fixture schema (sole RETURNED line on a finalized multi-supplier
    order stands in for the receipt-late predicate — the fixture carries
    no l_receiptdate): the hardest decorrelation shape in the TPC-H
    suite, a correlated EXISTS and a correlated NOT EXISTS against the
    SAME fact table with inequality correlation (l_suppkey <>). Catalyst
    plans them as a left-semi plus a left-anti join, both keyed on
    l_orderkey — three passes over lineitem that all shuffle on the one
    fact key (co-partitioned under AQE), never a per-row subquery
    execution. Ties broken by (numwait DESC, s_name)."""
    for t in ("supplier", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SHAPE)


_Q22_SHAPE = """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("sql_scalar_notexists", oracle=_Q22_SHAPE, family="sqlapi")
def sql_scalar_notexists(spark, sf_dir):
    """TPC-H Q22-shape global-sales-opportunity: an UNCORRELATED scalar
    subquery (global positive-balance average — one row, broadcast into
    the filter) combined with a correlated NOT EXISTS (customers with no
    high-value order → left-anti join on o_custkey), aggregated per
    segment. The scalar subquery runs once regardless of corpus size;
    the anti join is the only corpus-scale operation and shuffles on
    the customer key. Money stays on the 2-decimal grid (exact
    2-dp inputs summed, rounded at 2 — the BASELINE.md money
    discipline)."""
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SHAPE)


_Q2_SHAPE = """
    SELECT p_partkey, p_brand, s_name, n_name, l_extendedprice AS min_price
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE' AND p_size = 15
      AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
"""


@query("sql_correlated_min", oracle=_Q2_SHAPE, family="sqlapi")
def sql_correlated_min(spark, sf_dir):
    """TPC-H Q2-shape minimum-cost supplier (adapted to the fixture
    schema: lineitem extended price stands in for the absent
    partsupp.ps_supplycost): an EQUALITY against a CORRELATED MIN
    subquery that repeats the outer query's own join tree — the
    classic decorrelation-into-aggregate-and-rejoin shape. Catalyst
    rewrites the subquery as a per-partkey min aggregate joined back
    on (p_partkey, price); nothing executes per outer row. At 100 TB
    both branches shuffle on the part key and the region/nation dims
    broadcast; the dedup trap (a part with two suppliers at the tied
    minimum returns BOTH rows, per spec) is preserved and
    hash-verified. Prices are exact 2-dp fixture values, so the
    equality is grid-safe."""
    for t in ("part", "supplier", "lineitem", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q2_SHAPE)


_Q11_SHAPE = """
    WITH v AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS val_c
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           CAST(round(val_c / 100.0, 2) AS DOUBLE) AS value
    FROM v
    WHERE val_c > (SELECT sum(val_c) / 800.0 FROM v)
"""


@query("sql_group_vs_total", oracle=_Q11_SHAPE, family="sqlapi")
def sql_group_vs_total(spark, sf_dir):
    """TPC-H Q11-shape important-stock identification (value = price x
    quantity over one nation's suppliers, standing in for the absent
    partsupp): per-group totals filtered against a SCALAR FRACTION OF
    THE GLOBAL TOTAL over the same derived table — the
    aggregate-compared-to-aggregate shape. The CTE is evaluated in two
    roles (group frame + global scalar); Catalyst executes the scalar
    branch once as a 1-row broadcast, never per group. Money discipline
    makes the threshold compare exact: values are folded in INTEGER
    CENTS (sums exact below 2^63), the global threshold is one
    exact-int division both engines evaluate identically, and the
    2-dp display rounding happens after the compare — no fp boundary
    anywhere. At 100 TB: one shuffle on l_partkey, dims broadcast, the
    scalar a 1-row reuse."""
    for t in ("lineitem", "supplier", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q11_SHAPE)


_Q13_SHAPE = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
"""


@query("sql_outer_count_dist", oracle=_Q13_SHAPE, family="sqlapi")
def sql_outer_count_dist(spark, sf_dir):
    """TPC-H Q13-shape customer order-count distribution: the predicate
    lives ON THE LEFT JOIN, not in WHERE — customers with zero
    qualifying orders must survive with c_count = 0 (a WHERE would
    silently drop them, the classic outer-join-filter bug this query
    exists to catch), and count(o_orderkey) counts non-NULL keys so
    the preserved rows land in the zero bucket. Two aggregations: the
    per-customer count shuffles on c_custkey (same key as the join —
    AQE co-partitions), then the distribution groupBy collapses to
    |distinct counts| rows. The histogram-of-a-groupBy is profile-
    grade: both engines produce exact integers."""
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q13_SHAPE)


_Q17_SHAPE = """
    SELECT CAST(round(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) / 700.0, 2)
                AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_size < 10
      AND l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
"""


@query("sql_correlated_avg", oracle=_Q17_SHAPE, family="sqlapi")
def sql_correlated_avg(spark, sf_dir):
    """TPC-H Q17-shape small-quantity-order revenue: each lineitem is
    admitted only if its quantity is below 20% of ITS PART's average
    quantity — a correlated scalar AVG that Catalyst decorrelates into
    a per-partkey aggregate re-joined on the part key (two passes over
    lineitem, both shuffling on l_partkey; never a per-row subquery).
    The threshold compare is deterministic cross-engine without any
    rounding: quantities are exact integers, avg = exact-int sum /
    exact-int count is the same IEEE division in both engines, and
    0.2 * that is one more identical operation. Revenue folds in
    integer cents and divides by 7.0 only at output (the Q17 yearly
    scaling), so the 2-dp rounding sits on an exact-integer input."""
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SHAPE)


_Q20_SHAPE = """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l1.l_suppkey
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_type = 'PROMO' AND p_size > 45
          AND l1.l_quantity > (
              SELECT 1.9 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l1.l_partkey))
"""


@query("sql_in_correlated_agg", oracle=_Q20_SHAPE, family="sqlapi")
def sql_in_correlated_agg(spark, sf_dir):
    """TPC-H Q20-shape potential-part-promotion suppliers: an IN
    subquery whose OWN where-clause contains a correlated scalar AVG —
    two nesting levels that decorrelate differently (the inner AVG
    becomes a per-partkey aggregate joined back inside the IN branch;
    the IN itself becomes a left-semi join on s_suppkey). The
    selectivity stack (PROMO type, size > 45, quantity above 1.9x the
    part's own average) keeps the semi-join build side small — the
    shape's point at 100 TB is that the expensive correlated work
    happens once per PART, not once per supplier-lineitem pair.
    Quantity thresholds are exact-int avg arithmetic, identical in
    both engines (the Q17 discipline)."""
    for t in ("supplier", "nation", "lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q20_SHAPE)


_Q8_SHAPE = """
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(100 - round(l_discount * 100) AS BIGINT) AS volume_c4,
               n2.n_name AS supp_nation
        FROM part, lineitem, orders, customer, supplier,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
          AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_c4
                          ELSE 0 END) * 1.0 / sum(volume_c4), 6) AS DOUBLE) AS mkt_share,
           CAST(round(sum(volume_c4) / 10000.0, 2) AS DOUBLE) AS total_volume
    FROM vol GROUP BY o_year
"""


@query("sql_market_share", oracle=_Q8_SHAPE, family="sqlapi")
def sql_market_share(spark, sf_dir):
    """TPC-H Q8-shape national market share: one nation's fraction of
    yearly PROMO-part volume sold into ASIA — the CASE-inside-SUM
    share pattern (conditional and unconditional aggregate over the
    SAME grouped pass, one scan, no self-join), sitting on an 8-table
    join where nation appears TWICE in different roles (customer's
    region gate vs supplier's share key; the alias discipline is the
    shape's point). Volume folds as exact integer cents x integer
    discount-percent (a 4-decimal-scaled BIGINT), so both the share
    ratio (exact-int / exact-int, one identical IEEE division) and
    the display sums are grid-safe. At 100 TB the two fact joins
    shuffle on l_orderkey/l_partkey, every dim broadcasts, and the
    share needs no second pass — the reason this shape beats the
    naive numerator-join-denominator formulation."""
    for t in ("part", "lineitem", "orders", "customer", "supplier",
              "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q8_SHAPE)


_Q9_SHAPE = """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(100 - round(l_discount * 100) AS BIGINT)
                     * CAST(100 - round(l_tax * 100) AS BIGINT))
                 / 1000000.0, 2) AS DOUBLE) AS net_revenue
    FROM lineitem, orders, supplier, nation, part
    WHERE l_orderkey = o_orderkey AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey AND p_partkey = l_partkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, o_year
"""


@query("sql_profit_by_nation_year", oracle=_Q9_SHAPE, family="sqlapi")
def sql_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9-shape product-line net revenue by supplier nation and
    order year (price x (1-discount) x (1-tax) stands in for the
    absent supplycost term): the substring part filter (LIKE '%red%')
    CANNOT push to the parquet reader as a range — it prunes after the
    scan, which is exactly what Q9 stresses — and the profit term
    multiplies THREE money/rate columns, folded here as a product of
    exact integers (cents x discount-pct x tax-pct = a 6-decimal-
    scaled BIGINT; max |term| ~ 1e13, sums safe below 2^63), so the
    one output rounding sits on an exact integer. Group key is
    (nation, year) — 25 x 7 cells; the aggregation is partial→final
    over the fact join's l_orderkey/l_partkey shuffles with all dims
    broadcast."""
    for t in ("lineitem", "orders", "supplier", "nation", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q9_SHAPE)


_Q12_SHAPE = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
"""


@query("sql_priority_line_split", oracle=_Q12_SHAPE, family="sqlapi")
def sql_priority_line_split(spark, sf_dir):
    """TPC-H Q12-shape shipping-mode priority split (adapted to the
    fixture schema: l_linestatus stands in for the absent l_shipmode):
    per line status, COMPLEMENTARY CASE-count pairs — urgent/high
    priority lines vs the rest — computed in ONE grouped pass (the
    CASE-inside-SUM discipline; the naive form runs two filtered
    aggregates and a join). The date band pushes to the lineitem
    parquet scan; the fact join shuffles on the order key; the CASE
    buckets are exact integer counts with zero fp surface. At 100 TB
    this is one scan + one shuffle regardless of how many priority
    buckets the CASE carries — the reason Q12 exists."""
    for t in ("orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q12_SHAPE)


_Q14_SHAPE = """
    SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(100 - round(l_discount * 100) AS BIGINT)
                       ELSE 0 END)
               / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(100 - round(l_discount * 100) AS BIGINT)), 6)
               AS DOUBLE) AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@query("sql_promo_share", oracle=_Q14_SHAPE, family="sqlapi")
def sql_promo_share(spark, sf_dir):
    """TPC-H Q14-shape promotion-effect measurement: the percentage of
    one month's discounted revenue attributable to PROMO parts — a
    GLOBAL (ungrouped) conditional/total ratio from ONE pass over the
    join, the scalar complement of sql_market_share's grouped share.
    Money discipline: both numerator and denominator fold as exact
    integer cents × integer discount-percent (4-decimal-scaled
    BIGINTs), the ratio is one identical IEEE division, and the output
    is CAST AS DOUBLE (the round-10 decimal-literal rule — 100.0 would
    otherwise type the result DECIMAL on Spark). The month band pushes
    to the scan; part broadcasts. One row out at any corpus scale."""
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q14_SHAPE)


_Q16_SHAPE = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
"""


@query("sql_notin_supplier_cnt", oracle=_Q16_SHAPE, family="sqlapi")
def sql_notin_supplier_cnt(spark, sf_dir):
    """TPC-H Q16-shape parts/supplier relationship count (lineitem
    stands in for the absent partsupp; the negative-balance filter for
    the absent complaints-comment LIKE): count(DISTINCT supplier) per
    (brand, type, size) bucket, EXCLUDING suppliers from a NOT IN
    subquery — the shape exists to stress NOT IN's three-valued-logic
    anti-join (one NULL in the subquery would void every row; both
    engines plan it as a null-aware anti join, here provably null-free
    since s_suppkey is a key) stacked under a count-distinct expand.
    The IN-list size filter prunes part before the join; the distinct
    shuffles on the group key + suppkey then collapses. At 100 TB the
    anti-join build side (bad suppliers) broadcasts."""
    for t in ("part", "lineitem", "supplier"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q16_SHAPE)


_Q19_SHAPE = """
    SELECT CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(100 - round(l_discount * 100) AS BIGINT))
                / 10000.0, 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("sql_disjunctive_pred", oracle=_Q19_SHAPE, family="sqlapi")
def sql_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19-shape discounted-revenue query: an OR of three AND
    blocks mixing columns from BOTH join sides — the canonical
    disjunctive-predicate planning test. Neither engine can push the
    whole OR below the join, but both can (and Spark does — asserted
    by the CNF-derived per-side filters in the plan) push the
    single-side residues: p_brand IN (three brands) + the union of
    size ranges prune part, the union of quantity ranges prunes
    lineitem, and only the cross-side conjunctions evaluate post-join.
    Revenue folds in exact integer cents × discount-percent with the
    output CAST AS DOUBLE. One row out; part broadcasts at any
    scale."""
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q19_SHAPE)


_Q15_SHAPE = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(100 - round(l_discount * 100) AS BIGINT))
                    AS BIGINT) AS total_c4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_c4 / 10000.0, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_c4 = (SELECT max(total_c4) FROM revenue)
"""


@query("sql_scalar_max_join", oracle=_Q15_SHAPE, family="sqlapi")
def sql_scalar_max_join(spark, sf_dir):
    """TPC-H Q15-shape top supplier: the quarter's per-supplier revenue
    CTE consumed in TWO roles — the join frame and the scalar MAX
    threshold — with an EQUALITY against that scalar (ties return every
    tied supplier, per spec; the equality is exact because revenue
    folds as integer cents × discount-percent, never a rounded
    double). Catalyst evaluates the scalar branch once as a 1-row
    broadcast, not per row; the supplier dim broadcasts onto the
    aggregated (small) revenue frame. The classic view-reuse shape:
    at 100 TB the CTE materializes once, and the only corpus-scale
    work is the one quarter-banded scan + suppkey shuffle behind it."""
    for t in ("lineitem", "supplier"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q15_SHAPE)
