"""SQL entry point (SURVEY §3.1 entry point 1): TPC-H-style analytical
queries submitted as SQL TEXT through ``FlinkexpEngine.sql`` and planned by
Catalyst end-to-end (parser -> analyzer -> optimizer -> codegen).

Each query here is ONE ANSI-SQL string executed verbatim by BOTH engines —
Spark runs it via ``spark.sql``, DuckDB runs it as the oracle — so the
correctness check also pins SQL-dialect compatibility of the surface we
expose.  (Money aggregates use the exact-decimal contract of
catalog/_util.py.)

Scale notes: these are the canonical star-schema shapes — selective dims
broadcast, the lineitem fact streams through partial aggregation, and the
final TopK runs as TakeOrderedAndProject (no global sort of the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

# One string, two engines (Spark executes, DuckDB checks).
Q3_SHIPPING_PRIORITY = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

Q5_LOCAL_SUPPLIER_VOLUME = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
"""

Q10_RETURNED_ITEMS = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql_text: str) -> DataFrame:
    datasets.register_views(spark, sf_dir)
    return spark.sql(sql_text)


@register("sql_tpch_q3", oracle=Q3_SHIPPING_PRIORITY, tags=("J1", "A1", "O1", "O2"))
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via the SQL entry point: 3-way star join + grouped
    revenue + global top-10 (planned as TakeOrderedAndProject)."""
    return _sql_query(spark, sf_dir, Q3_SHIPPING_PRIORITY)


@register("sql_tpch_q5", oracle=Q5_LOCAL_SUPPLIER_VOLUME, tags=("J1", "J6", "A1"))
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the full star; region/nation
    broadcast, fact-side partial aggregation."""
    return _sql_query(spark, sf_dir, Q5_LOCAL_SUPPLIER_VOLUME)


@register("sql_tpch_q10", oracle=Q10_RETURNED_ITEMS, tags=("J1", "A1", "O2"))
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter + 4-way join + top-20."""
    return _sql_query(spark, sf_dir, Q10_RETURNED_ITEMS)


# ---------------------------------------------------------------------------
# Adapted TPC-H surface (reduced schema: no partsupp, no commit/receipt
# dates, no shipmode/phone/container/comment columns — TESTDATA.md).
# Queries needing the missing columns are ADAPTED (noted per query) while
# keeping the canonical plan shape the original exercises.  Same one-string
# contract: Spark executes the text, DuckDB checks it.
# ---------------------------------------------------------------------------

# All money/rate columns in the fixture are intended 2-decimal values
# (max |x*100 - round(x*100)| < 1e-9 over the corpus), so casting each BASE
# column to DECIMAL(_,2) is unambiguous in both engines, and every product
# stays in exact decimal arithmetic.  Two scale-stability rules learned at
# sf1 (both green at sf0.01, both drift at 6M rows):
#  * multiply in the DECIMAL domain, never CAST a DOUBLE product to a
#    decimal — the product's fp error (~1e-6 at 1e5 magnitude) reaches the
#    6th decimal, so the engines can round the same row to adjacent
#    DECIMAL(18,6) ulps;
#  * reduce sums to scale 2 BEFORE the final DOUBLE cast — DuckDB converts
#    decimal->double as (double)unscaled / 10^scale, which double-rounds
#    once unscaled exceeds 2^53 (sum_charge at scale 6 is ~5e16 at sf1),
#    while Spark's BigDecimal cast is correctly rounded; at scale 2 the
#    unscaled value stays exact past sf1000.  Reduce via ROUND(x, 2) and
#    THEN cast — a bare scale-reducing CAST rounds HALF_UP in Spark but
#    truncates in DuckDB, whereas ROUND is half-away-from-zero in both and
#    leaves the cast with nothing to drop.
# DEVIATION FROM CANONICAL TPC-H Q1 (round-11 ADVICE): the scale-2 rounding
# of sum_disc_price/sum_charge means these artifact values are NOT
# comparable to published TPC-H reference answers, which carry the full
# 4/6-decimal products.  This query's contract is cross-engine bit
# stability on the synthetic fixture, not TPC-H answer-set parity — do not
# diff its hashes against official TPC-H data.
Q1_PRICING_SUMMARY = """
    WITH d AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity      AS DECIMAL(18,2)) AS qty,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
               CAST(l_discount      AS DECIMAL(8,2))  AS disc,
               CAST(l_tax           AS DECIMAL(8,2))  AS tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS DOUBLE) AS sum_qty,
           CAST(SUM(price) AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(price * (1 - disc)), 2) AS DECIMAL(38,2))
               AS DOUBLE) AS sum_disc_price,
           CAST(CAST(ROUND(SUM(price * (1 - disc) * (1 + tax)), 2)
               AS DECIMAL(38,2)) AS DOUBLE) AS sum_charge,
           CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(price) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(disc) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM d
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

# Q4 adapted: EXISTS predicate is "shipped >60 days after ordering" instead
# of commitdate < receiptdate (columns absent from the fixture).
Q4_ORDER_PRIORITY = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

Q6_FORECAST_REVENUE = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""

Q7_VOLUME_SHIPPING = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

Q8_MARKET_SHARE = """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_2'
                         THEN CAST(volume AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

# Q13 adapted: the order-exclusion predicate is an orderpriority class
# instead of a comment LIKE (no comment column in the fixture).
Q13_CUSTOMER_DISTRIBUTION = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders ON c_custkey = o_custkey
                              AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

Q14_PROMO_REVENUE = """
    SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)
               AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""

Q15_TOP_SUPPLIER = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

Q17_SMALL_QTY_REVENUE = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""

Q18_LARGE_VOLUME_CUSTOMER = """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS STRING) AS o_orderdate_s,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""

# Q22 adapted: "good account" = acctbal above the positive-balance mean
# (no phone column for country-code prefixes); country code is
# n_nationkey % 5 so the output keeps Q22's small-group shape.
Q22_SALES_OPPORTUNITY = """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                       AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


# Q2 adapted: no partsupp table, so supply cost is derived from sales —
# unit_cost(part, supplier) = MIN(l_extendedprice / l_quantity).  Keeps the
# original's shape: region-scoped multi-join + correlated MIN subquery
# (decorrelated by Catalyst into an aggregate + join) + top-100.
Q2_MIN_COST_SUPPLIER = """
    WITH partcost AS (
        SELECT l_partkey, l_suppkey,
               CAST(MIN(l_extendedprice / l_quantity) AS DOUBLE) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part
    JOIN partcost ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size <= 15
      AND p_type = 'ECONOMY'
      AND r_name = 'ASIA'
      AND unit_cost = (
          SELECT MIN(pc.unit_cost)
          FROM partcost pc
          JOIN supplier s2 ON s2.s_suppkey = pc.l_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE pc.l_partkey = p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

# Q9 adapted: profit cost term uses 0.6 * p_retailprice as the unit-cost
# proxy (no ps_supplycost); keeps the part-name LIKE filter, the 5-way
# join, and the nation x year rollup.
Q9_PRODUCT_TYPE_PROFIT = """
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""

# Q11 adapted: "stock value" per part = revenue held by suppliers of one
# nation (no partsupp availqty); keeps the scalar-subquery fraction
# threshold over a reused CTE.
Q11_IMPORTANT_STOCK = """
    WITH holdings AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, value
    FROM holdings
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          * 0.001
                   FROM holdings)
    ORDER BY value DESC, ps_partkey
"""

# Q12 adapted: priority-class line counts keyed by returnflag instead of
# shipmode, lateness = shipped >30 days after ordering (no receiptdate).
Q12_SHIPPING_PRIORITY_CLASS = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'N')
      AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

# Q16 adapted: supplier diversity per (brand, type, size) counted from the
# lineitem pairing (no partsupp); the excluded-supplier predicate is a
# negative account balance instead of a complaints comment LIKE.
Q16_PART_SUPPLIER_COUNT = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# Q19 adapted: the OR-of-ANDs disjunct uses brand x size x quantity bands
# (no container/shipmode/shipinstruct columns); keeps the canonical
# "disjunctive join predicate still pushes a partial filter" shape.
Q19_DISCOUNTED_REVENUE = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""

# Q20 adapted: "has excess stock to promote" = supplier sold more than half
# of a red part's 1997 volume (no partsupp availqty); keeps the nested
# semi-join chain with a per-part share threshold.
Q20_POTENTIAL_PROMOTION = """
    WITH part_sales AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
        SELECT l_partkey, SUM(qty) AS total_qty
        FROM part_sales
        GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (SELECT ps.l_suppkey
                        FROM part_sales ps
                        JOIN part_total pt ON ps.l_partkey = pt.l_partkey
                        WHERE CAST(ps.qty AS DOUBLE)
                              > 0.5 * CAST(pt.total_qty AS DOUBLE))
    ORDER BY s_name
"""

# Q21 adapted: "kept the order waiting" = only supplier on a finished
# multi-supplier order to ship >60 days after ordering (no
# commit/receipt dates); keeps the EXISTS + NOT EXISTS pair.
Q21_WAITING_SUPPLIER = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@register("sql_tpch_q1", oracle=Q1_PRICING_SUMMARY, tags=("A1", "O1"))
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan pricing summary — the canonical map-side partial
    aggregation shape (8 aggregates over 2 grouping keys; the shuffle
    carries 6 rows, not 60k)."""
    return _sql_query(spark, sf_dir, Q1_PRICING_SUMMARY)


@register("sql_tpch_q4", oracle=Q4_ORDER_PRIORITY, tags=("J3", "A1"))
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted): correlated EXISTS planned as a LEFT SEMI join —
    no row explosion on multi-lineitem orders."""
    return _sql_query(spark, sf_dir, Q4_ORDER_PRIORITY)


@register("sql_tpch_q6", oracle=Q6_FORECAST_REVENUE, tags=("A2", "P2"))
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan + global agg; every predicate pushes into
    the parquet scan (PushedFilters), result is one row with no shuffle of
    data rows."""
    return _sql_query(spark, sf_dir, Q6_FORECAST_REVENUE)


@register("sql_tpch_q7", oracle=Q7_VOLUME_SHIPPING, tags=("J1", "J6", "A1"))
def q_sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair volume shipping — two broadcast dims aliased
    from the same table, disjunctive pair predicate, year rollup."""
    return _sql_query(spark, sf_dir, Q7_VOLUME_SHIPPING)


@register("sql_tpch_q8", oracle=Q8_MARKET_SHARE, tags=("J1", "J6", "A1", "F4"))
def q_sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: market share — 8-way star join with conditional aggregation
    (CASE inside SUM), the widest join tree in the suite."""
    return _sql_query(spark, sf_dir, Q8_MARKET_SHARE)


@register("sql_tpch_q13", oracle=Q13_CUSTOMER_DISTRIBUTION, tags=("J2", "A1"))
def q_sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted): customer order-count distribution — LEFT OUTER
    join with an ON-clause filter (not WHERE: keeps order-less customers),
    double aggregation."""
    return _sql_query(spark, sf_dir, Q13_CUSTOMER_DISTRIBUTION)


@register("sql_tpch_q14", oracle=Q14_PROMO_REVENUE, tags=("J1", "A2", "F4"))
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — ratio of conditional to total
    aggregate in one pass over the join."""
    return _sql_query(spark, sf_dir, Q14_PROMO_REVENUE)


@register("sql_tpch_q15", oracle=Q15_TOP_SUPPLIER, tags=("A1", "O1"))
def q_sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — CTE referenced twice (revenue + its MAX);
    Spark plans the scalar subquery as a separate broadcast stage."""
    return _sql_query(spark, sf_dir, Q15_TOP_SUPPLIER)


@register("sql_tpch_q17", oracle=Q17_SMALL_QTY_REVENUE, tags=("A1", "A2"))
def q_sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity revenue — per-part correlated scalar AVG
    subquery (decorrelated by Catalyst into an aggregate + join).  The
    threshold compare is stable cross-engine: integer-valued quantities sum
    exactly in doubles, so both engines derive the identical boundary."""
    return _sql_query(spark, sf_dir, Q17_SMALL_QTY_REVENUE)


@register("sql_tpch_q18", oracle=Q18_LARGE_VOLUME_CUSTOMER, tags=("J1", "A1", "O2"))
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — IN over a HAVING aggregate
    (planned as semi join against the pre-aggregated lineitem)."""
    return _sql_query(spark, sf_dir, Q18_LARGE_VOLUME_CUSTOMER)


@register("sql_tpch_q22", oracle=Q22_SALES_OPPORTUNITY, tags=("J4", "A1"))
def q_sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted): sales opportunity — uncorrelated scalar subquery
    threshold + NOT EXISTS anti join."""
    return _sql_query(spark, sf_dir, Q22_SALES_OPPORTUNITY)


@register("sql_tpch_q2", oracle=Q2_MIN_COST_SUPPLIER, tags=("J1", "J6", "A1", "O2"))
def q_sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): min-cost supplier per region-scoped part — the
    correlated MIN subquery decorrelates into a per-part aggregate joined
    back (one extra shuffle, not a per-row probe)."""
    return _sql_query(spark, sf_dir, Q2_MIN_COST_SUPPLIER)


@register("sql_tpch_q9", oracle=Q9_PRODUCT_TYPE_PROFIT, tags=("J1", "J6", "A1", "F4"))
def q_sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): product-type profit by nation x year — 5-way
    join with all three dims broadcast, fact-side partial aggregation."""
    return _sql_query(spark, sf_dir, Q9_PRODUCT_TYPE_PROFIT)


@register("sql_tpch_q11", oracle=Q11_IMPORTANT_STOCK, tags=("A1", "O1"))
def q_sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): important-stock fraction threshold — one CTE
    consumed twice (group rows + their grand total); the scalar subquery
    runs as its own stage and broadcasts the threshold."""
    return _sql_query(spark, sf_dir, Q11_IMPORTANT_STOCK)


@register("sql_tpch_q12", oracle=Q12_SHIPPING_PRIORITY_CLASS, tags=("J1", "A1", "F4"))
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): late-shipment priority classes — join with a
    non-equi lateness predicate plus conditional CASE sums."""
    return _sql_query(spark, sf_dir, Q12_SHIPPING_PRIORITY_CLASS)


@register("sql_tpch_q16", oracle=Q16_PART_SUPPLIER_COUNT, tags=("A3", "J4"))
def q_sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted): supplier diversity per part class — distinct
    aggregation (two-phase shuffle) with a NOT IN anti-join exclusion."""
    return _sql_query(spark, sf_dir, Q16_PART_SUPPLIER_COUNT)


@register("sql_tpch_q19", oracle=Q19_DISCOUNTED_REVENUE, tags=("J1", "A2", "P2"))
def q_sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted): OR-of-ANDs disjunctive join predicate — the
    brand/size/quantity bands partially push down to both scans while the
    residual disjunct evaluates post-join."""
    return _sql_query(spark, sf_dir, Q19_DISCOUNTED_REVENUE)


@register("sql_tpch_q20", oracle=Q20_POTENTIAL_PROMOTION, tags=("J3", "A1"))
def q_sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): nested semi-join chain — IN over a share
    threshold derived from two stacked aggregations."""
    return _sql_query(spark, sf_dir, Q20_POTENTIAL_PROMOTION)


@register("sql_tpch_q21", oracle=Q21_WAITING_SUPPLIER, tags=("J3", "J4", "A1"))
def q_sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): waiting suppliers — EXISTS (semi) + NOT EXISTS
    (anti) against the same fact with an outer-correlated date predicate."""
    return _sql_query(spark, sf_dir, Q21_WAITING_SUPPLIER)


# Flink SQL's windowing TVF (TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL
# '1' DAY)) expressed through OUR SQL entry point: Spark's SQL dialect
# spells it `GROUP BY window(ts, '1 day')`.  Unlike the TPC-H strings above
# this is dialect-specific, so the oracle reconstructs windows with epoch
# arithmetic instead of running the same text.
SQL_WINDOW_TUMBLE = """
    SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
           date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY window(ts, '1 day'), event_type
"""


@register(
    "sql_window_tumble",
    oracle="""
        SELECT strftime(make_timestamp(
                   CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) * 1000000),
                   '%Y-%m-%d %H:%M:%S') AS window_start,
               strftime(make_timestamp(
                   CAST((floor(epoch(ts) / 86400) * 86400 + 86400) AS BIGINT)
                   * 1000000),
                   '%Y-%m-%d %H:%M:%S') AS window_end,
               event_type,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2, 3
    """,
    tags=("T2", "A1"),
)
def q_sql_window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL TUMBLE TVF parity on the SQL surface: event-time tumbling
    windows declared in pure SQL (`GROUP BY window(ts, '1 day')`), planned
    by Catalyst as the same single partial+final windowed aggregate the
    DataFrame form produces (streaming twin: stream_tumbling_window)."""
    return _sql_query(spark, sf_dir, SQL_WINDOW_TUMBLE)
