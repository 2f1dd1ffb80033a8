"""Remaining classic TPC-H query shapes (Q2, Q7-Q10, Q13, Q15, Q16, Q19-Q22).

Tier-M surface: the reference executes arbitrary decision-support SQL through
MariaDB's executor above the handler (SURVEY.md §2.4-2.5; joins t/join.test,
mrr_triple_join.test; subqueries pass through because cond_push bails on
non-constant args, ha_mytile.cc:2528-2532 — the server evaluates them over
plain scans).  These specs complete the TPC-H shape census started in
core/joins/subqueries: nation-pair volume (Q7), market share ratio (Q8),
profit by nation-year (Q9), returned-item top-k (Q10), outer-join histogram
(Q13), CTE + scalar-max view (Q15), NOT IN + COUNT DISTINCT (Q16),
disjunctive pushdown (Q19), nested IN with grouped HAVING (Q20),
multi-alias EXISTS/NOT EXISTS self-joins (Q21), and anti-join over an
aggregate threshold (Q22).  Columns absent from the synthetic schema
(partsupp, ship/commit/receipt dates, phone) are substituted with
shape-preserving analogs on existing columns.

ONE SQL string drives both engines (Spark over temp views, DuckDB over the
driver's pre-registered views), so the oracle is twinned by construction.
Determinism follows the suite conventions: scaled-BIGINT sums, integer-space
threshold compares, BIGINT casts on computed ints, unique-key tiebreaks
before any LIMIT.

Scale notes (100 TB stance): every fact-side join here keys on
l_orderkey/l_partkey/l_suppkey — the shuffle is on the join key and AQE
handles skew; dimension sides (nation, region, supplier, part at TPC-H
ratios) broadcast.  Q21's two correlated EXISTS over lineitem decorrelate to
aggregates on l_orderkey — same-key shuffles that AQE coalesces; no
nested-loop survives the plan.  The Q13 histogram's second aggregation is on
c_count (tiny domain) — a near-free shuffle after the first.
"""

from __future__ import annotations

from tiledb_mariadb_spark.sources.registry import register_views
from tiledb_mariadb_spark.suite import QuerySpec, dsum_sql


def _sql(tables):
    def make(sql):
        def run(spark, sf_dir):
            from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

            tune_for_oracle(spark)
            register_views(spark, sf_dir, tables)
            return spark.sql(sql)

        return run

    return make


REV6 = dsum_sql("l_extendedprice * (1.0 - l_discount)", 6)

# --- q100: TPC-H Q7 volume shipping — nation-pair revenue by ship year ------
Q100_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume', 6)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1.0 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# --- q101: TPC-H Q8 market share — nation's fraction of regional volume -----
# Numerator/denominator accumulated as scaled BIGINTs in one pass
# (conditional SUM), ratio = one IEEE divide of two exactly-equal int64s.
Q101_SQL = """
SELECT o_year,
       CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
              THEN CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 1000000.0) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS nation_vol,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 1000000.0) AS BIGINT)) AS BIGINT) AS total_vol
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
  GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
) all_nations
ORDER BY o_year
"""

# --- q102: TPC-H Q9 product-type profit by supplier nation and year ---------
# partsupp.ps_supplycost is absent → p_retailprice*l_quantity as the cost
# leg; identical parenthesization keeps per-row doubles bit-equal.
Q102_SQL = f"""
SELECT nation, o_year, {dsum_sql('amount', 6)} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         (l.l_extendedprice * (1.0 - l.l_discount)) - (p.p_retailprice * l.l_quantity) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year
"""

# --- q103: TPC-H Q10 returned-item report — top customers by 'R' revenue ----
# LIMIT is preceded by a total order (revenue is bit-identical both engines;
# c_custkey breaks ties uniquely).
Q103_SQL = f"""
SELECT c.c_custkey, c.c_name, {REV6} AS revenue, c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# --- q104: TPC-H Q13 customer distribution — outer-join count histogram -----
# Pure integer pipeline; the ON-clause extra predicate (not a WHERE) keeps
# zero-order customers, which is the point of the shape.
Q104_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# --- q105: TPC-H Q15 top supplier — CTE view + scalar-MAX equality ----------
# Revenue kept as the scaled integer until the final projection so the MAX
# equality is exact.
Q105_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(total_c AS DOUBLE) / 1000000.0 AS total_revenue
FROM supplier s
JOIN revenue ON s.s_suppkey = supplier_no
WHERE total_c = (SELECT MAX(total_c) FROM revenue)
ORDER BY s.s_suppkey
"""

# --- q106: TPC-H Q16 parts/supplier relationship — NOT IN + COUNT DISTINCT --
Q106_SQL = """
SELECT p.p_brand, p.p_size, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
"""

# --- q107: TPC-H Q19 discounted revenue — OR of conjunctive predicate arms --
# The disjunction mixes part and lineitem columns per arm: Catalyst extracts
# the common l_partkey join key and pushes a per-table OR residual to each
# scan (the reference's cond_push builds the same OR QueryCondition tree,
# ha_mytile.cc:1972-2030).
Q107_SQL = f"""
SELECT {REV6} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1.0 AND l.l_quantity <= 11.0)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10.0 AND l.l_quantity <= 20.0)
   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20.0 AND l.l_quantity <= 30.0)
"""

# --- q108: TPC-H Q20 potential promotion — nested IN + grouped HAVING -------
# Quantity threshold compared in scaled-integer space (50 units → 5000).
Q108_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT) > 5000
)
ORDER BY s.s_suppkey
"""

# --- q109: TPC-H Q21 waiting-orders analog — EXISTS + NOT EXISTS self-joins -
# No commit/receipt dates in the synthetic schema; the shape-preserving
# analog: supplier's 'R' line in a finished multi-supplier order where no
# OTHER supplier's line was returned.
Q109_SQL = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""

# --- q110: TPC-H Q22 global sales opportunity — threshold + anti-join -------
# "Country code" analog: c_custkey % 7.  avg compare is integer-exact:
# acctbal_scaled * n > sum_scaled  ⇔  acctbal > avg(acctbal | acctbal > 0).
# The NOT EXISTS arm excludes customers with any urgent order.
Q110_SQL = f"""
WITH pos AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       {dsum_sql('c_acctbal', 2)} AS totacctbal
FROM (
  SELECT CAST(c.c_custkey % 7 AS BIGINT) AS cntrycode, c.c_acctbal
  FROM customer c, pos
  WHERE CAST(ROUND(c.c_acctbal * 100.0) AS BIGINT) * pos.n > pos.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""

# --- q111: TPC-H Q2 analog — correlated MIN equality (min-cost supplier) ----
# partsupp is absent: the min is over lineitem prices per part; equality on
# stored doubles is exact (both engines compare the same parquet values).
Q111_SQL = """
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, l.l_extendedprice
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 7
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_suppkey
"""

# --- q171: TPC-H Q12 shipping-modes-and-priority analog ---------------------
# l_shipmode / l_commitdate / l_receiptdate are absent from the synthetic
# schema: l_returnflag stands in as the 3-value mode column and "received
# late" becomes "shipped >60 days after the order date" — same join shape
# (lineitem⋈orders on the orderkey), same conditional-count aggregation.
# 100 TB stance: one same-key shuffle on l_orderkey; the date arithmetic and
# CASE arms fold into the scan-side projection.
Q171_SQL = """
SELECT l.l_returnflag AS l_mode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
ORDER BY l_mode
"""

# --- q172: TPC-H Q11 important-stock analog ---------------------------------
# partsupp is absent: lineitem is the supply fact (ps_supplycost*ps_availqty
# → l_extendedprice*l_quantity), filtered to one supplier nation.  The
# HAVING threshold compares scaled BIGINTs cross-multiplied against the
# corpus total — integer-exact on both engines (fraction 1/2000); the final
# part_value is one int64→double conversion + one IEEE divide.
# 100 TB stance: the CTE is computed once (Spark materializes it per use,
# but both uses group on the same l_partkey shuffle key and the scalar total
# is a one-row broadcast); no correlated re-scan survives decorrelation.
Q172_SQL = """
WITH supply AS (
  SELECT l.l_partkey,
         CAST(ROUND(l.l_extendedprice * l.l_quantity * 100.0) AS BIGINT) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey,
       (CAST(CAST(SUM(val) AS BIGINT) AS DOUBLE) / 100.0) AS part_value
FROM supply
GROUP BY l_partkey
HAVING CAST(SUM(val) AS BIGINT) * 2000 >
       (SELECT CAST(SUM(val) AS BIGINT) FROM supply)
ORDER BY part_value DESC, l_partkey
"""

_ALL = _sql(
    ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
)

SPECS = [
    QuerySpec(
        "q100_volume_shipping",
        _ALL(Q100_SQL),
        Q100_SQL,
        "TPC-H Q7: nation-pair shipping volume by year (t/join.test tier).",
    ),
    QuerySpec(
        "q101_market_share",
        _ALL(Q101_SQL),
        Q101_SQL,
        "TPC-H Q8: national market share ratio within a region.",
    ),
    QuerySpec(
        "q102_product_profit",
        _ALL(Q102_SQL),
        Q102_SQL,
        "TPC-H Q9: profit by supplier nation and order year.",
    ),
    QuerySpec(
        "q103_returned_items",
        _ALL(Q103_SQL),
        Q103_SQL,
        "TPC-H Q10: top-20 customers by returned-line revenue.",
    ),
    QuerySpec(
        "q104_cust_distribution",
        _ALL(Q104_SQL),
        Q104_SQL,
        "TPC-H Q13: orders-per-customer histogram via outer join.",
    ),
    QuerySpec(
        "q105_top_supplier",
        _ALL(Q105_SQL),
        Q105_SQL,
        "TPC-H Q15: max-revenue supplier via CTE + scalar subquery.",
    ),
    QuerySpec(
        "q106_parts_supplier_cnt",
        _ALL(Q106_SQL),
        Q106_SQL,
        "TPC-H Q16: COUNT DISTINCT suppliers with NOT IN exclusion.",
    ),
    QuerySpec(
        "q107_disjunctive_revenue",
        _ALL(Q107_SQL),
        Q107_SQL,
        "TPC-H Q19: OR-of-conjunctions pushdown across a join.",
    ),
    QuerySpec(
        "q108_potential_promotion",
        _ALL(Q108_SQL),
        Q108_SQL,
        "TPC-H Q20: nested IN subqueries with grouped HAVING threshold.",
    ),
    QuerySpec(
        "q109_waiting_orders",
        _ALL(Q109_SQL),
        Q109_SQL,
        "TPC-H Q21 analog: EXISTS + NOT EXISTS multi-alias self-joins.",
    ),
    QuerySpec(
        "q110_global_sales",
        _ALL(Q110_SQL),
        Q110_SQL,
        "TPC-H Q22 analog: above-average balance + anti-join on orders.",
    ),
    QuerySpec(
        "q111_min_cost_supplier",
        _ALL(Q111_SQL),
        Q111_SQL,
        "TPC-H Q2 analog: correlated MIN equality per part.",
    ),
    QuerySpec(
        "q171_shipmode_priority",
        _ALL(Q171_SQL),
        Q171_SQL,
        "TPC-H Q12 analog: late-shipment priority counts by mode column.",
    ),
    QuerySpec(
        "q172_important_stock",
        _ALL(Q172_SQL),
        Q172_SQL,
        "TPC-H Q11 analog: part values above a fraction of national supply.",
    ),
]
