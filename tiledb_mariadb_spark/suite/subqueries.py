"""Subquery / CTE surface — tier-M semantics the reference exercises through
MariaDB's executor above the handler (SURVEY.md §2.5; the plugin itself never
sees a subquery: its cond_push bails on non-constant arguments,
ha_mytile.cc:2528-2532, so MariaDB evaluates these shapes over plain scans).

In Spark these run through the SQL surface (spark.sql over temp views) so
Catalyst's subquery machinery — scalar-subquery execution, IN→semi-join
rewrite, CTE inlining, decorrelation — is what is actually under test.
Where DuckDB's dialect agrees, ONE SQL string is used for both engines,
keeping the oracle twinned by construction.

Determinism: all float aggregates use the scaled-BIGINT convention
(suite.__init__); threshold comparisons against aggregates are done in
exact integer space (e.g. q25's ``qty*cnt*5 < sum`` instead of
``qty < 0.2*avg``) so boundary rows cannot diverge between engines.

Scale notes: q24/q23's scalar subqueries broadcast one row — free at any
scale.  q25's per-partkey aggregate joins fact-to-fact on the join key both
sides already shuffle on; AQE handles skew.  q26/q27 IN-subqueries become
left-semi joins (broadcast when the subquery side is small).
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


# --- q23: CTE referenced by a scalar subquery over itself -------------------
# Nation revenue via WITH; keep the aggregate as an exact scaled BIGINT so
# the 80%-of-max threshold compare is integer-exact (rev*10 > max*8).
Q23_SQL = """
WITH nrev AS (
  SELECT n_name,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM nation
  JOIN customer ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY n_name
)
SELECT n_name, CAST(rev_c AS DOUBLE) / 100.0 AS revenue
FROM nrev
WHERE rev_c * 10 > (SELECT MAX(rev_c) FROM nrev) * 8
ORDER BY n_name
"""


# --- q24: uncorrelated scalar subquery in WHERE -----------------------------
# MAX is exact; one IEEE subtract; boundary-safe on both engines.
Q24_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (SELECT MAX(p_retailprice) FROM part) - 100.0
ORDER BY p_partkey
"""


# --- q25: correlated-avg shape (TPC-H Q17), decorrelated --------------------
# l_quantity < 0.2 * avg(l_quantity per part), compared entirely in scaled
# integer space: q*100 < sum_scaled/(5*cnt)  ⇔  q*100*cnt*5 < sum_scaled.
Q25_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('l.l_extendedprice')} AS total
FROM lineitem l
JOIN (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
  GROUP BY l_partkey
) a ON l.l_partkey = a.l_partkey
WHERE CAST(ROUND(l.l_quantity * 100.0) AS BIGINT) * a.cnt * 5 < a.sq
"""


# --- q26: IN-subquery → left-semi join rewrite ------------------------------
Q26_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('o_totalprice')} AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
"""


# --- q27: large-orders shape (TPC-H Q18): IN over GROUP BY ... HAVING -------
# HAVING threshold in exact scaled integers; LIMIT preceded by a total order
# (o_orderkey is unique).
Q27_SQL = """
SELECT c_name, o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
JOIN customer ON c_custkey = o.o_custkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) > 20000
)
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


# --- q28: GROUPING SETS (beyond q13 rollup / q14 cube) ----------------------
# Non-null group columns + COALESCE sentinel keeps the set label unambiguous
# without engine-specific GROUPING() result types.
Q28_SQL = f"""
SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY pri, status
"""


# --- q29: TPC-H Q6 forecast-revenue (pure pushdown filter + scalar agg) -----
Q29_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- q47: TPC-H Q4 shape — EXISTS-gated count by priority -------------------
Q47_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q48: TPC-H Q14 shape — conditional-aggregate ratio ---------------------
# Both sums are exact scaled BIGINTs; the final 100*a/b is one IEEE
# division of identical operands on both engines.
Q48_SQL = """
SELECT (100.0 * CAST(SUM(CASE WHEN p_type_flag = 1
              THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT)
              ELSE 0 END) AS DOUBLE))
       / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT)) AS DOUBLE)
       AS promo_revenue_pct
FROM (
  SELECT l_extendedprice, l_discount,
         CASE WHEN p_partkey % 5 = 0 THEN 1 ELSE 0 END AS p_type_flag
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
)
"""


SPECS = [
    QuerySpec(
        "q23_cte", _sql(("nation", "customer", "orders"))(Q23_SQL), Q23_SQL,
        "WITH + scalar subquery over the CTE",
    ),
    QuerySpec(
        "q47_priority_check", _sql(("orders", "lineitem"))(Q47_SQL), Q47_SQL,
        "TPC-H Q4 shape: correlated EXISTS count",
    ),
    QuerySpec(
        "q48_promo_revenue", _sql(("lineitem", "part"))(Q48_SQL), Q48_SQL,
        "TPC-H Q14 shape: conditional-agg ratio",
    ),
    QuerySpec(
        "q24_scalar_subquery", _sql(("part",))(Q24_SQL), Q24_SQL,
        "uncorrelated scalar subquery in WHERE",
    ),
    QuerySpec(
        "q25_correlated_avg", _sql(("lineitem",))(Q25_SQL), Q25_SQL,
        "TPC-H Q17 shape, integer-exact threshold",
    ),
    QuerySpec(
        "q26_in_subquery", _sql(("orders", "customer"))(Q26_SQL), Q26_SQL,
        "IN-subquery → semi-join rewrite",
    ),
    QuerySpec(
        "q27_large_orders", _sql(("orders", "customer", "lineitem"))(Q27_SQL),
        Q27_SQL, "TPC-H Q18 shape: IN over GROUP BY HAVING",
    ),
    QuerySpec(
        "q28_grouping_sets", _sql(("orders",))(Q28_SQL), Q28_SQL,
        "explicit GROUPING SETS",
    ),
    QuerySpec(
        "q29_revenue_filter", _sql(("lineitem",))(Q29_SQL), Q29_SQL,
        "TPC-H Q6: tight filter + scalar agg",
    ),
]
