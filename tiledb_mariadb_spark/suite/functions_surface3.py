"""Function-surface conformance, batch 3: map functions, UNPIVOT,
try_/null-propagating arithmetic, and statistical aggregates computed
exactly from integer moments.

Dialect notes:

- Map *results* are never returned directly (map iteration order is
  engine-defined and the driver's fingerprint stringifies dicts) — the
  queries extract scalars: ``element_at``, cardinality, sorted keys.
  DuckDB's ``element_at(m, k)`` returns a LIST (empty when absent);
  ``[1]`` unwraps it.
- Spark SQL ``UNPIVOT (v FOR k IN (...))`` == DuckDB
  ``UNPIVOT ... ON ... INTO NAME k VALUE v``.
- Spark 4 runs ANSI mode by default, so plain ``/0`` raises — the Spark
  side uses ``try_divide`` (NULL on zero divisor), matching DuckDB's
  ``/`` which yields NULL; both engines' ``/`` on integers is double
  division.
- ``stddev``/``corr`` builtins accumulate floats in engine-specific
  order → never hash-comparable.  Instead the moments (n, Σx, Σx²,
  Σxy) are exact BIGINT sums of floored dollar values; the final
  variance/correlation arithmetic is the same IEEE double expression
  on both sides, hence bit-identical.
"""

from __future__ import annotations

from tiledb_mariadb_spark.sources.registry import register_views
from tiledb_mariadb_spark.suite import QuerySpec


def _sql(tables, sql):
    def run(spark, sf_dir):
        from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

        tune_for_oracle(spark)
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


# --- q122: map construction + extraction ------------------------------------
Q122_SPARK = """
SELECT o_orderkey,
       CAST(element_at(map('key', o_orderkey, 'cust', o_custkey,
                           'cents', CAST(ROUND(o_totalprice * 100) AS BIGINT)),
                       'cents') AS BIGINT) AS cents,
       CAST(element_at(map('key', o_orderkey, 'cust', o_custkey), 'missing')
            AS BIGINT) AS absent,
       CAST(size(map('key', o_orderkey, 'cust', o_custkey)) AS BIGINT) AS m_size,
       array_join(array_sort(map_keys(map('key', o_orderkey, 'cust', o_custkey))), ',') AS ks
FROM orders
WHERE o_orderkey % 101 = 0
ORDER BY o_orderkey
"""
Q122_DUCK = """
SELECT o_orderkey,
       CAST(element_at(MAP(['key', 'cust', 'cents'],
                           [o_orderkey, o_custkey,
                            CAST(ROUND(o_totalprice * 100) AS BIGINT)]),
                       'cents')[1] AS BIGINT) AS cents,
       CAST(NULL AS BIGINT) AS absent,
       CAST(cardinality(MAP(['key', 'cust'], [o_orderkey, o_custkey])) AS BIGINT) AS m_size,
       array_to_string(list_sort(map_keys(MAP(['key', 'cust'], [o_orderkey, o_custkey]))), ',') AS ks
FROM orders
WHERE o_orderkey % 101 = 0
ORDER BY o_orderkey
"""


# --- q123: UNPIVOT ----------------------------------------------------------
Q123_SPARK = """
SELECT k, CAST(v AS BIGINT) AS v
FROM (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
      FROM orders)
UNPIVOT (v FOR k IN (total_cents, n_orders, n_custs))
ORDER BY k
"""
Q123_DUCK = """
SELECT k, CAST(v AS BIGINT) AS v
FROM (
  UNPIVOT (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
           FROM orders)
  ON total_cents, n_orders, n_custs INTO NAME k VALUE v
)
ORDER BY k
"""


# --- q124: try_/null-propagating arithmetic ---------------------------------
# try_cast over mixed parse/non-parse strings; /0 → NULL; NULLIF/COALESCE.
Q124_SPARK = """
SELECT doc_id,
       CAST(try_cast(CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS STRING)
                          ELSE concat('x', CAST(doc_id AS STRING)) END AS BIGINT)
            AS BIGINT) AS parsed,
       try_divide(CAST(n_chars AS DOUBLE), doc_id % 5) AS ratio,
       CAST(COALESCE(NULLIF(doc_id % 5, 0), -1) AS BIGINT) AS denom_or_neg1
FROM documents
WHERE doc_id % 41 = 0
ORDER BY doc_id
"""
Q124_DUCK = """
SELECT doc_id,
       CAST(try_cast(CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                          ELSE concat('x', CAST(doc_id AS VARCHAR)) END AS BIGINT)
            AS BIGINT) AS parsed,
       CAST(n_chars AS DOUBLE) / (doc_id % 5) AS ratio,
       CAST(COALESCE(NULLIF(doc_id % 5, 0), -1) AS BIGINT) AS denom_or_neg1
FROM documents
WHERE doc_id % 41 = 0
ORDER BY doc_id
"""


# --- q125: statistical aggregates from exact integer moments ----------------
# var_samp / stddev_samp / corr over floored dollar values, grouped.
# Moments are exact BIGINT; the closed-form final arithmetic is the same
# IEEE expression on both engines.
_MOMENTS = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sx,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sx2,
       CAST(SUM(o_custkey) AS BIGINT) AS sy,
       CAST(SUM(o_custkey * o_custkey) AS BIGINT) AS sy2,
       CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT) * o_custkey) AS BIGINT) AS sxy
FROM orders
GROUP BY o_orderstatus
"""
Q125_SQL = f"""
SELECT o_orderstatus, n,
       (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0) AS var_price,
       SQRT((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0)) AS stddev_price,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_price_cust
FROM ({_MOMENTS})
ORDER BY o_orderstatus
"""


SPECS = [
    QuerySpec(
        "q122_map_fns", _sql(("orders",), Q122_SPARK), Q122_DUCK,
        "map build/element_at/size/sorted keys",
    ),
    QuerySpec(
        "q123_unpivot", _sql(("orders",), Q123_SPARK), Q123_DUCK,
        "UNPIVOT wide→long",
    ),
    QuerySpec(
        "q124_try_arith", _sql(("documents",), Q124_SPARK), Q124_DUCK,
        "try_cast, /0→NULL, NULLIF/COALESCE",
    ),
    QuerySpec(
        "q125_stats_moments", _sql(("orders",), Q125_SQL), Q125_SQL,
        "var/stddev/corr from exact integer moments",
    ),
]
