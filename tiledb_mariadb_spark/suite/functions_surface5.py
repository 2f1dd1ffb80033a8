"""Function-surface conformance, batch 5: quantified comparisons
(ALL/ANY) and positional explode with ordinality.

Dialect notes:

- Spark SQL has no ``> ALL (subquery)`` / ``> ANY (subquery)``; the
  standard decorrelation is ``> (SELECT MAX ...)`` / ``> (SELECT MIN
  ...)`` — with the empty-subquery edge handled explicitly: ``> ALL
  (empty)`` is vacuously TRUE (the MAX rewrite yields NULL, so it is
  wrapped in ``COALESCE(..., TRUE)``), while ``> ANY (empty)`` is FALSE
  (NULL already filters out, pinned with ``COALESCE(..., FALSE)``).
  At sf0.001 some nations genuinely have no suppliers, so the gate
  exercises this edge.  The oracle runs DuckDB's *native* quantified
  comparison, so the spec pins that the rewrite is semantics-preserving.
- Spark ``posexplode`` is 0-based; the DuckDB twin unnests an index
  range and subtracts 1.
- ``any_value`` is only hash-comparable when every value in the group is
  identical — here it picks the region name, constant per region key.
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


# --- q131: quantified comparisons (ALL / ANY) -------------------------------
# Customers whose balance beats every supplier balance in their nation
# (ALL), or beats at least one (ANY), counted per nation.
Q131_SPARK = """
SELECT c_nationkey,
       CAST(COUNT(*) FILTER (WHERE COALESCE(c_acctbal >
            (SELECT MAX(s_acctbal) FROM supplier s
             WHERE s.s_nationkey = c.c_nationkey), TRUE)) AS BIGINT) AS beats_all,
       CAST(COUNT(*) FILTER (WHERE COALESCE(c_acctbal >
            (SELECT MIN(s_acctbal) FROM supplier s
             WHERE s.s_nationkey = c.c_nationkey), FALSE)) AS BIGINT) AS beats_any,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer c
GROUP BY c_nationkey
ORDER BY c_nationkey
"""
Q131_DUCK = """
SELECT c_nationkey,
       CAST(COUNT(*) FILTER (WHERE c_acctbal > ALL
            (SELECT s_acctbal FROM supplier s
             WHERE s.s_nationkey = c.c_nationkey)) AS BIGINT) AS beats_all,
       CAST(COUNT(*) FILTER (WHERE c_acctbal > ANY
            (SELECT s_acctbal FROM supplier s
             WHERE s.s_nationkey = c.c_nationkey)) AS BIGINT) AS beats_any,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer c
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- q132: posexplode (explode with ordinality) + any_value -----------------
Q132_SPARK = """
SELECT n_regionkey,
       CAST(pos AS BIGINT) AS pos,
       word,
       any_value(r_name) AS region
FROM (SELECT n_regionkey, n_name, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey)
LATERAL VIEW posexplode(split(n_name, '_')) t AS pos, word
GROUP BY n_regionkey, pos, word
ORDER BY n_regionkey, pos, word
"""
Q132_DUCK = """
SELECT n_regionkey,
       CAST(i.i - 1 AS BIGINT) AS pos,
       ws[i.i] AS word,
       any_value(r_name) AS region
FROM (SELECT n_regionkey, str_split(n_name, '_') AS ws, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey),
     UNNEST(range(1, len(ws) + 1)) AS i(i)
GROUP BY n_regionkey, i.i, ws[i.i]
ORDER BY n_regionkey, pos, word
"""


SPECS = [
    QuerySpec(
        "q131_quantified_cmp", _sql(("customer", "supplier"), Q131_SPARK), Q131_DUCK,
        "ALL/ANY quantified comparison via MAX/MIN rewrite",
    ),
    QuerySpec(
        "q132_posexplode", _sql(("nation", "region"), Q132_SPARK), Q132_DUCK,
        "posexplode ordinality + any_value",
    ),
]
