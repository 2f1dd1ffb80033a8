"""Function-surface conformance, batch 6: JOIN USING / NATURAL JOIN and
inline VALUES table constructors.

The TPC-H-style tables share no column names across tables (n_regionkey
vs r_regionkey), so the USING/NATURAL specs align names in subqueries —
the surface under test is the join syntax (single output key column,
name-matched equi-keys), identical in both dialects.
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


# --- q133: JOIN USING + NATURAL JOIN ----------------------------------------
Q133_SQL = """
SELECT regionkey,
       r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation)
JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) USING (regionkey)
GROUP BY regionkey, r_name
ORDER BY regionkey
"""

Q133B_SQL = """
SELECT regionkey,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT n_regionkey AS regionkey, n_name FROM nation)
NATURAL JOIN (SELECT r_regionkey AS regionkey FROM region)
GROUP BY regionkey
ORDER BY regionkey
"""


# --- q134: inline VALUES table joined to a fact table -----------------------
Q134_SQL = """
SELECT w.label,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) * w.weight) AS BIGINT)
         AS weighted_cents
FROM orders
JOIN (VALUES ('1-URGENT', 3, 'hot'),
             ('2-HIGH', 2, 'hot'),
             ('3-MEDIUM', 1, 'warm'),
             ('4-NOT SPECIFIED', 1, 'warm'),
             ('5-LOW', 0, 'cold')) AS w(prio, weight, label)
  ON o_orderpriority = w.prio
GROUP BY w.label
ORDER BY w.label
"""


SPECS = [
    QuerySpec(
        "q133_join_using", _sql(("nation", "region"), Q133_SQL), Q133_SQL,
        "JOIN USING single-key output",
    ),
    QuerySpec(
        "q133b_natural_join", _sql(("nation", "region"), Q133B_SQL), Q133B_SQL,
        "NATURAL JOIN name-matched keys",
    ),
    QuerySpec(
        "q134_values_inline", _sql(("orders",), Q134_SQL), Q134_SQL,
        "inline VALUES dimension join (broadcast-able literal dim)",
    ),
]
