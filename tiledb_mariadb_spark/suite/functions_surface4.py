"""Function-surface conformance, batch 4: correlated LATERAL joins,
recursive CTEs, GROUP BY ALL, array slice/flatten/position, and
epoch-bucketed time rollups.

Dialect notes:

- Correlated LATERAL aggregate subqueries parse identically on both
  engines (Spark 3.2+ LateralJoin, DuckDB lateral).
- ``WITH RECURSIVE`` is supported by Spark 4 and DuckDB with the same
  UNION ALL fixpoint semantics.
- Spark ``slice(arr, start, len)`` == DuckDB ``arr[start : start+len-1]``
  (both 1-indexed, DuckDB end-inclusive).
- ``events.value`` is a full-precision double → only COUNT/MIN/MAX are
  hash-comparable on it (no scaled-int sum exists); bucket keys come
  from exact epoch-seconds integer arithmetic (session tz pinned UTC).
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


# --- q126: correlated LATERAL aggregate subquery ----------------------------
Q126_SQL = """
SELECT n_name,
       CAST(t.top_cents AS BIGINT) AS top_cents,
       CAST(t.n_cust AS BIGINT) AS n_cust
FROM nation n,
LATERAL (SELECT MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS top_cents,
                COUNT(*) AS n_cust
         FROM customer c
         WHERE c.c_nationkey = n.n_nationkey) t
ORDER BY n_name
"""


# --- q127: recursive CTE (data-dependent depth) -----------------------------
Q127_SQL = """
WITH RECURSIVE r(x, sq) AS (
  SELECT 1, CAST(1 AS BIGINT)
  UNION ALL
  SELECT x + 1, CAST((x + 1) AS BIGINT) * (x + 1)
  FROM r WHERE x < (SELECT MAX(p_size) FROM part)
)
SELECT CAST(COUNT(*) AS BIGINT) AS depth,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(sq) AS BIGINT) AS sum_sq
FROM r
"""


# --- q128: GROUP BY ALL + positional ORDER BY -------------------------------
Q128_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY ALL
ORDER BY 1, 2
"""


# --- q129: array slice / flatten / position / contains ----------------------
Q129_SPARK = """
SELECT p_partkey,
       array_join(transform(slice(sequence(1, 10), p_size % 5 + 1, 3),
                            x -> CAST(x AS STRING)), ',') AS sl,
       array_join(transform(flatten(array(sequence(1, p_size % 3 + 1), sequence(7, 8))),
                            x -> CAST(x AS STRING)), ',') AS fl,
       CAST(array_position(sequence(0, 45, 5), p_size - p_size % 5) AS BIGINT) AS pos,
       array_contains(sequence(1, 10), p_size) AS has_size
FROM part
WHERE p_partkey % 89 = 0
ORDER BY p_partkey
"""
Q129_DUCK = """
SELECT p_partkey,
       array_to_string(list_transform((range(1, 11))[p_size % 5 + 1 : p_size % 5 + 3],
                                      x -> CAST(x AS VARCHAR)), ',') AS sl,
       array_to_string(list_transform(flatten([range(1, p_size % 3 + 2), range(7, 9)]),
                                      x -> CAST(x AS VARCHAR)), ',') AS fl,
       CAST(list_position(range(0, 46, 5), p_size - p_size % 5) AS BIGINT) AS pos,
       list_contains(range(1, 11), p_size) AS has_size
FROM part
WHERE p_partkey % 89 = 0
ORDER BY p_partkey
"""


# --- q130: epoch-bucketed time rollup ---------------------------------------
Q130_SPARK = """
SELECT CAST(FLOOR(unix_timestamp(ts) / 3600) AS BIGINT) AS hour_bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events
WHERE event_id % 11 = 0
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
LIMIT 50
"""
Q130_DUCK = """
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events
WHERE event_id % 11 = 0
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
LIMIT 50
"""


SPECS = [
    QuerySpec(
        "q126_lateral_join", _sql(("nation", "customer"), Q126_SQL), Q126_SQL,
        "correlated LATERAL aggregate subquery",
    ),
    QuerySpec(
        "q127_recursive_cte", _sql(("part",), Q127_SQL), Q127_SQL,
        "WITH RECURSIVE fixpoint series",
    ),
    QuerySpec(
        "q128_group_by_all", _sql(("orders",), Q128_SQL), Q128_SQL,
        "GROUP BY ALL + positional ORDER BY",
    ),
    QuerySpec(
        "q129_array_slice", _sql(("part",), Q129_SPARK), Q129_DUCK,
        "slice/flatten/position/contains",
    ),
    QuerySpec(
        "q130_time_bucket", _sql(("events",), Q130_SPARK), Q130_DUCK,
        "epoch-arithmetic hourly rollup",
    ),
]
