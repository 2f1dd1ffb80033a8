"""Function-surface conformance, batch 2: array set operations,
cryptographic hash functions, width_bucket histograms, and
percentile_disc ordered-set aggregates.

Dialect notes:

- Spark ``array_union/intersect/except`` have set semantics (dedup);
  DuckDB lacks ``list_union`` and its set ops don't pin order, so both
  sides sort and the oracle composes union from concat+distinct.
- ``md5`` / ``sha2(x,256)`` produce identical lowercase hex on both
  engines (verified) — value parity is exact.
- DuckDB has no ``width_bucket``; the oracle spells out the bucket
  formula with clamping (identical results away from bucket-boundary
  ties, which 2-decimal inputs can't hit at this lo/hi/n choice).
- ``percentile_disc`` selects an existing row (no interpolation), so
  double values compare exactly.
"""

from __future__ import annotations

from tiledb_mariadb_spark.sources.registry import register_views


def _sql(tables, sql):
    def run(spark, sf_dir):
        from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

        tune_for_oracle(spark)
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


from tiledb_mariadb_spark.suite import QuerySpec  # noqa: E402


# --- q118: array set operations ---------------------------------------------
Q118_SPARK = """
SELECT p_partkey,
       array_join(transform(array_sort(array_union(sequence(1, p_size % 5 + 2), sequence(3, 7))),
                            x -> CAST(x AS STRING)), ',') AS u,
       array_join(transform(array_sort(array_intersect(sequence(1, p_size % 5 + 2), sequence(3, 7))),
                            x -> CAST(x AS STRING)), ',') AS i,
       array_join(transform(array_sort(array_except(sequence(1, p_size % 5 + 2), sequence(3, 7))),
                            x -> CAST(x AS STRING)), ',') AS e,
       array_join(transform(array_sort(array_distinct(concat(sequence(1, 3), sequence(2, p_size % 4 + 2)))),
                            x -> CAST(x AS STRING)), ',') AS d
FROM part
WHERE p_partkey % 83 = 0
ORDER BY p_partkey
"""
Q118_DUCK = """
SELECT p_partkey,
       array_to_string(list_transform(list_sort(list_distinct(list_concat(range(1, p_size % 5 + 3), range(3, 8)))),
                                      x -> CAST(x AS VARCHAR)), ',') AS u,
       COALESCE(array_to_string(list_transform(list_sort(list_intersect(range(1, p_size % 5 + 3), range(3, 8))),
                                      x -> CAST(x AS VARCHAR)), ','), '') AS i,
       array_to_string(list_transform(list_sort(list_distinct(list_filter(range(1, p_size % 5 + 3),
                                           x -> NOT list_contains(range(3, 8), x)))),
                                      x -> CAST(x AS VARCHAR)), ',') AS e,
       array_to_string(list_transform(list_sort(list_distinct(list_concat(range(1, 4), range(2, p_size % 4 + 3)))),
                                      x -> CAST(x AS VARCHAR)), ',') AS d
FROM part
WHERE p_partkey % 83 = 0
ORDER BY p_partkey
"""


# --- q119: hash functions (md5 / sha256) ------------------------------------
Q119_SPARK = """
SELECT substr(md5(text), 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(sha2(text, 256)) AS min_sha
FROM documents
GROUP BY substr(md5(text), 1, 1)
ORDER BY bucket
"""
Q119_DUCK = """
SELECT substr(md5(text), 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(sha256(text)) AS min_sha
FROM documents
GROUP BY substr(md5(text), 1, 1)
ORDER BY bucket
"""


# --- q120: width_bucket histogram -------------------------------------------
Q120_SPARK = """
SELECT CAST(width_bucket(c_acctbal, 0, 10000, 7) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM customer
GROUP BY width_bucket(c_acctbal, 0, 10000, 7)
ORDER BY bucket
"""
Q120_DUCK = """
SELECT CAST(GREATEST(0, LEAST(8, FLOOR(c_acctbal * 7 / 10000.0) + 1)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM customer
GROUP BY 1
ORDER BY bucket
"""


# --- q121: percentile_disc ordered-set aggregate ----------------------------
Q121_SQL = """
SELECT o_orderpriority,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice) AS p90,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


SPECS = [
    QuerySpec(
        "q118_array_set_ops", _sql(("part",), Q118_SPARK), Q118_DUCK,
        "array union/intersect/except/distinct",
    ),
    QuerySpec(
        "q119_hash_fns", _sql(("documents",), Q119_SPARK), Q119_DUCK,
        "md5 / sha256 value parity",
    ),
    QuerySpec(
        "q120_width_bucket", _sql(("customer",), Q120_SPARK), Q120_DUCK,
        "width_bucket histogram with under/overflow buckets",
    ),
    QuerySpec(
        "q121_percentile_disc", _sql(("orders",), Q121_SQL), Q121_SQL,
        "percentile_disc WITHIN GROUP (row selection)",
    ),
]
