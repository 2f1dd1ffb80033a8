"""Analytics extras: lateral explode (UNNEST), FILTER-clause aggregates,
and an interpolation-free median — tier-M SQL surfaces (SURVEY.md §2.5)
plus the text-histogram shape every corpus pipeline runs.

One SQL text serves both engines where the dialects agree; the median
deliberately selects an existing row via ROW_NUMBER (engines disagree on
percentile interpolation, so parity comes from selection, not
arithmetic).
"""

from __future__ import annotations

from tiledb_mariadb_spark.sources.registry import register_views
from tiledb_mariadb_spark.suite import QuerySpec, dsum_sql


def _sql(tables, sql):
    def run(spark, sf_dir):
        from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

        tune_for_oracle(spark)
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


# --- q42: word histogram via lateral explode -------------------------------
# Spark: LATERAL VIEW explode == DuckDB UNNEST; top-20 needs a total
# order (count desc, word asc — word is unique after grouping).
Q42_SPARK = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM documents LATERAL VIEW explode(split(trim(text), ' ')) t AS word
WHERE doc_id < 500
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 20
"""
Q42_DUCK = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT UNNEST(str_split(TRIM(text), ' ')) AS word
      FROM documents WHERE doc_id < 500)
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 20
"""


# --- q43: FILTER-clause aggregates ------------------------------------------
Q43_SQL = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
       {dsum_sql('o_totalprice')} AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q44: median without interpolation --------------------------------------
Q44_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM orders
)
SELECT o_orderpriority, o_totalprice AS median_price
FROM ranked
WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
ORDER BY o_orderpriority
"""


def q42_spark(spark, sf_dir):
    return _sql(("documents",), Q42_SPARK)(spark, sf_dir)


# --- q45: bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) ----------------
# q16 covers DISTINCT set ops; the ALL variants preserve multiplicity —
# duplicates in the multiset difference/intersection must survive.
Q45_SQL = """
SELECT 'except_all' AS op, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
  EXCEPT ALL
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'intersect_all' AS op, k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
  INTERSECT ALL
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
"""


# --- q49: UTF-8 predicates (t/utf8_pushdown.test analog) --------------------
# The corpus is ASCII, so multibyte content is synthesized determinis-
# tically; LIKE / equality / LENGTH over multibyte strings must agree
# (both engines are character-semantics UTF-8 here).
Q49_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN lang = 'zh' THEN '你好 ' || text
              WHEN lang = 'fr' THEN 'héllo ' || text
              ELSE text END AS txt
  FROM documents)
SELECT doc_id, CAST(LENGTH(txt) AS BIGINT) AS n_chars,
       CASE WHEN txt LIKE '你%' THEN 'zh'
            WHEN txt LIKE 'héllo%' THEN 'fr'
            ELSE 'other' END AS bucket
FROM t
WHERE txt LIKE '你好%' OR txt LIKE 'héllo%'
"""


# --- q59: semi-structured JSON extraction ----------------------------------
# events.props is a JSON string; path extraction + typed aggregation.
Q59_SPARK = """
SELECT event_type,
       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""
Q59_DUCK = """
SELECT event_type,
       CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS = [
    QuerySpec("q42_word_histogram", q42_spark, Q42_DUCK, "lateral explode/UNNEST"),
    QuerySpec(
        "q59_json_extract", _sql(("events",), Q59_SPARK), Q59_DUCK,
        "JSON path extraction + typed agg",
    ),
    QuerySpec(
        "q49_utf8_predicates", _sql(("documents",), Q49_SQL), Q49_SQL,
        "multibyte LIKE/LENGTH parity",
    ),
    QuerySpec(
        "q45_setops_all", _sql(("orders",), Q45_SQL), Q45_SQL,
        "EXCEPT ALL / INTERSECT ALL multiset semantics",
    ),
    QuerySpec(
        "q43_filtered_agg", _sql(("orders",), Q43_SQL), Q43_SQL, "FILTER-clause aggs"
    ),
    QuerySpec(
        "q44_median_rows", _sql(("orders",), Q44_SQL), Q44_SQL,
        "median by row selection (no interpolation)",
    ),
]
