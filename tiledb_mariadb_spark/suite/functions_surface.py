"""Scalar/aggregate function-surface conformance: bitwise & boolean
aggregates, higher-order array functions, regular expressions, ordered
string aggregation, interval arithmetic, and union-by-name.

The reference exposes MariaDB's full scalar-function surface above the
handler (SURVEY.md §2.5 — tier [M], e.g. mysql-test/mytile/t/datetimes.test
uses date literals and functions); these specs pin the Spark-side parity
for the function families the earlier queries (q17-q20) did not reach.

Determinism notes (see suite/__init__.py):

- double→int casts go through FLOOR (Spark truncates, DuckDB rounds);
  l_quantity is verified integral-valued so the cast is exact anyway.
- Spark ``sequence(1, n)`` is end-inclusive; DuckDB ``range(1, n+1)`` is
  end-exclusive — twinned accordingly.
- Spark ``regexp_replace`` is global by default; DuckDB needs the ``'g'``
  flag.
- Spark SQL has no ``UNION ALL BY NAME`` syntax — the Spark side uses the
  DataFrame ``unionByName`` API, the oracle uses DuckDB's ``BY NAME``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.sources.registry import register_views
from tiledb_mariadb_spark.suite import QuerySpec, dsum, dsum_sql, t


def _sql(tables, sql):
    def run(spark, sf_dir):
        from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

        tune_for_oracle(spark)
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


# --- q112: bitwise + boolean aggregates -------------------------------------
# BIT_AND/BIT_OR/BIT_XOR over int64 keys and BOOL_AND/BOOL_OR over
# predicates: identical spelling in both dialects.
Q112_SQL = """
SELECT o_orderpriority,
       CAST(BIT_AND(o_orderkey) AS BIGINT) AS band,
       CAST(BIT_OR(o_orderkey) AS BIGINT) AS bor,
       CAST(BIT_XOR(o_orderkey) AS BIGINT) AS bxor,
       BOOL_AND(o_totalprice > 1000) AS all_big,
       BOOL_OR(o_orderstatus = 'F') AS any_filled,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q113: higher-order array functions -------------------------------------
# transform / filter / aggregate over per-row generated integer arrays:
# sum of squares 1..qty and count of evens, rolled up per returnflag.
# Integer-only arithmetic → exact on both engines.
Q113_SPARK = """
SELECT l_returnflag,
       CAST(SUM(aggregate(transform(sequence(1, CAST(FLOOR(l_quantity) AS INT)),
                                    x -> CAST(x AS BIGINT) * x),
                          0L, (a, x) -> a + x)) AS BIGINT) AS sum_sq,
       CAST(SUM(size(filter(sequence(1, CAST(FLOOR(l_quantity) AS INT)),
                            x -> x % 2 = 0))) AS BIGINT) AS n_even,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_orderkey % 7 = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
Q113_DUCK = """
SELECT l_returnflag,
       CAST(SUM(list_sum(list_transform(range(1, CAST(FLOOR(l_quantity) AS INT) + 1),
                                        x -> CAST(x AS BIGINT) * x))) AS BIGINT) AS sum_sq,
       CAST(SUM(len(list_filter(range(1, CAST(FLOOR(l_quantity) AS INT) + 1),
                                x -> x % 2 = 0))) AS BIGINT) AS n_even,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_orderkey % 7 = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q114: regular expressions ----------------------------------------------
# extract (group + no-match → ''), match-count via extract_all, global
# replace, rlike filter.  Patterns kept to the RE2 ∩ java.util.regex
# common subset (character classes, quantifiers, one capture group).
Q114_SPARK = """
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]{7,})', 1) AS first_long_word,
       CAST(size(regexp_extract_all(text, '[0-9]+', 0)) AS BIGINT) AS n_numbers,
       substr(regexp_replace(text, '[aeiou]', '_'), 1, 40) AS devoweled,
       CAST(LENGTH(text) AS BIGINT) AS len
FROM documents
WHERE doc_id % 97 = 0 AND text RLIKE '[A-Za-z]{4,}'
ORDER BY doc_id
"""
Q114_DUCK = """
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]{7,})', 1) AS first_long_word,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
       substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled,
       CAST(LENGTH(text) AS BIGINT) AS len
FROM documents
WHERE doc_id % 97 = 0 AND regexp_matches(text, '[A-Za-z]{4,}')
ORDER BY doc_id
"""


# --- q115: ordered string aggregation ---------------------------------------
# Spark 4 LISTAGG ... WITHIN GROUP == DuckDB string_agg(... ORDER BY).
Q115_SPARK = """
SELECT r_name,
       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""
Q115_DUCK = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# --- q116: interval arithmetic ----------------------------------------------
# month-clamped adds (Jan 31 + 1 month → Feb 28), day subtraction,
# last_day, month-start truncation.  DuckDB's DATE/TIMESTAMP + INTERVAL
# yields TIMESTAMP; both sides are pinned to TIMESTAMP explicitly.
Q116_SPARK = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 3 MONTH AS plus3m,
       o_orderdate - INTERVAL 45 DAY AS minus45d,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(datediff(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE),
                     CAST(o_orderdate AS DATE)) AS BIGINT) AS span_days
FROM orders
WHERE o_orderkey % 61 = 0
ORDER BY o_orderkey
"""
Q116_DUCK = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
       CAST(o_orderdate - INTERVAL 45 DAY AS TIMESTAMP) AS minus45d,
       last_day(o_orderdate) AS month_end,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
                      CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS BIGINT) AS span_days
FROM orders
WHERE o_orderkey % 61 = 0
ORDER BY o_orderkey
"""


# --- q117: union by name ----------------------------------------------------
# Spark unionByName (DataFrame API — no SQL syntax for it) vs DuckDB
# UNION ALL BY NAME: columns aligned by name despite different order.
def q117_spark(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("customer").alias("kind"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("bal"),
    )
    both = cust.unionByName(supp).filter(F.col("bal") > 0)
    return (
        both.groupBy("kind")
        .agg(
            F.count("*").cast("long").alias("n"),
            dsum(F.col("bal")).alias("total_bal"),
            F.max("name").alias("max_name"),
        )
        .orderBy("kind")
    )


Q117_DUCK = f"""
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('bal')} AS total_bal,
       MAX(name) AS max_name
FROM (SELECT c_name AS name, c_acctbal AS bal, 'customer' AS kind FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS bal FROM supplier)
WHERE bal > 0
GROUP BY kind
ORDER BY kind
"""


SPECS = [
    QuerySpec(
        "q112_bitwise_bool_aggs", _sql(("orders",), Q112_SQL), Q112_SQL,
        "BIT_AND/OR/XOR + BOOL_AND/OR aggregates",
    ),
    QuerySpec(
        "q113_higher_order_arrays", _sql(("lineitem",), Q113_SPARK), Q113_DUCK,
        "transform/filter/aggregate array lambdas",
    ),
    QuerySpec(
        "q114_regex", _sql(("documents",), Q114_SPARK), Q114_DUCK,
        "regexp extract/extract_all/replace/rlike",
    ),
    QuerySpec(
        "q115_string_agg", _sql(("nation", "region"), Q115_SPARK), Q115_DUCK,
        "LISTAGG WITHIN GROUP / string_agg ordered",
    ),
    QuerySpec(
        "q116_interval_arith", _sql(("orders",), Q116_SPARK), Q116_DUCK,
        "INTERVAL add/sub, last_day, month-clamp",
    ),
    QuerySpec(
        "q117_union_by_name", q117_spark, Q117_DUCK,
        "unionByName / UNION ALL BY NAME column alignment",
    ),
]
