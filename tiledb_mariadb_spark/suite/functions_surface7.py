"""Function-surface conformance, batch 7: GROUPING() introspection,
windowed COUNT(DISTINCT), edit-distance fuzzy matching, time-series gap
filling, and exact diversity (Gini) scoring.

Reference parity: GROUPING SETS introspection mirrors the reference's
WITH ROLLUP handling (mysql-test/mytile/t/aggregates.test analogs);
gap-fill is the dense-domain counterpart of the dense-fill read
(mytile/ha_mytile.cc dense subarray iteration — absent cells materialize
with fill values, here absent hours materialize on a generated spine).

Determinism notes (see suite/__init__ docstring for the conventions):
- GROUPING() returns tinyint in Spark, int in DuckDB → CAST BIGINT.
- Spark has no COUNT(DISTINCT) OVER — `size(collect_set() OVER w)` is
  the exact JVM-side equivalent (set semantics, order-free).
- Gini impurity is computed as 1 - Σc²/n² with exact BIGINT sums and ONE
  double division, not Σ(c/n)² whose float accumulation order differs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tiledb_mariadb_spark.sources.registry import register_views
from tiledb_mariadb_spark.suite import QuerySpec, t


# --- q160: GROUPING SETS + GROUPING() introspection -------------------------
Q160_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q160_grouping_id(spark, sf_dir):
    from tiledb_mariadb_spark.session import tune_for_oracle  # noqa: PLC0415

    tune_for_oracle(spark)
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(Q160_SQL)


# --- q161: COUNT(DISTINCT) over a window ------------------------------------
def q161_window_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderstatus").over(w))
        .cast("bigint")
        .alias("n_statuses"),
    )


Q161_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(COUNT(DISTINCT o_orderstatus) OVER (PARTITION BY o_custkey) AS BIGINT)
         AS n_statuses
FROM orders WHERE o_custkey < 200
"""


# --- q165: edit-distance fuzzy matching (catalog near-dup) ------------------
# The string-space member of the dedup family (embedding-space: q76/q159;
# shingle-space: q64-q67): candidate pairs blocked on p_brand (the LSH
# bucket analog — quadratic work confined to blocks), verified by exact
# Levenshtein distance.  JVM built-in both sides.
def q165_fuzzy_match(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    a = p.select(
        F.col("p_partkey").alias("a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
    )
    return (
        a.join(b, (F.col("brand") == F.col("brand_b")) & (F.col("a") < F.col("b")))
        .select(
            "a",
            "b",
            "brand",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
    )


Q165_SQL = """
SELECT x.p_partkey AS a, y.p_partkey AS b, x.p_brand AS brand,
       CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS edit_dist
FROM part x JOIN part y
  ON x.p_brand = y.p_brand AND x.p_partkey < y.p_partkey
WHERE x.p_partkey < 300 AND y.p_partkey < 300
  AND levenshtein(x.p_name, y.p_name) <= 4
"""


# --- q167: time-series gap fill on a generated hour spine -------------------
# Dense-domain semantics over a sparse event log: every hour in the
# observed range materializes (generated spine — partition-local array
# expansion, no shuffle), missing hours carry n_events=0 and forward-fill
# the last seen hourly sum.  At scale the spine is generated per
# time-partition, the hourly pre-aggregation shrinks the shuffle to one
# row per hour, and the forward-fill window runs over that tiny rollup —
# never over raw events.
def q167_gap_fill(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).cast("double")
            / F.lit(100.0)
        ).alias("sum_value"),
    )
    bounds = hourly.agg(
        F.min("h").alias("h_min"), F.max("h").alias("h_max")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(hourly, "h", "left")
        .select(
            "h",
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


Q167_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_value
  FROM events WHERE user_id < 20
  GROUP BY 1),
spine AS (
  SELECT unnest(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h
  FROM hourly)
SELECT s.h,
       COALESCE(hourly.n_events, 0) AS n_events,
       LAST_VALUE(hourly.sum_value IGNORE NULLS) OVER
         (ORDER BY s.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_sum
FROM spine s LEFT JOIN hourly ON s.h = hourly.h
"""


# --- q168: exact Gini diversity of the corpus language mix ------------------
def q168_gini_diversity(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        )
        .select(
            "source",
            "n_docs",
            (
                F.lit(1.0)
                - F.col("ss").cast("double")
                / (F.col("n_docs") * F.col("n_docs")).cast("double")
            ).alias("gini"),
        )
    )


Q168_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang),
s AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM c GROUP BY source)
SELECT source, n_docs,
       1.0 - CAST(ss AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE) AS gini
FROM s
"""


SPECS = [
    QuerySpec(
        "q160_grouping_id", q160_grouping_id, Q160_SQL,
        "GROUPING SETS with GROUPING() super-aggregate introspection",
    ),
    QuerySpec(
        "q161_window_distinct", q161_window_distinct, Q161_SQL,
        "COUNT(DISTINCT) over a window (collect_set twin)",
    ),
    QuerySpec(
        "q165_fuzzy_match", q165_fuzzy_match, Q165_SQL,
        "Levenshtein fuzzy near-dup, brand-blocked candidate pairs",
    ),
    QuerySpec(
        "q167_gap_fill", q167_gap_fill, Q167_SQL,
        "time-series gap fill: generated hour spine + forward fill",
    ),
    QuerySpec(
        "q168_gini_diversity", q168_gini_diversity, Q168_SQL,
        "exact Gini impurity of per-source language mix",
    ),
]
