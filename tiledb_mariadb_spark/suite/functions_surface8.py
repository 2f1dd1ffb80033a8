"""Function-surface batch 8: NULL-ordering parity and the remaining
higher-order lambda functions.

* q233 — **NULLS FIRST / NULLS LAST ordering**: the engines DISAGREE by
  default (Spark ASC ⇒ NULLS FIRST, DuckDB ASC ⇒ NULLS LAST), so any
  query relying on the default silently diverges — this spec pins the
  explicit forms both ways with a total-order tiebreak so the row SET
  (top-k through nulls) is deterministic.
* q234 — **exists / forall / reduce lambdas**: the remaining
  higher-order functions (q113 covered transform/filter/aggregate).
  Array outputs are avoided entirely — results are booleans and scalars
  (driver canonicalizer rule).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q233: explicit NULLS FIRST / NULLS LAST -------------------------------
_NULLS_K = 40


def q233_nulls_ordering(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("nullif(o_orderstatus, 'O')").alias("maybe_status"),
    )
    first = (
        o.orderBy(
            F.col("maybe_status").asc_nulls_first(), F.col("o_orderkey").asc()
        )
        .limit(_NULLS_K)
        .select(
            F.lit("nulls_first").alias("mode"), "o_orderkey", "maybe_status"
        )
    )
    last = (
        o.orderBy(
            F.col("maybe_status").asc_nulls_last(), F.col("o_orderkey").asc()
        )
        .limit(_NULLS_K)
        .select(
            F.lit("nulls_last").alias("mode"), "o_orderkey", "maybe_status"
        )
    )
    return first.unionByName(last)


Q233_SQL = f"""
WITH o AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS maybe_status
           FROM orders),
f AS (SELECT 'nulls_first' AS mode, o_orderkey, maybe_status FROM o
      ORDER BY maybe_status ASC NULLS FIRST, o_orderkey LIMIT {_NULLS_K}),
l AS (SELECT 'nulls_last' AS mode, o_orderkey, maybe_status FROM o
      ORDER BY maybe_status ASC NULLS LAST, o_orderkey LIMIT {_NULLS_K})
SELECT * FROM f UNION ALL SELECT * FROM l
"""


# --- q234: exists / forall / reduce ----------------------------------------
_HOF_N = 60


def q234_hof_predicates(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= _HOF_N)
    staged = p.select(
        "p_partkey",
        F.expr("sequence(1, p_size % 6 + 2)").alias("arr"),
    )
    return staged.select(
        "p_partkey",
        F.expr("exists(arr, x -> x % 4 = 0)").alias("has_mult4"),
        F.expr("forall(arr, x -> x < 8)").alias("all_small"),
        F.expr(
            "aggregate(arr, CAST(1 AS BIGINT), (acc, x) -> acc * x)"
        ).alias("product"),
        F.expr(
            "aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        ).alias("sum_sq"),
        F.expr("size(arr)").cast("long").alias("n"),
    )


Q234_SQL = f"""
WITH staged AS (
  SELECT p_partkey, range(1, p_size % 6 + 3) AS arr
  FROM part WHERE p_partkey <= {_HOF_N})
SELECT p_partkey,
       list_bool_or(list_transform(arr, x -> x % 4 = 0)) AS has_mult4,
       list_bool_and(list_transform(arr, x -> x < 8)) AS all_small,
       CAST(list_reduce(list_prepend(CAST(1 AS BIGINT), arr),
                        (acc, x) -> acc * x) AS BIGINT) AS product,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                     list_transform(arr, x -> x * x)),
                        (acc, x) -> acc + x) AS BIGINT) AS sum_sq,
       CAST(len(arr) AS BIGINT) AS n
FROM staged
"""


# --- q246: null-safe equality + GREATEST/LEAST null semantics ---------------
# Spark ``<=>`` vs DuckDB ``IS NOT DISTINCT FROM``: NULL keys join to the
# NULL dimension row instead of vanishing (the lost-rows bug every
# nullable-key join hides).  GREATEST/LEAST null-skipping pinned in the
# same spec (both engines skip NULL operands; all-NULL yields NULL).
_NSJ_N = 120


def q246_null_safe_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= _NSJ_N)
    left = o.select(
        "o_orderkey",
        F.expr("nullif(o_orderstatus, 'O')").alias("k"),
        "o_totalprice",
    )
    dim = spark.createDataFrame(
        [("F", "finished"), ("P", "pending"), (None, "open")],
        "k string, label string",
    )
    joined = left.join(F.broadcast(dim), left["k"].eqNullSafe(dim["k"]))
    return (
        joined.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "g", F.expr("greatest(n, CAST(NULL AS BIGINT), 10)")
        )
        .withColumn("l", F.expr("least(n, CAST(NULL AS BIGINT), 10)"))
        .withColumn(
            "all_null_is_null",
            F.expr(
                "greatest(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)) IS NULL"
            ),
        )
        .orderBy("label")
    )


Q246_SQL = f"""
WITH l AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS k, o_totalprice
  FROM orders WHERE o_orderkey <= {_NSJ_N}),
dim AS (
  SELECT * FROM (VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open'))
           AS v(k, label)),
j AS (SELECT label FROM l JOIN dim ON l.k IS NOT DISTINCT FROM dim.k),
g AS (SELECT label, COUNT(*) AS n FROM j GROUP BY label)
SELECT label, n,
       CAST(greatest(n, CAST(NULL AS BIGINT), 10) AS BIGINT) AS g,
       CAST(least(n, CAST(NULL AS BIGINT), 10) AS BIGINT) AS l,
       greatest(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)) IS NULL
         AS all_null_is_null
FROM g ORDER BY label
"""


SPECS = [
    QuerySpec(
        "q233_nulls_ordering",
        q233_nulls_ordering,
        Q233_SQL,
        "explicit NULLS FIRST/LAST ordering parity (engine defaults differ)",
    ),
    QuerySpec(
        "q234_hof_predicates",
        q234_hof_predicates,
        Q234_SQL,
        "exists/forall/reduce higher-order lambdas, scalar outputs",
    ),
    QuerySpec(
        "q246_null_safe_join",
        q246_null_safe_join,
        Q246_SQL,
        "null-safe equality join (<=> / IS NOT DISTINCT FROM) + "
        "GREATEST/LEAST null skipping",
    ),
]
