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
]
