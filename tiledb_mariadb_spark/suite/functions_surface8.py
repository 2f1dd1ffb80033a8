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

from tiledb_mariadb_spark.suite import QuerySpec, ldf, t

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
    dim = ldf(spark,
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
    QuerySpec(
        "q250_setops_nulls",
        lambda spark, sf_dir: q250_setops_nulls(spark, sf_dir),
        None,
    ),
    QuerySpec(
        "q251_not_in_nulls",
        lambda spark, sf_dir: q251_not_in_nulls(spark, sf_dir),
        None,
    ),
]


# --- q250: set operations over NULL rows ------------------------------------
# INTERSECT/EXCEPT use SET equality (NULL matches NULL) while `=` uses
# 3VL — the classic divergence users trip on.  Both engines implement
# the standard; this pins it with synthesized null keys.


def q250_setops_nulls(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    o.createOrReplaceTempView("q250_orders")
    return spark.sql(
        """
        WITH a AS (SELECT nullif(o_orderstatus, 'O') AS k FROM q250_orders
                   WHERE o_orderkey % 2 = 0),
             b AS (SELECT nullif(o_orderstatus, 'F') AS k FROM q250_orders
                   WHERE o_orderkey % 3 = 0),
        i AS (SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT
                                                SELECT k FROM b) x),
        e AS (SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT
                                             SELECT k FROM b) x)
        SELECT op, coalesce(k, '<null>') AS k,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT * FROM i UNION ALL SELECT * FROM e) u
        GROUP BY op, k ORDER BY op, k
        """
    )


Q250_SQL = """
WITH a AS (SELECT nullif(o_orderstatus, 'O') AS k FROM orders
           WHERE o_orderkey <= 300 AND o_orderkey % 2 = 0),
     b AS (SELECT nullif(o_orderstatus, 'F') AS k FROM orders
           WHERE o_orderkey <= 300 AND o_orderkey % 3 = 0),
i AS (SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT
                                        SELECT k FROM b) x),
e AS (SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT
                                     SELECT k FROM b) x)
SELECT op, coalesce(k, '<null>') AS k, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM i UNION ALL SELECT * FROM e) u
GROUP BY op, k ORDER BY op, k
"""


# --- q251: NOT IN with NULLs (three-valued logic) ---------------------------
# A NULL anywhere in the NOT IN list makes every comparison UNKNOWN —
# rows silently vanish.  Pinned alongside the NOT EXISTS rewrite that
# users actually want (and that anti-join executes).


def q251_not_in_nulls(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    o.createOrReplaceTempView("q251_orders")
    return spark.sql(
        """
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM q251_orders
            WHERE o_orderstatus NOT IN
              (SELECT nullif(o_orderstatus, 'P') FROM q251_orders))
            AS not_in_with_nulls,
          (SELECT CAST(count(*) AS BIGINT) FROM q251_orders x
            WHERE NOT EXISTS (
              SELECT 1 FROM q251_orders y
               WHERE nullif(y.o_orderstatus, 'P') = x.o_orderstatus))
            AS not_exists_rewrite
        """
    )


Q251_SQL = """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM orders
    WHERE o_orderkey <= 400 AND o_orderstatus NOT IN
      (SELECT nullif(o_orderstatus, 'P') FROM orders WHERE o_orderkey <= 400))
    AS not_in_with_nulls,
  (SELECT CAST(count(*) AS BIGINT) FROM orders x
    WHERE o_orderkey <= 400 AND NOT EXISTS (
      SELECT 1 FROM orders y
       WHERE y.o_orderkey <= 400
         AND nullif(y.o_orderstatus, 'P') = x.o_orderstatus))
    AS not_exists_rewrite
"""

SPECS[-2] = QuerySpec(
    "q250_setops_nulls",
    q250_setops_nulls,
    Q250_SQL,
    "INTERSECT/EXCEPT set-equality over NULL rows",
)
SPECS[-1] = QuerySpec(
    "q251_not_in_nulls",
    q251_not_in_nulls,
    Q251_SQL,
    "NOT IN three-valued-logic null trap vs NOT EXISTS rewrite",
)


# --- q255: PERCENTILE_CONT (interpolated), engine-independent ---------------
# q121 pins PERCENTILE_DISC (row selection); the interpolated form is
# the one the engines' built-ins compute with engine-specific float
# paths — unusable for cross-hashing.  Deterministic rewrite: rank the
# group, select the two straddling rows, interpolate with ONE fixed
# IEEE chain on exact int64 cents.  p25/p50/p75 per returnflag.


def q255_percentile_cont(spark, sf_dir):
    from pyspark.sql.window import Window  # noqa: PLC0415

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    ranked = li.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag"))
    )
    pieces = []
    for name, num, den in (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)):
        # 0-based target index h = (n-1)*p; straddling rows are
        # rk = floor(h)+1 and floor(h)+2 (clamped); fraction = h - floor(h)
        lo_rk = f"((n - 1) * {num} DIV {den}) + 1"
        frac = (
            f"(CAST((n - 1) * {num} AS DOUBLE) / CAST({den} AS DOUBLE)"
            f" - CAST((n - 1) * {num} DIV {den} AS DOUBLE))"
        )
        pieces.append(
            (
                name,
                F.expr(
                    f"max(CASE WHEN rk = {lo_rk} THEN cents END)"
                ).alias(f"{name}_lo"),
                F.expr(
                    f"max(CASE WHEN rk = least({lo_rk} + 1, n) THEN cents END)"
                ).alias(f"{name}_hi"),
                frac,
            )
        )
    agg = ranked.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        *[c for _, lo, hi, _ in pieces for c in (lo, hi)],
    )
    sel = [F.col("l_returnflag")]
    for name, _lo, _hi, frac in pieces:
        sel.append(
            F.expr(
                f"CAST({name}_lo AS DOUBLE)"
                f" + ({frac}) * (CAST({name}_hi AS DOUBLE)"
                f" - CAST({name}_lo AS DOUBLE))"
            ).alias(name)
        )
    return agg.select(*sel).orderBy("l_returnflag")


def _q255_sql() -> str:
    cols = []
    for name, num, den in (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)):
        lo_rk = f"((n - 1) * {num} // {den}) + 1"
        frac = (
            f"(CAST((MAX(n) - 1) * {num} AS DOUBLE) / CAST({den} AS DOUBLE)"
            f" - CAST((MAX(n) - 1) * {num} // {den} AS DOUBLE))"
        )
        cols.append(
            f"CAST(MAX(CASE WHEN rk = {lo_rk} THEN cents END) AS DOUBLE)"
            f" + ({frac}) * (CAST(MAX(CASE WHEN rk = LEAST({lo_rk} + 1, n)"
            f" THEN cents END) AS DOUBLE)"
            f" - CAST(MAX(CASE WHEN rk = {lo_rk} THEN cents END) AS DOUBLE))"
            f" AS {name}"
        )
    return f"""
WITH v AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem),
ranked AS (
  SELECT l_returnflag, cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cents, l_orderkey, l_linenumber) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v)
SELECT l_returnflag, {', '.join(cols)}
FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag
"""


SPECS.append(
    QuerySpec(
        "q255_percentile_cont",
        q255_percentile_cont,
        _q255_sql(),
        "PERCENTILE_CONT via rank selection + fixed interpolation chain",
    )
)


# --- q259: deterministic MODE (most-frequent value, smallest-value tie) -----
# Both engines' native mode() is tie-arbitrary — unusable cross-engine
# and irreproducible on task retry.  The deterministic rewrite (count →
# rank by (freq DESC, value ASC) → rank 1) is the arg-max-row idiom that
# also covers "most frequent category per group" reporting.


def q259_deterministic_mode(spark, sf_dir):
    from pyspark.sql.window import Window  # noqa: PLC0415

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.floor("l_quantity").cast("long").alias("q")
    )
    counts = li.groupBy("l_returnflag", "q").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("freq").desc(), F.col("q").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("q").alias("mode_qty"), "freq")
        .orderBy("l_returnflag")
    )


Q259_SQL = """
WITH counts AS (
  SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS q,
         COUNT(*) AS freq
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                               ORDER BY freq DESC, q ASC) AS rk
  FROM counts)
SELECT l_returnflag, q AS mode_qty, CAST(freq AS BIGINT) AS freq
FROM ranked WHERE rk = 1 ORDER BY l_returnflag
"""

SPECS.append(
    QuerySpec(
        "q259_deterministic_mode",
        q259_deterministic_mode,
        Q259_SQL,
        "deterministic MODE (freq-desc, value-asc tiebreak)",
    )
)
