"""Core SQL surface: scan, projection, predicate pushdown matrix,
aggregates, sort/limit, set ops, scalar functions.

Parity targets (SURVEY.md §2.1-2.3, §2.5):
- full scan + column projection  → ha_mytile.cc:1599-1699, 2995-3093
- dim/attr predicate pushdown    → ha_mytile.cc:2583-2882, mytile-range.cc
- scalar aggregate pushdown      → ha_mytile.cc:607-715 (group_by_handler)
- GROUP BY / DISTINCT / rollup   → server-tier [M], t/aggregates.test
- ORDER BY / LIMIT / set ops     → server-tier [M], t/orderby.test

All predicates here are expressed declaratively so Catalyst pushes them into
the parquet scan (PushedFilters) — the Spark-native equivalent of the
reference's subarray-range + QueryCondition split.  Float aggregates use the
scaled-BIGINT convention from suite.__init__ for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.suite import QuerySpec, dsum, dsum_sql, t


# --- q01: flagship — TPC-H Q1-style pricing summary -----------------------
def q01_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) * (
        F.lit(1) + F.col("l_tax")
    )
    n = F.count(F.lit(1))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (dsum(F.col("l_discount"), 6) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
  {dsum_sql('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
  {dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
  {dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
  {dsum_sql('l_discount', 6)} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q02: projection-only scan (column pruning) ----------------------------
def q02_scan_projection(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").filter(F.col("o_orderkey") % 97 == 0)


Q02_SQL = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 0"


# --- q03: dim equality (range [v,v] pushdown analog) -----------------------
def q03_filter_eq(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )


Q03_SQL = "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'"


# --- q04: range predicates (one/two-sided, BETWEEN) ------------------------
def q04_filter_range(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_quantity").between(5, 10) & (F.col("l_extendedprice") > 50000)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


Q04_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 10 AND l_extendedprice > 50000
"""


# --- q05: IN-list pushdown (per-element EQ ranges, OR semantics) -----------
def q05_filter_in(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


Q05_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n, {dsum_sql('o_totalprice')} AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


# --- q06: AND/OR predicate tree (cond_push_cond analog) --------------------
def q06_filter_compound(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 10000))
        | ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


Q06_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice < 10000)
   OR (o_orderstatus = 'F' AND o_totalprice > 400000)
"""


# --- q07: IS NULL / IS NOT NULL (residual-filter tier in the reference) ----
def q07_filter_null(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    nullable = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(nullable).alias("n_not_o"),
        F.sum(F.when(nullable.isNull(), 1).otherwise(0)).cast("long").alias("n_o"),
    )


Q07_SQL = """
SELECT COUNT(*) AS n_total,
       COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_o,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_o
FROM orders
"""


# --- q08: datetime range pushdown (epoch-conversion parity) ----------------
def q08_filter_datetime(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.month("o_orderdate").cast("long").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


Q08_SQL = f"""
SELECT CAST(MONTH(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n,
       {dsum_sql('o_totalprice')} AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY CAST(MONTH(o_orderdate) AS BIGINT)
"""


# --- q09: string predicates (LIKE prefix/contains, utf8 pushdown analog) ---
def q09_filter_string(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%red%") | F.col("p_type").like("SMALL%"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p_name").alias("first_name"))
    )


Q09_SQL = """
SELECT p_brand, COUNT(*) AS n, MIN(p_name) AS first_name
FROM part
WHERE p_name LIKE '%red%' OR p_type LIKE 'SMALL%'
GROUP BY p_brand
"""


# --- q10: scalar aggregates, no GROUP BY (group_by_handler pushdown) -------
def q10_agg_scalar(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return l.agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        n.alias("cnt"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
        F.min("l_returnflag").alias("min_flag"),
        F.max("l_returnflag").alias("max_flag"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


Q10_SQL = f"""
SELECT {dsum_sql('l_quantity')} AS sum_qty,
       COUNT(*) AS cnt,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       {dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
       MIN(l_returnflag) AS min_flag,
       MAX(l_returnflag) AS max_flag,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
"""


# --- q11: GROUP BY + HAVING ------------------------------------------------
def q11_agg_having(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 14000)
    )


Q11_SQL = f"""
SELECT l_suppkey, {dsum_sql('l_quantity')} AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING {dsum_sql('l_quantity')} > 14000
"""


# --- q12: COUNT(DISTINCT) --------------------------------------------------
def q12_count_distinct(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_pairs"),
    )


Q12_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
"""


# --- q13: ROLLUP with GROUPING markers ------------------------------------
def q13_rollup(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


Q13_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       {dsum_sql('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# --- q14: CUBE -------------------------------------------------------------
def q14_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


Q14_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n,
       {dsum_sql('o_totalprice')} AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --- q15: ORDER BY + LIMIT (total order via unique-key tiebreak) -----------
def q15_orderby_limit(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q15_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- q16: set ops (UNION / INTERSECT / EXCEPT, distinct semantics) ---------
def q16_setops(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = o.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    tag = lambda df, v: df.withColumn("op", F.lit(v)).select("op", "k")  # noqa: E731
    return (
        tag(a.intersect(b), "intersect")
        .unionAll(tag(a.exceptAll(b.distinct()).distinct(), "except"))
        .unionAll(tag(a.union(b).distinct(), "union"))
    )


Q16_SQL = """
SELECT 'intersect' AS op, k FROM (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
UNION ALL
SELECT 'except' AS op, k FROM (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
UNION ALL
SELECT 'union' AS op, k FROM (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
"""


# --- q17: CASE + safe casts ------------------------------------------------
# NB: double->bigint casts TRUNCATE in Spark but ROUND in DuckDB; FLOOR
# first so both engines see an exact integer-valued double.
def q17_case_cast(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
    ).filter(F.col("o_orderkey") % 41 == 0)


Q17_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS bucket,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_orderkey AS DOUBLE) AS key_dbl
FROM orders
WHERE o_orderkey % 41 = 0
"""


# --- q18: scalar string functions ------------------------------------------
def q18_scalar_string(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 37 == 0).select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 5).alias("pre"),
        F.length("p_name").cast("long").alias("len"),
        F.concat_ws(":", "p_brand", "p_type").alias("bt"),
        F.regexp_replace(F.col("p_name"), "a", "_").alias("rep"),
        F.trim(F.col("p_name")).alias("trm"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.lpad(F.col("p_brand"), 12, "*").alias("pad"),
        F.split(F.col("p_name"), " ").getItem(0).alias("tok0"),
    )


Q18_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS up,
       LOWER(p_brand) AS lo,
       SUBSTR(p_name, 1, 5) AS pre,
       CAST(LENGTH(p_name) AS BIGINT) AS len,
       p_brand || ':' || p_type AS bt,
       REPLACE(p_name, 'a', '_') AS rep,
       TRIM(p_name) AS trm,
       REVERSE(p_name) AS rev,
       LPAD(p_brand, 12, '*') AS pad,
       STR_SPLIT(p_name, ' ')[1] AS tok0
FROM part
WHERE p_partkey % 37 = 0
"""


# --- q19: scalar date/time functions ---------------------------------------
def q19_scalar_date(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 53 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days_since"),
        F.to_date(F.col("o_orderdate")).alias("as_date"),
    )


Q19_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS y,
       CAST(MONTH(o_orderdate) AS BIGINT) AS m,
       CAST(DAY(o_orderdate) AS BIGINT) AS d,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS plus30,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
       CAST(o_orderdate AS DATE) AS as_date
FROM orders
WHERE o_orderkey % 53 = 0
"""


# --- q20: scalar math (IEEE-exact ops only; see q17 note on casts) ---------
def q20_scalar_math(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 101 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("flr"),
        F.ceil(F.col("l_extendedprice")).cast("long").alias("cl"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.sqrt(F.col("l_quantity")).alias("sq"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty2"),
        F.greatest(F.col("l_discount"), F.col("l_tax")).alias("gr"),
        F.least(F.col("l_discount"), F.col("l_tax")).alias("ls"),
        F.sign(F.col("l_discount") - 0.05).alias("sgn"),
    )


Q20_SQL = """
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS abs_diff,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS flr,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS cl,
       l_orderkey % 7 AS mod7,
       SQRT(l_quantity) AS sq,
       l_quantity * l_quantity AS qty2,
       GREATEST(l_discount, l_tax) AS gr,
       LEAST(l_discount, l_tax) AS ls,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn
FROM lineitem
WHERE l_orderkey % 101 = 0
"""


# --- q21: pivot (conditional-aggregation oracle) ---------------------------
def q21_pivot(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity")))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_o"),
        F.col("F").alias("qty_f"),
    )


Q21_SQL = f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
FROM lineitem
GROUP BY l_returnflag
"""


# --- q22: DISTINCT scan ----------------------------------------------------
def q22_distinct(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


Q22_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


SPECS = [
    QuerySpec("q01_pricing_summary", q01_pricing_summary, Q01_SQL, "flagship TPC-H Q1"),
    QuerySpec("q02_scan_projection", q02_scan_projection, Q02_SQL, "column pruning"),
    QuerySpec("q03_filter_eq", q03_filter_eq, Q03_SQL, "dim equality pushdown"),
    QuerySpec("q04_filter_range", q04_filter_range, Q04_SQL, "range/BETWEEN pushdown"),
    QuerySpec("q05_filter_in", q05_filter_in, Q05_SQL, "IN-list pushdown"),
    QuerySpec("q06_filter_compound", q06_filter_compound, Q06_SQL, "AND/OR tree"),
    QuerySpec("q07_filter_null", q07_filter_null, Q07_SQL, "IS NULL residual"),
    QuerySpec("q08_filter_datetime", q08_filter_datetime, Q08_SQL, "datetime pushdown"),
    QuerySpec("q09_filter_string", q09_filter_string, Q09_SQL, "LIKE / utf8"),
    QuerySpec("q10_agg_scalar", q10_agg_scalar, Q10_SQL, "aggregate pushdown"),
    QuerySpec("q11_agg_having", q11_agg_having, Q11_SQL, "GROUP BY + HAVING"),
    QuerySpec("q12_count_distinct", q12_count_distinct, Q12_SQL, "COUNT DISTINCT"),
    QuerySpec("q13_rollup", q13_rollup, Q13_SQL, "ROLLUP"),
    QuerySpec("q14_cube", q14_cube, Q14_SQL, "CUBE"),
    QuerySpec("q15_orderby_limit", q15_orderby_limit, Q15_SQL, "ORDER BY+LIMIT"),
    QuerySpec("q16_setops", q16_setops, Q16_SQL, "UNION/INTERSECT/EXCEPT"),
    QuerySpec("q17_case_cast", q17_case_cast, Q17_SQL, "CASE + casts"),
    QuerySpec("q18_scalar_string", q18_scalar_string, Q18_SQL, "string functions"),
    QuerySpec("q19_scalar_date", q19_scalar_date, Q19_SQL, "date functions"),
    QuerySpec("q20_scalar_math", q20_scalar_math, Q20_SQL, "math functions"),
    QuerySpec("q21_pivot", q21_pivot, Q21_SQL, "pivot"),
    QuerySpec("q22_distinct", q22_distinct, Q22_SQL, "DISTINCT"),
]
