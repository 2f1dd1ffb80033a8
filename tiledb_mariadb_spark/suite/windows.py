"""Window functions + sessionization (SURVEY.md §2.5 — server-tier [M] in
the reference; MariaDB provides them above the handler).

Determinism notes: every window ORDER BY is made *total* with a unique-key
tiebreak; running float sums use the scaled-BIGINT convention because
engines accumulate window sums in different orders (segment tree vs
linear).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.sessionize import sessionize
from tiledb_mariadb_spark.suite import QuerySpec, t


# --- q50: ranking functions ------------------------------------------------
def q50_window_rank(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


Q50_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


# --- q51: running sum (rows frame, scaled-BIGINT accumulation) -------------
def q51_window_running(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


Q51_SQL = """
SELECT o_custkey, o_orderkey,
       (CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) OVER w AS BIGINT) / 100.0) AS running_total,
       COUNT(*) OVER w AS running_n
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --- q52: lag / lead -------------------------------------------------------
def q52_lag_lead(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev_d = F.lag(F.col("o_orderdate").cast("date")).over(w)
    next_d = F.lead(F.col("o_orderdate").cast("date")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        prev_d.alias("prev_date"),
        next_d.alias("next_date"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_d)
        .cast("long")
        .alias("days_since_prev"),
    )


Q52_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_date,
       LEAD(CAST(o_orderdate AS DATE)) OVER w AS next_date,
       CAST(DATE_DIFF('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# --- q53: RANGE frame (value-based window over price cents) ----------------
def q53_window_range_frame(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    o2 = o.withColumn("price_cents", cents)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("price_cents").asc())
        .rangeBetween(-10_000_000, 0)  # orders within $100k below current
    )
    return o2.select(
        "o_custkey",
        "o_orderkey",
        "price_cents",
        F.count(F.lit(1)).over(w).alias("n_within_100k_below"),
    )


Q53_SQL = """
SELECT o_custkey, o_orderkey, price_cents,
       COUNT(*) OVER w AS n_within_100k_below
FROM (SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM orders WHERE o_custkey < 50)
WINDOW w AS (PARTITION BY o_custkey ORDER BY price_cents ASC
             RANGE BETWEEN 10000000 PRECEDING AND CURRENT ROW)
"""


# --- q54: top-k per group --------------------------------------------------
def q54_topk_per_group(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
    )


Q54_SQL = """
SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, c_custkey, c_acctbal
FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer)
WHERE rn <= 3
"""


# --- q55: distribution functions -------------------------------------------
def q55_distribution(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


Q55_SQL = """
SELECT s_nationkey, s_suppkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
"""


# --- q56: first/last value over full-partition frame -----------------------
def q56_first_last(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


Q56_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- q57: sessionization (gap > 30 min) ------------------------------------
def q57_sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    sess = sessionize(e, key="user_id", ts="ts", gap_seconds=1800)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000.0).alias(
            "duration_s"
        ),
    )


Q57_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                     OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)))
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_id
  FROM flagged)
SELECT user_id, session_id, COUNT(*) AS n_events,
       ((MAX(epoch_us(CAST(ts AS TIMESTAMP))) - MIN(epoch_us(CAST(ts AS TIMESTAMP)))) / 1000000.0) AS duration_s
FROM sessions
GROUP BY user_id, session_id
"""


# --- q58: IGNORE NULLS navigation (lag/lead/first_value over gaps) ---------
# Nulls synthesized deterministically (every 3rd line's price) so the
# ignore-nulls skip actually has gaps to jump.
def q58_ignore_nulls(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    v = F.when(F.col("l_linenumber") % 3 == 0, None).otherwise(
        F.col("l_extendedprice")
    )
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        v.alias("px"),
        F.lag(v).over(w).alias("prev_px"),
        F.last(v, ignorenulls=True).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("last_seen_px"),
        F.first(v, ignorenulls=True).over(w).alias("first_px"),
    )


Q58_SQL = """
WITH l AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_extendedprice END AS px
  FROM lineitem WHERE l_orderkey < 500)
SELECT l_orderkey, l_linenumber, px,
       LAG(px) OVER w AS prev_px,
       LAST_VALUE(px IGNORE NULLS) OVER
         (PARTITION BY l_orderkey ORDER BY l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen_px,
       FIRST_VALUE(px IGNORE NULLS) OVER w AS first_px
FROM l
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
"""


# --- q77: grouped recurrence (EWMA) via applyInPandas ----------------------
# No built-in window frame carries state — the applyInPandas tier runs an
# explicit per-step recurrence (operators/ewma.py).  HASH-VERIFIED against
# a DuckDB recursive CTE: with dyadic α = 0.5 each step is
# s = 0.5*x + 0.5*s_prev — both multiplies are exact IEEE ops and the one
# add rounds identically on both engines, so the whole trajectory is
# bit-identical by construction.  (user_id, ts) is unique in the corpus,
# so the within-group order is total on both sides.
def q77_ewma(spark, sf_dir):
    from pyspark.sql import functions as F  # noqa: PLC0415

    from tiledb_mariadb_spark.operators.ewma import ewma  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    return ewma(e, "user_id", "ts_us", "value", alpha=0.5)


Q77_SQL = """
WITH RECURSIVE base AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events),
r AS (
  SELECT user_id, ts_us, value, rn, value AS ewma FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.ts_us, b.value, b.rn,
         CAST(0.5 AS DOUBLE) * b.value + CAST(0.5 AS DOUBLE) * r.ewma
  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
SELECT user_id, ts_us, value, ewma FROM r
"""


SPECS = [
    QuerySpec("q50_window_rank", q50_window_rank, Q50_SQL, "rank functions"),
    QuerySpec(
        "q77_ewma", q77_ewma, Q77_SQL,
        "grouped EWMA recurrence (applyInPandas, dyadic-α hash oracle)",
    ),
    QuerySpec("q51_window_running", q51_window_running, Q51_SQL, "running sum"),
    QuerySpec("q52_lag_lead", q52_lag_lead, Q52_SQL, "lag/lead"),
    QuerySpec("q53_window_range_frame", q53_window_range_frame, Q53_SQL, "RANGE frame"),
    QuerySpec("q54_topk_per_group", q54_topk_per_group, Q54_SQL, "top-k per group"),
    QuerySpec("q55_distribution", q55_distribution, Q55_SQL, "ntile/percent_rank"),
    QuerySpec("q56_first_last", q56_first_last, Q56_SQL, "first/last value"),
    QuerySpec("q57_sessionize", q57_sessionize, Q57_SQL, "gap sessionization"),
    QuerySpec("q58_ignore_nulls", q58_ignore_nulls, Q58_SQL, "IGNORE NULLS navigation"),
]
