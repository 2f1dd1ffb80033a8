"""Join strategies (SURVEY.md §2.4, §3.3).

The reference implements no join itself — it feeds MariaDB's BNL / index
nested-loop (eq_ref on dims) / BKA-MRR strategies through handler scans
(t/join.test, t/mrr.test, t/mrr_triple_join.test).  In Spark the semantics
are `df.join` and the *strategy* is Catalyst's choice; we broadcast the
star-schema dimension tables explicitly (always ≪ fact tables at any SF) so
no shuffle materializes on the probe side.  The MRR tuple-IN lookup and
eq_ref point lookup are expressed as pushable predicates (SURVEY §3.3: only
the semantics survive the translation).

Also includes the operators a time-series engine needs that the reference
lacks: as-of join (operators/asof.py — union + range-frame window, pure
JVM) and range join (equi key + range predicate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.asof import asof_join
from tiledb_mariadb_spark.suite import QuerySpec, dsum, dsum_sql, t


# --- q30: inner equi join (BNL/eq_ref analog) with broadcast dim -----------
def q30_join_inner(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


Q30_SQL = """
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 350000
"""


# --- q31: TPC-H Q5-style 6-table star join (mrr_triple_join scaled up) -----
def q31_join_multi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


Q31_SQL = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- q32: LEFT OUTER join + aggregation over the nullable side -------------
def q32_join_left(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


Q32_SQL = f"""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       COALESCE({dsum_sql('o_totalprice')}, 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --- q33: FULL OUTER join (nulls on both sides) ----------------------------
def q33_join_full(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    big = (
        o.filter(F.col("o_totalprice") > 450000)
        .groupBy(F.col("o_custkey"))
        .agg(F.max("o_totalprice").alias("max_price"))
    )
    return rich.join(big, rich.c_custkey == big.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_custkey", "max_price"
    )


Q33_SQL = """
SELECT c_custkey, c_acctbal, o_custkey, max_price
FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) rich
FULL OUTER JOIN (
  SELECT o_custkey, MAX(o_totalprice) AS max_price
  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) big
ON rich.c_custkey = big.o_custkey
"""


# --- q34: semi join (EXISTS) -----------------------------------------------
def q34_join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


Q34_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# --- q35: anti join (NOT EXISTS) -------------------------------------------
def q35_join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 450000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


Q35_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
"""


# --- q36: theta self-join (non-equi condition) -----------------------------
def q36_join_theta(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    o1 = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("ok1"),
        F.col("o_orderdate").cast("date").alias("d1"),
    )
    o2 = o.select(
        F.col("o_custkey").alias("k2"),
        F.col("o_orderkey").alias("ok2"),
        F.col("o_orderdate").cast("date").alias("d2"),
    )
    return (
        o1.join(
            o2,
            (o1.k == o2.k2)
            & (o1.ok1 < o2.ok2)
            & (F.abs(F.datediff(o2.d2, o1.d1)) <= 30),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("close_pairs"))
    )


Q36_SQL = """
SELECT o1.o_custkey AS k, COUNT(*) AS close_pairs
FROM orders o1 JOIN orders o2
  ON o1.o_custkey = o2.o_custkey
 AND o1.o_orderkey < o2.o_orderkey
 AND ABS(DATE_DIFF('day', CAST(o1.o_orderdate AS DATE), CAST(o2.o_orderdate AS DATE))) <= 30
GROUP BY o1.o_custkey
"""


# --- q37: MRR tuple-IN lookup + eq_ref point lookup ------------------------
# Reference: multi_range_read (ha_mytile.cc:4223-4256) folds key tuples into
# ranges; in Spark the same semantics are a pushable OR-of-conjunctions.
_TUPLES = [(1, 3), (1, 6), (2, 3), (5, 1), (7, 2), (11, 3)]


def q37_tuple_in(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    cond = F.lit(False)
    for ok, ln in _TUPLES:
        cond = cond | ((F.col("l_orderkey") == ok) & (F.col("l_linenumber") == ln))
    return l.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


Q37_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE (l_orderkey, l_linenumber) IN ((1,3),(1,6),(2,3),(5,1),(7,2),(11,3))
"""


# --- q38: as-of join (purchases ← latest strictly-earlier click per user) --
def q38_asof_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("click_ts_us", F.unix_micros(F.col("ts")))
        .select("user_id", "ts", F.col("event_id").alias("click_event_id"), "click_ts_us")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["click_event_id", "click_ts_us"],
        strict=True,
        suffix="",
    )
    return joined.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "click_event_id", "click_ts_us",
    )


Q38_SQL = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
"""


# --- q39: range join (clicks within 1h before each purchase) ---------------
def q39_range_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts")),
        )
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).alias("clicks_1h"))
    )


Q39_SQL = """
SELECT p.event_id AS p_id, COUNT(*) AS clicks_1h
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts < p.ts
GROUP BY p.event_id
"""


# --- q40: cross join -------------------------------------------------------
def q40_cross_join(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    o = t(spark, sf_dir, "orders")
    prios = o.select("o_orderpriority").distinct()
    return r.crossJoin(prios).select("r_name", "o_orderpriority")


Q40_SQL = """
SELECT r_name, o_orderpriority
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
"""


# --- q41: TPC-H Q3 shape (shipping priority: 3-way join → agg → top-k) -----
def q41_shipping_priority(spark, sf_dir):
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q41_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


SPECS = [
    QuerySpec("q30_join_inner", q30_join_inner, Q30_SQL, "inner equi + broadcast"),
    QuerySpec(
        "q41_shipping_priority", q41_shipping_priority, Q41_SQL, "TPC-H Q3 shape"
    ),
    QuerySpec("q31_join_multi", q31_join_multi, Q31_SQL, "TPC-H Q5-style star join"),
    QuerySpec("q32_join_left", q32_join_left, Q32_SQL, "left outer + agg"),
    QuerySpec("q33_join_full", q33_join_full, Q33_SQL, "full outer"),
    QuerySpec("q34_join_semi", q34_join_semi, Q34_SQL, "semi (EXISTS)"),
    QuerySpec("q35_join_anti", q35_join_anti, Q35_SQL, "anti (NOT EXISTS)"),
    QuerySpec("q36_join_theta", q36_join_theta, Q36_SQL, "theta self-join"),
    QuerySpec("q37_tuple_in", q37_tuple_in, Q37_SQL, "MRR tuple-IN lookup"),
    QuerySpec("q38_asof_join", q38_asof_join, Q38_SQL, "as-of join"),
    QuerySpec("q39_range_join", q39_range_join, Q39_SQL, "range join"),
    QuerySpec("q40_cross_join", q40_cross_join, Q40_SQL, "cross join"),
]


# --- q276: as-of join direction variants (merge_asof parity) ----------------
# backward (q38's semantics), forward, and nearest in one result: for
# each purchase, the prior click, the next click, and the closer of the
# two (ties → backward).  Same union+range-frame composition — all
# codegen, one shuffle; the oracle recomputes each direction with
# correlated min/max subqueries (oracle-scale only).
def q276_asof_directions(spark, sf_dir):
    from tiledb_mariadb_spark.operators.asof import asof_join  # noqa: PLC0415

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    back = asof_join(
        purchases, clicks, "user_id", "ts", "ts", ["value"],
        suffix="_back", direction="backward",
    )
    fwd = asof_join(
        purchases, clicks, "user_id", "ts", "ts", ["value"],
        suffix="_fwd", direction="forward",
    )
    near = asof_join(
        purchases, clicks, "user_id", "ts", "ts", ["value"],
        suffix="_near", direction="nearest",
    )
    keys = ["event_id", "user_id", "ts"]
    out = back.join(fwd, keys).join(near, keys)
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "value_back", "value_fwd", "value_near",
    )


Q276_SQL = """
WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events WHERE event_type = 'click'),
m AS (SELECT p.event_id, p.user_id, p.ts_us,
       (SELECT MAX(c.ts_us) FROM c
        WHERE c.user_id = p.user_id AND c.ts_us < p.ts_us) AS bt,
       (SELECT MIN(c.ts_us) FROM c
        WHERE c.user_id = p.user_id AND c.ts_us > p.ts_us) AS ft
      FROM p)
SELECT m.event_id, m.user_id, m.ts_us,
       bc.value AS value_back, fc.value AS value_fwd,
       CASE WHEN m.ft IS NULL THEN bc.value
            WHEN m.bt IS NULL THEN fc.value
            WHEN (m.ts_us - m.bt) <= (m.ft - m.ts_us) THEN bc.value
            ELSE fc.value END AS value_near
FROM m
LEFT JOIN c bc ON bc.user_id = m.user_id AND bc.ts_us = m.bt
LEFT JOIN c fc ON fc.user_id = m.user_id AND fc.ts_us = m.ft
"""

SPECS.append(
    QuerySpec(
        "q276_asof_directions", q276_asof_directions, Q276_SQL,
        "as-of join backward/forward/nearest (merge_asof parity), all "
        "union+range-frame codegen",
    )
)
