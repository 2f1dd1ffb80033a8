"""Interval analytics + data-quality batch.

* q223 — **interval-overlap join**: all overlapping (error, signup)
  interval pairs.  The naive formulation is a theta join (quadratic at
  corpus scale); the plan here is the *binned* overlap join: each
  interval explodes into the fixed-width time buckets it covers, pairs
  meet by bucket EQUI-join, the exact overlap predicate verifies, and
  each pair is emitted exactly once (only in the bucket containing the
  later of the two starts — no post-dedup shuffle).  The DuckDB oracle
  runs the plain theta join.
* q224 — **exact equi-depth histogram**: 10 buckets with equal row
  counts over a value column — the optimizer-statistics histogram.
  NTILE() would funnel everything through one window partition; instead
  the bucket id derives from the scale-safe two-phase global ordinal
  (``functions/pipeline.stable_ordinal``) — same result, parallel sort.
* q225 — **data-quality expectations**: a declarative check suite
  (null / range / uniqueness / referential / cross-table temporal
  consistency) evaluated in a handful of small aggregates, reported as
  one (check, violations) table — the Great-Expectations-style gate a
  pipeline runs before training data ships.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import pipeline as P
from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q223: binned interval-overlap join ------------------------------------
_IV_LEN = 300        # interval length (seconds)
_IV_BUCKET = 3600    # bucket width


def q223_interval_overlap(spark, sf_dir):
    from tiledb_mariadb_spark.operators.intervals import (  # noqa: PLC0415
        interval_overlap_join,
    )

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("s"),
        (F.expr("unix_timestamp(ts)") + _IV_LEN).alias("e"),
    )
    a = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("b_id"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    return interval_overlap_join(a, b, _IV_BUCKET).withColumnRenamed(
        "overlap", "overlap_sec"
    )


Q223_SQL = f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + {_IV_LEN} AS e
  FROM events)
SELECT a.event_id AS a_id, b.event_id AS b_id,
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_sec
FROM (SELECT * FROM e WHERE event_type = 'error') a
JOIN (SELECT * FROM e WHERE event_type = 'signup') b
  ON a.s <= b.e AND b.s <= a.e
"""


# --- q224: exact equi-depth histogram --------------------------------------
_EQD_BUCKETS = 10


def q224_equi_depth_hist(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        ).alias("price_cents"),
        "l_orderkey",
        "l_linenumber",
    )
    n_row = F.broadcast(li.agg(F.count(F.lit(1)).alias("n")))
    ranked = P.stable_ordinal(
        li, ["price_cents", "l_orderkey", "l_linenumber"]
    )
    return (
        ranked.crossJoin(n_row)
        .withColumn(
            "bucket", F.expr(f"(ordinal - 1) * {_EQD_BUCKETS} DIV n")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("depth"),
            F.min("price_cents").alias("lo"),
            F.max("price_cents").alias("hi"),
        )
        .orderBy("bucket")
    )


Q224_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         l_orderkey, l_linenumber
  FROM lineitem),
ranked AS (
  SELECT price_cents,
         ROW_NUMBER() OVER (ORDER BY price_cents, l_orderkey, l_linenumber)
           AS ordinal,
         COUNT(*) OVER () AS n
  FROM v)
SELECT CAST((ordinal - 1) * {_EQD_BUCKETS} // n AS BIGINT) AS bucket,
       COUNT(*) AS depth,
       MIN(price_cents) AS lo, MAX(price_cents) AS hi
FROM ranked GROUP BY 1 ORDER BY bucket
"""


# --- q225: data-quality expectations ---------------------------------------


def q225_dq_checks(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    single = li.agg(
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias(
            "null_orderkey"
        ),
        F.sum((F.col("l_extendedprice") < 0).cast("long")).alias(
            "negative_price"
        ),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast(
                "long"
            )
        ).alias("discount_range"),
    )
    checks = single.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("null_orderkey").alias("check_name"),
                    F.col("null_orderkey").alias("violations"),
                ),
                F.struct(
                    F.lit("negative_price").alias("check_name"),
                    F.col("negative_price").alias("violations"),
                ),
                F.struct(
                    F.lit("discount_range").alias("check_name"),
                    F.col("discount_range").alias("violations"),
                ),
            )
        ).alias("c")
    ).select("c.check_name", "c.violations")

    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orphan_orders").alias("check_name"), "violations")
    )
    dup_keys = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("dup_line_keys").alias("check_name"), "violations")
    )
    time_consistency = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("ship_before_order").alias("check_name"), "violations")
    )
    return (
        checks.unionByName(orphans)
        .unionByName(dup_keys)
        .unionByName(time_consistency)
        .select("check_name", F.col("violations").cast("long").alias("violations"))
        .orderBy("check_name")
    )


Q225_SQL = """
SELECT 'null_orderkey' AS check_name,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations FROM lineitem
UNION ALL
SELECT 'negative_price',
       CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'discount_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
            AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'orphan_orders', CAST(COUNT(*) AS BIGINT) FROM orders
 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'dup_line_keys', CAST(COUNT(*) AS BIGINT) FROM (
  SELECT l_orderkey, l_linenumber FROM lineitem
  GROUP BY 1, 2 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'ship_before_order', CAST(COUNT(*) AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
 WHERE l_shipdate < o_orderdate
ORDER BY check_name
"""


# --- q226: ratio-to-report (share of group total) --------------------------
# The RATIO_TO_REPORT analog: each nation's revenue share inside its
# region.  Unordered partition-wise SUM window over the (tiny) nation
# aggregate — the shuffle is bounded by the group count, never the fact
# table, because the ratio runs AFTER the partial+final aggregate.


def q226_ratio_to_report(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    from pyspark.sql.window import Window  # noqa: PLC0415

    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("rev_cents")
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        "rev_cents",
        F.expr(
            "CAST(rev_cents AS DOUBLE) /"
            " CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS DOUBLE)"
        ).alias("share"),
    ).orderBy("r_name", "n_name")


Q226_SQL = """
WITH rev AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name, n_name, rev_cents,
       CAST(rev_cents AS DOUBLE) /
         CAST(CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
              AS DOUBLE) AS share
FROM rev ORDER BY r_name, n_name
"""


# --- q227: cumulative distinct users over time -----------------------------
# Running COUNT(DISTINCT) is not window-expressible without quadratic
# state; the scale shape is first-seen reduction: min(day) per user (one
# shuffle on user_id), daily new-user counts, then a cumulative sum over
# the BOUNDED hour axis (the only global window runs over the time spine).


def q227_cumulative_users(spark, sf_dir):
    from pyspark.sql.window import Window  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_timestamp(ts) div 3600").alias("hour")
    )
    first_seen = e.groupBy("user_id").agg(F.min("hour").alias("first_hour"))
    daily = first_seen.groupBy("first_hour").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("first_hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        F.col("first_hour").alias("hour"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("hour")


Q227_SQL = """
WITH fs AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS first_hour
  FROM events GROUP BY user_id),
hourly AS (
  SELECT first_hour, COUNT(*) AS new_users FROM fs GROUP BY first_hour)
SELECT first_hour AS hour, new_users,
       CAST(SUM(new_users) OVER (ORDER BY first_hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM hourly ORDER BY hour
"""


SPECS = [
    QuerySpec(
        "q223_interval_overlap",
        q223_interval_overlap,
        Q223_SQL,
        "binned interval-overlap join (equi-join on time buckets, "
        "single-emission rule)",
    ),
    QuerySpec(
        "q224_equi_depth_hist",
        q224_equi_depth_hist,
        Q224_SQL,
        "exact equi-depth histogram from the two-phase global ordinal",
    ),
    QuerySpec(
        "q225_dq_checks",
        q225_dq_checks,
        Q225_SQL,
        "data-quality expectations: null/range/unique/referential/"
        "temporal checks as one report",
    ),
    QuerySpec(
        "q226_ratio_to_report",
        q226_ratio_to_report,
        Q226_SQL,
        "share-of-group-total (RATIO_TO_REPORT) over the nation rollup",
    ),
    QuerySpec(
        "q227_cumulative_users",
        q227_cumulative_users,
        Q227_SQL,
        "cumulative distinct users via first-seen reduction",
    ),
]
