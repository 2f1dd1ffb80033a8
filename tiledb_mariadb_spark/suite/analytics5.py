"""Time-series finance/telemetry analytics batch: time-weighted averages,
OHLC bar aggregation, and the remaining string scalar-function surface.

* q218 — **time-weighted average**: per-user TWA of the event value,
  weighting each reading by its holding duration (lead(ts) − ts).  The
  metric every telemetry/billing pipeline needs where plain AVG is wrong
  (irregular sampling).  One shuffle on user_id shared by the window and
  the aggregate; exact int64 weight sums, one final IEEE division.
* q219 — **OHLC bars**: open/high/low/close/volume per (event_type,
  hour) — the candlestick rollup.  Open/close are row_number-selected
  with a total (ts, event_id) order so ties are deterministic on both
  engines (min_by/arg_min would be tie-arbitrary); one shuffle, two
  windows + the aggregate on the same key.
* q220 — **string scalar functions, second batch**: repeat / reverse /
  lpad / rpad / ascii / left / right / position / translate /
  split_part — closing out the scalar-string surface the reference's
  MariaDB tier exposes (q18 covered the first batch;
  mysql-test/mytile exercises server-side string functions throughout).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q218: per-user time-weighted average ----------------------------------
_VSCALE = 10000.0


def q218_time_weighted_avg(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_timestamp(ts)").alias("sec"),
        F.expr(f"CAST(ROUND(value * {_VSCALE!r}) AS BIGINT)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    timed = e.withColumn("next_sec", F.lead("sec").over(w)).filter(
        F.col("next_sec").isNotNull()
    )
    return (
        timed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("next_sec") - F.col("sec")).alias("total_dur"),
            F.sum(
                F.col("v") * (F.col("next_sec") - F.col("sec"))
            ).alias("wsum"),
        )
        .filter(F.col("total_dur") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_dur",
            F.expr(
                f"(CAST(wsum AS DOUBLE) / CAST(total_dur AS DOUBLE))"
                f" / {_VSCALE!r}"
            ).alias("twa"),
        )
    )


Q218_SQL = f"""
WITH e AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * {_VSCALE!r}) AS BIGINT) AS v
  FROM events),
timed AS (
  SELECT *, LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
              AS next_sec
  FROM e),
agg AS (
  SELECT user_id,
         COUNT(*) AS n_intervals,
         CAST(SUM(next_sec - sec) AS BIGINT) AS total_dur,
         CAST(SUM(v * (next_sec - sec)) AS BIGINT) AS wsum
  FROM timed WHERE next_sec IS NOT NULL
  GROUP BY user_id)
SELECT user_id, n_intervals, total_dur,
       (CAST(wsum AS DOUBLE) / CAST(total_dur AS DOUBLE)) / {_VSCALE!r} AS twa
FROM agg WHERE total_dur > 0
"""


# --- q219: OHLC candlestick bars -------------------------------------------


def q219_ohlc_bars(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("unix_timestamp(ts) div 3600").alias("hour"),
        F.expr("unix_timestamp(ts)").alias("sec"),
        F.expr(f"CAST(ROUND(value * {_VSCALE!r}) AS BIGINT)").alias("v"),
    )
    asc = Window.partitionBy("event_type", "hour").orderBy("sec", "event_id")
    desc = Window.partitionBy("event_type", "hour").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    ranked = e.withColumn("rn_a", F.row_number().over(asc)).withColumn(
        "rn_d", F.row_number().over(desc)
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("volume"),
    )


Q219_SQL = f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * {_VSCALE!r}) AS BIGINT) AS v
  FROM events),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, hour
                       ORDER BY sec, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY event_type, hour
                       ORDER BY sec DESC, event_id DESC) AS rn_d
  FROM e)
SELECT event_type, hour,
       MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
       MAX(v) AS high, MIN(v) AS low,
       MAX(CASE WHEN rn_d = 1 THEN v END) AS close,
       COUNT(*) AS volume
FROM ranked GROUP BY event_type, hour
"""


# --- q220: string scalar functions, batch 2 --------------------------------
_STR_N = 100


def q220_string_fns2(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= _STR_N)
    return p.select(
        "p_partkey",
        F.expr("repeat(left(p_name, 2), 3)").alias("rep"),
        F.reverse("p_name").alias("rev"),
        F.lpad(F.col("p_partkey").cast("string"), 6, "0").alias("padded"),
        F.rpad(F.col("p_brand"), 12, ".").alias("rpadded"),
        F.ascii("p_name").cast("long").alias("first_code"),
        F.expr("right(p_name, 3)").alias("tail3"),
        F.expr("CAST(position('a' IN p_name) AS BIGINT)").alias("a_pos"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowcaps"),
        F.expr("split_part(p_name, ' ', 2)").alias("second_word"),
    )


Q220_SQL = f"""
SELECT p_partkey,
       repeat(left(p_name, 2), 3) AS rep,
       reverse(p_name) AS rev,
       lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS padded,
       rpad(p_brand, 12, '.') AS rpadded,
       CAST(ascii(p_name) AS BIGINT) AS first_code,
       right(p_name, 3) AS tail3,
       CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
       translate(p_name, 'aeiou', 'AEIOU') AS vowcaps,
       split_part(p_name, ' ', 2) AS second_word
FROM part WHERE p_partkey <= {_STR_N}
"""


# --- q221: triangle counting ------------------------------------------------
# Deterministic link graph over documents (same derivation family as
# q200's PageRank edges), undirected.  The scale shape is the oriented
# two-path join: normalize every edge to (lo, hi), build wedges
# a<b<c by joining on the middle vertex, then semi-join the closing edge —
# each triangle is produced exactly once and the quadratic wedge
# explosion is bounded by orientation (at corpus scale, orient by degree
# instead of id — same plan, tighter bound).  Oracle: the identical
# relational 3-way join in DuckDB.
_TRI_OUT = 4


def q221_triangle_count(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    n_row = F.broadcast(d.agg(F.count(F.lit(1)).alias("n")))
    raw = d.crossJoin(n_row).select(
        F.col("doc_id").alias("u"),
        F.explode(
            F.array(
                *[
                    ((F.col("doc_id") * 7 + j * 13) % F.col("n"))
                    for j in range(1, _TRI_OUT + 1)
                ]
            )
        ).alias("v"),
    )
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .distinct()
    )
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = edges.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "left_semi")
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


Q221_SQL = f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS u, (doc_id * 7 + j * 13) % n AS v
  FROM documents, nn, UNNEST(range(1, {_TRI_OUT} + 1)) AS t(j)),
edges AS (
  SELECT DISTINCT LEAST(u, v) AS lo, GREATEST(u, v) AS hi
  FROM raw WHERE u <> v),
wedges AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM edges e1 JOIN edges e2 ON e1.hi = e2.lo)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM wedges w
WHERE EXISTS (SELECT 1 FROM edges e WHERE e.lo = w.a AND e.hi = w.c)
"""


# --- q222: marketing attribution (first/last touch) ------------------------
# Every purchase is attributed to the click that preceded it: last-touch
# (most recent prior click) and first-touch (earliest click of the user).
# One user_id shuffle; both attributions ride the same window sort —
# the conditional-running-max/min trick (no self-join against the click
# history, which at event scale would shuffle the log twice).


def q222_attribution(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("sec"),
        F.expr(f"CAST(ROUND(value * {_VSCALE!r}) AS BIGINT)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    tagged = e.withColumn(
        "last_click", F.last(click_id, ignorenulls=True).over(w)
    ).withColumn(
        "first_click", F.first(click_id, ignorenulls=True).over(w)
    )
    return (
        tagged.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_attributed"),
            F.sum("v").alias("revenue_scaled"),
            F.count_distinct("last_click").cast("long").alias("n_last_touch"),
            F.count_distinct("first_click").cast("long").alias("n_first_touch"),
        )
        .orderBy("user_id")
    )


Q222_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * {_VSCALE!r}) AS BIGINT) AS v
  FROM events),
tagged AS (
  SELECT *,
    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY sec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click,
    FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY sec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click
  FROM e)
SELECT user_id,
       COUNT(*) AS n_attributed,
       CAST(SUM(v) AS BIGINT) AS revenue_scaled,
       CAST(COUNT(DISTINCT last_click) AS BIGINT) AS n_last_touch,
       CAST(COUNT(DISTINCT first_click) AS BIGINT) AS n_first_touch
FROM tagged
WHERE event_type = 'purchase' AND last_click IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


SPECS = [
    QuerySpec(
        "q218_time_weighted_avg",
        q218_time_weighted_avg,
        Q218_SQL,
        "per-user duration-weighted value average (irregular sampling)",
    ),
    QuerySpec(
        "q219_ohlc_bars",
        q219_ohlc_bars,
        Q219_SQL,
        "OHLC candlestick bars per (event_type, hour), tie-deterministic",
    ),
    QuerySpec(
        "q220_string_fns2",
        q220_string_fns2,
        Q220_SQL,
        "string scalar functions batch 2",
    ),
    QuerySpec(
        "q221_triangle_count",
        q221_triangle_count,
        Q221_SQL,
        "triangle counting via oriented wedge join + closing semi-join",
    ),
    QuerySpec(
        "q222_attribution",
        q222_attribution,
        Q222_SQL,
        "first/last-touch purchase attribution in one window pass",
    ),
]
