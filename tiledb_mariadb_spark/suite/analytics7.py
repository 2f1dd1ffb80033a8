"""Sequence/robust-statistics analytics batch.

* q235 — **event-pattern detection (MATCH_RECOGNIZE-lite)**: count
  view→click→purchase runs per user by folding the ordered event-type
  sequence into a string (one window sort) and counting pattern hits
  with a regexp — the declarative rewrite of row-pattern matching for
  engines without MATCH_RECOGNIZE.  Per-user state is bounded by the
  sequence length; the only shuffle is the user_id sort.
* q236 — **run-length collapse**: consecutive duplicate event types per
  user collapsed into runs (id, type, run_len) — the RLE /
  consecutive-dedup primitive (sensor streams, clickstream cleaning).
  lag-compare → conditional run-start flag → running sum as run id:
  one window sort, all codegen.
* q237 — **moving median**: exact median over a trailing 5-row frame
  (odd width ⇒ no interpolation ⇒ engine-identical).  Spark has no
  median-over-window; the rewrite collects the frame into an array and
  takes the sorted middle element — frame-bounded memory, no extra
  shuffle over the q51-style running-agg shape.
* q238 — **Benford first-digit audit**: distribution of leading
  significant digits of order totals — the classic fabricated-data
  screen.  Digit extraction is pure string/integer ops (no log10);
  shares are one exact division per digit row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q235: sequential pattern counting -------------------------------------


def q235_event_pattern(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("sec"),
    )
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sec", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ",",
        ).alias("seq")
    )
    return seq.select(
        "user_id",
        F.expr(
            "CAST(size(regexp_extract_all(seq,"
            " 'view,click,purchase', 0)) AS BIGINT)"
        ).alias("n_funnels"),
        F.expr(
            "CAST(size(regexp_extract_all(seq, 'error,error', 0)) AS BIGINT)"
        ).alias("n_double_errors"),
        F.length("seq").cast("long").alias("seq_chars"),
    ).orderBy("user_id")


Q235_SQL = """
WITH seq AS (
  SELECT user_id,
         string_agg(event_type, ','
           ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, 'view,click,purchase', 0)) AS BIGINT)
         AS n_funnels,
       CAST(len(regexp_extract_all(seq, 'error,error', 0)) AS BIGINT)
         AS n_double_errors,
       CAST(length(seq) AS BIGINT) AS seq_chars
FROM seq ORDER BY user_id
"""


# --- q236: run-length collapse ----------------------------------------------


def q236_collapse_runs(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    runs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "run_start",
            (
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type"))
            ).cast("long"),
        )
        .withColumn("run_id", F.sum("run_start").over(w))
    )
    return (
        runs.groupBy("user_id", "run_id")
        .agg(
            F.first("event_type").alias("event_type"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .filter(F.col("run_len") >= 2)
        .orderBy("user_id", "run_id")
    )


Q236_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
  FROM events),
runs AS (
  SELECT *,
    CASE WHEN LAG(event_type) OVER w IS NULL
           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END
      AS run_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
rid AS (
  SELECT *, CAST(SUM(run_start) OVER (PARTITION BY user_id
              ORDER BY sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS run_id
  FROM runs)
SELECT user_id, run_id, MIN(event_type) AS event_type,
       COUNT(*) AS run_len
FROM rid GROUP BY user_id, run_id HAVING COUNT(*) >= 2
ORDER BY user_id, run_id
"""


# --- q237: moving median (trailing 5, exact) --------------------------------
_MM_USERS = 40


def q237_moving_median(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < _MM_USERS)
        .select(
            "user_id",
            "event_id",
            F.expr("unix_timestamp(ts)").alias("sec"),
            F.expr("CAST(ROUND(value * 10000.0) AS BIGINT)").alias("v"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(-4, 0)
    )
    frame = e.withColumn("fr", F.collect_list("v").over(w))
    return (
        frame.filter(F.size("fr") == 5)
        .select(
            "user_id",
            "event_id",
            F.expr("element_at(array_sort(fr), 3)").alias("med5"),
        )
        .orderBy("user_id", "event_id")
    )


Q237_SQL = f"""
WITH e AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000.0) AS BIGINT) AS v
  FROM events WHERE user_id < {_MM_USERS}),
fr AS (
  SELECT user_id, event_id,
         list(v) OVER (PARTITION BY user_id ORDER BY sec, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fr
  FROM e)
SELECT user_id, event_id,
       CAST(list_sort(fr)[3] AS BIGINT) AS med5
FROM fr WHERE len(fr) = 5 ORDER BY user_id, event_id
"""


# --- q238: Benford first-digit audit ---------------------------------------


def q238_benford(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    n_row = F.broadcast(o.agg(F.count(F.lit(1)).alias("n")))
    return (
        o.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(n_row)
        .select(
            "digit",
            "cnt",
            F.expr("CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)").alias("share"),
        )
        .orderBy("digit")
    )


Q238_SQL = """
WITH d AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
nn AS (SELECT COUNT(*) AS n FROM d)
SELECT digit, COUNT(*) AS cnt,
       CAST(COUNT(*) AS DOUBLE) / CAST(n AS DOUBLE) AS share
FROM d, nn GROUP BY digit, n ORDER BY digit
"""


# --- q239: TIME-as-micros surface ------------------------------------------
# The reference maps MariaDB TIME(6) to int64 (SURVEY §1.3; TIME has no
# Spark type).  This runs the surrogate end-to-end: timestamps →
# micros-of-day, hour buckets, per-bucket min/max TIME rendered back as
# 'HH:MM:SS' — all integer arithmetic, identical on both engines.


def q239_time_micros(spark, sf_dir):
    from tiledb_mariadb_spark.schema import time_to_micros_of_day  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "event_id", time_to_micros_of_day(F.col("ts")).alias("tod_us")
    )
    return (
        e.groupBy(F.expr("tod_us DIV 3600000000").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("tod_us").alias("min_us"),
            F.max("tod_us").alias("max_us"),
        )
        .select(
            "hour_of_day",
            "n",
            "min_us",
            "max_us",
            F.expr(
                "concat(lpad(CAST(min_us DIV 3600000000 AS STRING), 2, '0'),"
                " ':', lpad(CAST(min_us DIV 60000000 % 60 AS STRING), 2, '0'),"
                " ':', lpad(CAST(min_us DIV 1000000 % 60 AS STRING), 2, '0'))"
            ).alias("min_time"),
        )
        .orderBy("hour_of_day")
    )


Q239_SQL = """
WITH e AS (
  SELECT event_id,
         CAST(epoch_us(ts) AS BIGINT) % 86400000000 AS tod_us
  FROM events)
SELECT tod_us // 3600000000 AS hour_of_day,
       COUNT(*) AS n,
       CAST(MIN(tod_us) AS BIGINT) AS min_us,
       CAST(MAX(tod_us) AS BIGINT) AS max_us,
       lpad(CAST(MIN(tod_us) // 3600000000 AS VARCHAR), 2, '0') || ':' ||
       lpad(CAST(MIN(tod_us) // 60000000 % 60 AS VARCHAR), 2, '0') || ':' ||
       lpad(CAST(MIN(tod_us) // 1000000 % 60 AS VARCHAR), 2, '0') AS min_time
FROM e GROUP BY 1 ORDER BY hour_of_day
"""


SPECS = [
    QuerySpec(
        "q239_time_micros",
        q239_time_micros,
        Q239_SQL,
        "TIME-as-micros surrogate: micros-of-day buckets + HH:MM:SS render",
    ),
    QuerySpec(
        "q235_event_pattern",
        q235_event_pattern,
        Q235_SQL,
        "MATCH_RECOGNIZE-lite: regexp pattern counting over ordered "
        "event sequences",
    ),
    QuerySpec(
        "q236_collapse_runs",
        q236_collapse_runs,
        Q236_SQL,
        "run-length collapse of consecutive duplicate events",
    ),
    QuerySpec(
        "q237_moving_median",
        q237_moving_median,
        Q237_SQL,
        "exact trailing-5 moving median (odd frame, no interpolation)",
    ),
    QuerySpec(
        "q238_benford",
        q238_benford,
        Q238_SQL,
        "Benford first-significant-digit distribution audit",
    ),
]
