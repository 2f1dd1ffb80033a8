"""Time-series gap-fill, spatial KNN join, and tile-table version diff.

* q202 — **hourly resample + gap fill** (LOCF and linear interpolation):
  the hypertable/`time_bucket_gapfill` shape every time-series engine
  offers.  Per-user hourly buckets, a generated dense hour grid
  (explode(sequence)), then last-observation-carried-forward and linear
  interpolation as IGNORE-NULLS window functions — all declarative, one
  shuffle on user_id that the bucketing, grid join, and windows all
  reuse.  Interpolation arithmetic is written with identical
  parenthesization on both engines (IEEE ops on identical inputs).
* q203 — **spatial K-nearest-neighbor join** via grid-cell bucketing:
  query points explode their 3x3 cell neighborhood (cell = the k-NN
  radius bound), candidates join on cell equality — an equi-join, not a
  cross join — then exact integer squared distances rank the candidates.
  The DuckDB oracle is the BRUTE-FORCE cross-join KNN, so a hash match
  proves the grid pruning loses no true neighbor on this data.
  Extends the reference's MBR-pushdown spatial tier
  (`mytile/mytile.cc` cond_push_func_spatial, q95-q97) with the join
  shape it cannot express.
* q204 — **version diff (time-travel changelog)**: two writes to a tile
  table, then latest-vs-snapshot full outer join on the dimension ->
  added / changed / unchanged per row, the `open_at` surface
  (`mysql-test/mytile/t/open_at.test`) upgraded to a CDC-style diff.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, dsum, dsum_sql, t

# --- q202: hourly resample + LOCF + linear interpolation -------------------
_RS_USERS = 8


def q202_resample_gapfill(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < _RS_USERS)
        .select(
            "user_id",
            F.expr("unix_timestamp(ts) div 3600").alias("hour"),
            "value",
        )
    )
    hourly = e.groupBy("user_id", "hour").agg(
        dsum(F.col("value")).alias("sum_v"), F.count(F.lit(1)).alias("n")
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select("user_id", F.explode(F.expr("sequence(h0, h1)")).alias("hour"))
    )
    filled = grid.join(hourly, ["user_id", "hour"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    vp = F.last("sum_v", ignorenulls=True).over(w_back)
    hp = F.last(F.when(F.col("sum_v").isNotNull(), F.col("hour")), ignorenulls=True).over(
        w_back
    )
    vn = F.first("sum_v", ignorenulls=True).over(w_fwd)
    hn = F.first(F.when(F.col("sum_v").isNotNull(), F.col("hour")), ignorenulls=True).over(
        w_fwd
    )
    interp = F.when(
        F.col("sum_v").isNotNull(), F.col("sum_v")
    ).otherwise(
        vp
        + (vn - vp)
        * ((F.col("hour") - hp).cast("double") / (hn - hp).cast("double"))
    )
    return filled.select(
        "user_id",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        vp.alias("locf_v"),
        interp.alias("interp_v"),
    ).orderBy("user_id", "hour")


Q202_SQL = f"""
WITH e AS (SELECT user_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour, value
           FROM events WHERE user_id < {_RS_USERS}),
hourly AS (SELECT user_id, hour, {dsum_sql('value')} AS sum_v,
                  COUNT(*) AS n
           FROM e GROUP BY user_id, hour),
grid AS (SELECT user_id, UNNEST(range(MIN(hour), MAX(hour) + 1)) AS hour
         FROM hourly GROUP BY user_id),
filled AS (SELECT grid.user_id, grid.hour, hourly.sum_v, hourly.n
           FROM grid LEFT JOIN hourly
             ON grid.user_id = hourly.user_id AND grid.hour = hourly.hour),
win AS (SELECT user_id, hour, sum_v, n,
               LAST_VALUE(sum_v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
               LAST_VALUE(CASE WHEN sum_v IS NOT NULL THEN hour END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hp,
               FIRST_VALUE(sum_v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY hour
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
               FIRST_VALUE(CASE WHEN sum_v IS NOT NULL THEN hour END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY hour
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hn
        FROM filled)
SELECT user_id, hour, CAST(COALESCE(n, 0) AS BIGINT) AS n, vp AS locf_v,
       CASE WHEN sum_v IS NOT NULL THEN sum_v
            ELSE vp + (vn - vp) * (CAST(hour - hp AS DOUBLE)
                                   / CAST(hn - hp AS DOUBLE)) END AS interp_v
FROM win
ORDER BY user_id, hour
"""


# --- q203: spatial KNN join via grid-cell bucketing ------------------------
_KNN_K = 5
# cell size == KNN radius bound; 3x3 ring covers r <= 40.  Sized for the
# sparsest fixture (sf0.001: ~150 points in 120x120 -> ~52 expected within
# r=40, 5th-NN ~12): the oracle is brute force, so an undersized cell
# fails the hash match rather than silently losing neighbors.
_CELL = 40
_QUERIES = [(1, 150, 150), (2, 450, 300), (3, 800, 900), (4, 1100, 600)]


def q203_spatial_knn(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    # integer-scaled coordinates (x10): (k*37 % 1201), (k*73 % 1201) in
    # [0, 1200] — the q95 synthetic geometry at exact integer scale
    pts = c.select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1201).alias("xi"),
        (F.col("c_custkey") * 73 % 1201).alias("yi"),
    ).withColumns(
        {
            "cx": F.expr(f"xi div {_CELL * 10}"),
            "cy": F.expr(f"yi div {_CELL * 10}"),
        }
    )
    q = spark.createDataFrame(_QUERIES, "qid long, qx long, qy long")
    neigh = q.select(
        "qid",
        "qx",
        "qy",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx ->"
                f" transform(sequence(-1, 1), dy ->"
                f" struct(qx div {_CELL * 10} + dx AS cx,"
                f" qy div {_CELL * 10} + dy AS cy))))"
            )
        ).alias("cell"),
    ).select("qid", "qx", "qy", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    cand = F.broadcast(neigh).join(pts, ["cx", "cy"]).withColumn(
        "d2",
        (F.col("xi") - F.col("qx")) * (F.col("xi") - F.col("qx"))
        + (F.col("yi") - F.col("qy")) * (F.col("yi") - F.col("qy")),
    )
    w = Window.partitionBy("qid").orderBy("d2", "c_custkey")
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _KNN_K)
        .select("qid", "c_custkey", F.col("d2").cast("long").alias("d2"), "rnk")
        .orderBy("qid", "rnk")
    )


_QVALUES = ", ".join(f"({i}, {x}, {y})" for i, x, y in _QUERIES)
Q203_SQL = f"""
WITH pts AS (SELECT c_custkey, c_custkey * 37 % 1201 AS xi,
                    c_custkey * 73 % 1201 AS yi FROM customer),
q(qid, qx, qy) AS (VALUES {_QVALUES}),
scored AS (SELECT qid, c_custkey,
                  (xi - qx) * (xi - qx) + (yi - qy) * (yi - qy) AS d2
           FROM pts, q),
ranked AS (SELECT qid, c_custkey, CAST(d2 AS BIGINT) AS d2,
                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY d2, c_custkey) AS BIGINT) AS rnk
           FROM scored)
SELECT qid, c_custkey, d2, rnk FROM ranked WHERE rnk <= {_KNN_K}
ORDER BY qid, rnk
"""


# --- q204: tile-table version diff (time-travel CDC) -----------------------
def q204_version_diff(spark, sf_dir):
    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable  # noqa: PLC0415
    from tiledb_mariadb_spark.suite.surfaces import _uri  # noqa: PLC0415

    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tt = TileTable.create(
        spark,
        _uri("diff_nation", sf_dir),
        dimensions=[Dim("n_nationkey", "int")],
        attributes=[Attr("n_name", "string")],
        overwrite=True,
    )
    tt.write(n, version_ts=1000)
    v2 = n.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") % 7 == 0, F.concat(F.col("n_name"), F.lit(" v2")))
        .otherwise(F.col("n_name")),
    ).unionByName(
        n.filter(F.col("n_nationkey") < 3).select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"),
            F.concat(F.lit("NEW "), F.col("n_name")).alias("n_name"),
        )
    )
    tt.write(v2, version_ts=2000)

    old = tt.read(at=1500).select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("old_name")
    )
    new = tt.read().select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("new_name")
    )
    joined = old.join(new, "k", "full")
    status = (
        F.when(F.col("old_name").isNull(), F.lit("added"))
        .when(F.col("new_name").isNull(), F.lit("removed"))
        .when(F.col("old_name") != F.col("new_name"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(F.col("k").alias("n_nationkey"), status.alias("status"),
                      "old_name", "new_name")
        .filter(F.col("status") != "unchanged")
        .orderBy("n_nationkey")
    )


Q204_SQL = """
WITH old AS (SELECT n_nationkey AS k, n_name AS old_name FROM nation),
new AS (SELECT n_nationkey AS k,
               CASE WHEN n_nationkey % 7 = 0 THEN n_name || ' v2'
                    ELSE n_name END AS new_name
        FROM nation
        UNION ALL
        SELECT n_nationkey + 100 AS k, 'NEW ' || n_name AS new_name
        FROM nation WHERE n_nationkey < 3)
SELECT k AS n_nationkey,
       CASE WHEN old_name IS NULL THEN 'added'
            WHEN new_name IS NULL THEN 'removed'
            WHEN old_name <> new_name THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_name, new_name
FROM old FULL OUTER JOIN new USING (k)
WHERE (CASE WHEN old_name IS NULL THEN 'added'
            WHEN new_name IS NULL THEN 'removed'
            WHEN old_name <> new_name THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
ORDER BY n_nationkey
"""


SPECS = [
    QuerySpec(
        "q202_resample_gapfill",
        q202_resample_gapfill,
        Q202_SQL,
        "hourly resample + LOCF + linear interpolation gap fill",
    ),
    QuerySpec(
        "q203_spatial_knn",
        q203_spatial_knn,
        Q203_SQL,
        "spatial KNN join via grid cells; oracle is brute-force exact",
    ),
    QuerySpec(
        "q204_version_diff",
        q204_version_diff,
        Q204_SQL,
        "time-travel version diff (CDC changelog) over a tile table",
    ),
]
