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

from tiledb_mariadb_spark.suite import QuerySpec, dsum, dsum_sql, ldf, t

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
    q = ldf(spark, _QUERIES, "qid long, qx long, qy long")
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


# --- q205: fuzzy string join (blocked Levenshtein entity resolution) -------
# The fixture's 64 distinct part names are mutually >= 3 edits apart, so
# single-edit corrupted variants are grafted deterministically (char-2
# deletion / 'x' append) and the operator must re-link each variant to
# its source: blocking key (first char + length band) prunes candidates
# to an equi-join, exact levenshtein(<=1) verifies.  Both engines use the
# same unit-cost edit distance.  The all-pairs expansion is confined to a
# block, the standard entity-resolution scale shape (like LSH bands).


def q205_fuzzy_join(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    base = p.groupBy("p_name").agg(F.min("p_partkey").alias("pid"))
    variants = base.select(
        F.when(
            F.col("pid") % 2 == 0,
            F.concat(F.substring("p_name", 1, 1), F.expr("substring(p_name, 3)")),
        )
        .otherwise(F.concat(F.col("p_name"), F.lit("x")))
        .alias("vname"),
        (F.col("pid") + 100000).alias("vid"),
    )
    b = base.select(
        "pid",
        "p_name",
        F.substring("p_name", 1, 1).alias("blk"),
        F.length("p_name").alias("blen"),
    )
    v = variants.select(
        "vid",
        "vname",
        F.substring("vname", 1, 1).alias("blk"),
        F.length("vname").alias("vlen"),
    )
    return (
        b.join(v, "blk")
        .filter(F.abs(F.col("blen") - F.col("vlen")) <= 1)
        .withColumn("lev", F.levenshtein("p_name", "vname").cast("long"))
        .filter(F.col("lev") <= 1)
        .select("pid", "vid", "p_name", "vname", "lev")
        .orderBy("pid", "vid")
    )


Q205_SQL = """
WITH base AS (SELECT p_name, MIN(p_partkey) AS pid FROM part GROUP BY p_name),
variants AS (SELECT CASE WHEN pid % 2 = 0
                         THEN substr(p_name, 1, 1) || substr(p_name, 3)
                         ELSE p_name || 'x' END AS vname,
                    pid + 100000 AS vid
             FROM base),
b AS (SELECT pid, p_name, substr(p_name, 1, 1) AS blk, length(p_name) AS blen
      FROM base),
v AS (SELECT vid, vname, substr(vname, 1, 1) AS blk, length(vname) AS vlen
      FROM variants)
SELECT pid, vid, p_name, vname, CAST(levenshtein(p_name, vname) AS BIGINT) AS lev
FROM b JOIN v ON b.blk = v.blk
WHERE abs(blen - vlen) <= 1 AND levenshtein(p_name, vname) <= 1
ORDER BY pid, vid
"""


# --- q206: z-score anomaly detection ---------------------------------------
# Per-event-type mean/std from exact integer sums (sum and sum-of-squares
# of the 2-decimal-scaled value stay < 2^53, so the final doubles are
# exactly determined), then |z| > threshold flags outliers.  One keyed
# aggregate + one broadcast join back — no second scan shuffle.
_Z_THRESH = 2.2


def q206_zscore_outliers(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)").alias("vs"),
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vs").alias("sx"),
        F.sum(F.col("vs") * F.col("vs")).alias("sxx"),
    )
    mean_s = F.col("sx").cast("double") / F.col("n").cast("double")
    std_s = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) / F.col("n").cast("double")
    z = (F.col("vs").cast("double") - mean_s) / std_s
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > _Z_THRESH)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    )


Q206_SQL = f"""
WITH e AS (SELECT event_id, event_type, value,
                  CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS vs
           FROM events),
stats AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(vs) AS BIGINT) AS sx,
                 CAST(SUM(vs * vs) AS BIGINT) AS sxx
          FROM e GROUP BY event_type)
SELECT event_id, e.event_type, value,
       (CAST(vs AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS z
FROM e JOIN stats ON e.event_type = stats.event_type
WHERE abs((CAST(vs AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE)))
      > {_Z_THRESH}
ORDER BY event_id
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
    QuerySpec(
        "q205_fuzzy_join",
        q205_fuzzy_join,
        Q205_SQL,
        "blocked Levenshtein fuzzy join (entity resolution shape)",
    ),
    QuerySpec(
        "q206_zscore_outliers",
        q206_zscore_outliers,
        Q206_SQL,
        "z-score anomaly detection from exact integer moments",
    ),
]
