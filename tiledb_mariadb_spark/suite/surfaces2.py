"""Tier-P catalog surfaces, batch 2: the §2.1 rows that round 1 verified
only with local tests get hard-signal driver rows here — subarray reads,
table-stats record estimation, fragment consolidation, and Z-order
clustering.

Each spec builds a tile table under ``.tmp/`` from a deterministic slice
of the driver's parquet, exercises the storage surface, and returns a
result the DuckDB oracle reproduces straight from the source views — the
same golden-output strategy as the reference's mtr files
(mysql-test/mytile/t/basic.test range reads, consolidation.test,
show.test table status).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
from tiledb_mariadb_spark.suite import QuerySpec, ldf, t
from tiledb_mariadb_spark.suite.surfaces import _uri


def _orders_two_versions(spark, sf_dir, name: str) -> TileTable:
    """Two overlapping snapshot versions of an orders slice: v1 = keys
    < 2000 as-is, v2 re-writes keys < 1000 with status 'UPDATED' — so
    last-writer-wins reads and pre-dedup cell counts are both known in
    closed form from the source table."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tt = TileTable.create(
        spark,
        _uri(name, sf_dir),
        dimensions=[Dim("o_orderkey", "bigint")],
        attributes=[Attr("o_custkey", "bigint"), Attr("o_orderstatus", "string")],
        array_type="SPARSE",
        overwrite=True,
    )
    tt.write(o.filter(F.col("o_orderkey") < 2000), version_ts=1000)
    tt.write(
        o.filter(F.col("o_orderkey") < 1000).withColumn(
            "o_orderstatus", F.lit("UPDATED")
        ),
        version_ts=2000,
    )
    return tt


# --- q162: subarray read (range-restricted scan surface) --------------------
def q162_subarray_read(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tt = TileTable.create(
        spark,
        _uri("sub_orders", sf_dir),
        dimensions=[Dim("o_orderkey", "bigint")],
        attributes=[Attr("o_custkey", "bigint"), Attr("o_orderstatus", "string")],
        array_type="SPARSE",
        overwrite=True,
    )
    tt.write(o, version_ts=1000)
    return tt.subarray({"o_orderkey": (100, 500)}).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


Q162_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders WHERE o_orderkey BETWEEN 100 AND 500
"""


# --- q163: table stats — records upper bound vs exact -----------------------
# est_records (ha_mytile.cc:1424-1468 computeRecordsUB analog) counts all
# stored cells from footers WITHOUT scanning data pages, so superseded
# coordinates double-count; read() applies last-writer-wins.  Both values
# are known in closed form from the source table.
def q163_table_stats(spark, sf_dir):
    tt = _orders_two_versions(spark, sf_dir, "stats_orders")
    est = tt.est_records()
    exact = tt.read().count()
    return ldf(spark,
        [(est, exact)], schema="est_ub bigint, exact_records bigint"
    )


Q163_SQL = """
SELECT CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey < 2000)
          + (SELECT COUNT(*) FROM orders WHERE o_orderkey < 1000) AS BIGINT)
         AS est_ub,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey < 2000) AS BIGINT)
         AS exact_records
"""


# --- q164: fragment consolidation ------------------------------------------
# consolidate() merges the visible versions into one baseline fragment
# (dropping superseded coordinates); the read-back AND the post-merge
# version/cell counts are all checked in one result.
def q164_consolidation(spark, sf_dir):
    tt = _orders_two_versions(spark, sf_dir, "consol_orders")
    tt.consolidate()
    n_versions = len(tt.schema.versions)
    est_after = tt.est_records()  # merged baseline: UB == exact row count
    return (
        tt.read()
        .select("o_orderkey", "o_orderstatus")
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .withColumn("est_after", F.lit(est_after).cast("bigint"))
    )


Q164_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey < 1000 THEN 'UPDATED' ELSE o_orderstatus END
         AS o_orderstatus,
       CAST(1 AS BIGINT) AS n_versions,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey < 2000) AS BIGINT)
         AS est_after
FROM orders WHERE o_orderkey < 2000
"""


# --- q166: Z-order clustering preserves scan semantics ----------------------
# cluster_by_zorder is a physical-layout operator (Morton-range partition
# + in-partition sort, the cell_order='HILBERT' write path); the
# conformance claim is that a box predicate over the clustered copy
# returns exactly the source rows.  Locality itself (files pruned per
# box) is asserted by tests/test_zorder.py.
def q166_zorder_scan(spark, sf_dir):
    from tiledb_mariadb_spark.operators.zorder import cluster_by_zorder  # noqa: PLC0415

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    path = _uri("zorder_lineitem", sf_dir)
    cluster_by_zorder(li, ["l_orderkey", "l_linenumber"], 8).write.mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path)
    return back.filter(
        (F.col("l_orderkey").between(500, 1500))
        & (F.col("l_linenumber").between(1, 3))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)").alias("qty_cents"),
    )


Q166_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_cents
FROM lineitem
WHERE l_orderkey BETWEEN 500 AND 1500 AND l_linenumber BETWEEN 1 AND 3
"""


SPECS = [
    QuerySpec(
        "q162_subarray_read", q162_subarray_read, Q162_SQL,
        "subarray range-restricted scan over a tile table",
    ),
    QuerySpec(
        "q163_table_stats", q163_table_stats, Q163_SQL,
        "records-UB estimate vs exact count across overlapping versions",
    ),
    QuerySpec(
        "q164_consolidation", q164_consolidation, Q164_SQL,
        "fragment consolidation: merged baseline, version + cell counts",
    ),
    QuerySpec(
        "q166_zorder_scan", q166_zorder_scan, Q166_SQL,
        "Z-order clustered copy answers box scans identically",
    ),
]


# --- q170: incremental rollup maintenance (continuous aggregate) ------------
# Two refresh cycles over an append-only versioned source: the second
# reads ONLY the delta fragments (read_changes), merges with the stored
# hourly rollup, and rewrites just the dirty hour groups — the oracle is
# a full GROUP BY over the whole source, so the hash match proves the
# incremental path converges to the from-scratch aggregate.
def q170_incremental_rollup(spark, sf_dir):
    from tiledb_mariadb_spark.operators.rollup import refresh_rollup  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    src = TileTable.create(
        spark,
        _uri("rollup_src", sf_dir),
        dimensions=[Dim("event_id", "bigint")],
        attributes=[Attr("ts", "timestamp"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        _uri("rollup_agg", sf_dir),
        dimensions=[Dim("h", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    hour_key = {"h": F.expr("CAST(ts AS LONG) div 3600")}
    sums = {"cents": F.col("cents")}
    cut = "2024-01-21 00:00:00"
    src.write(e.filter(F.col("ts") < cut), version_ts=1000)
    refresh_rollup(roll, src, 0, 1000, ["h"], sums, hour_key)
    src.write(e.filter(F.col("ts") >= cut), version_ts=2000)
    refresh_rollup(roll, src, 1000, 2000, ["h"], sums, hour_key)
    return roll.read().select(
        F.timestamp_seconds(F.col("h") * 3600).alias("h"),
        F.col("n").alias("n_events"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
    )


Q170_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events
GROUP BY 1
"""


SPECS.append(
    QuerySpec(
        "q170_incremental_rollup", q170_incremental_rollup, Q170_SQL,
        "incremental rollup maintenance: delta-only refresh == full aggregate",
    )
)


# --- q268: CDC-aware incremental rollup (pre/post-image delta) --------------
# refresh_rollup_cdc lifts q170's append-only restriction: after a MERGE
# batch (overwrites + inserts + deletes via apply_changes), the refresh
# reads only the changed coordinates' pre- and post-images (broadcast
# semi-joins) and applies ΔAgg = Agg(post) − Agg(pre).  The oracle is a
# from-scratch GROUP BY over the post-change state, so the hash match
# proves delete subtraction and overwrite re-counting are exact.
def q268_cdc_rollup(spark, sf_dir):
    from tiledb_mariadb_spark.operators.rollup import refresh_rollup_cdc  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    src = TileTable.create(
        spark,
        _uri("cdcroll_src", sf_dir),
        dimensions=[Dim("event_id", "bigint")],
        attributes=[Attr("ts", "timestamp"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        _uri("cdcroll_agg", sf_dir),
        dimensions=[Dim("h", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    hour_key = {"h": F.expr("CAST(ts AS LONG) div 3600")}
    sums = {"cents": F.col("cents")}
    src.write(e)  # v1 (ts=1)
    refresh_rollup_cdc(roll, src, 0, 1, ["h"], sums, hour_key)
    # one MERGE batch: overwrite cents for id%101==0, delete id%97==0,
    # insert 5 fresh coordinates (contract: one change per coordinate)
    ups = (
        e.filter((F.col("event_id") % 101 == 0) & (F.col("event_id") % 97 != 0))
        .select("event_id", "ts", F.lit(12345).alias("cents"))
        .withColumn("__op", F.lit("upsert"))
    )
    dels = e.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("bigint").alias("cents"),
        F.lit("delete").alias("__op"),
    )
    ins = spark.range(5).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("ts"),
        F.lit(777).alias("cents"),
        F.lit("upsert").alias("__op"),
    )
    src.apply_changes(ups.unionByName(dels).unionByName(ins))  # v2 (ts=2)
    refresh_rollup_cdc(roll, src, 1, 2, ["h"], sums, hour_key)
    return roll.read().select(
        F.timestamp_seconds(F.col("h") * 3600).alias("h"),
        F.col("n").alias("n_events"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
    )


Q268_SQL = """
WITH base AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
final AS (
  SELECT ts,
         CASE WHEN event_id % 101 = 0 THEN 12345 ELSE cents END AS cents
  FROM base WHERE event_id % 97 <> 0
  UNION ALL
  SELECT CAST('2024-01-15 00:00:00' AS TIMESTAMP), 777 FROM range(0, 5))
SELECT date_trunc('hour', ts) AS h,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS sum_value
FROM final GROUP BY 1
"""


SPECS.append(
    QuerySpec(
        "q268_cdc_rollup", q268_cdc_rollup, Q268_SQL,
        "delete/overwrite-aware incremental rollup: pre/post-image delta "
        "maintenance == from-scratch aggregate after a MERGE batch",
    )
)


# --- q275: snapshot diff (table_changes analog) -----------------------------
# catalog.snapshot_diff(a, b): one row per coordinate whose visible value
# differs between two time-travel snapshots, classified insert / delete /
# update with before/after images — the semantic-diff surface CDC
# consumers use when the raw version feed is too granular.  The oracle
# recomputes the expected diff from the base data and the change rule.
def q275_snapshot_diff(spark, sf_dir):
    from tiledb_mariadb_spark.catalog import snapshot_diff  # noqa: PLC0415

    e = t(spark, sf_dir, "events").select(
        "event_id", (F.col("event_id") % 100).alias("bucket")
    )
    tt = TileTable.create(
        spark,
        _uri("snapdiff", sf_dir),
        dimensions=[Dim("event_id", "bigint")],
        attributes=[Attr("bucket", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    tt.write(e.filter(F.col("event_id") < 800))  # v1 (ts=1)
    ups = (
        e.filter((F.col("event_id") < 800) & (F.col("event_id") % 7 == 0))
        .select("event_id", (F.col("bucket") + 1000).alias("bucket"))
        .withColumn("__op", F.lit("upsert"))
    )
    ins = (
        e.filter((F.col("event_id") >= 900) & (F.col("event_id") < 950))
        .select("event_id", "bucket")
        .withColumn("__op", F.lit("upsert"))
    )
    dels = e.filter(
        (F.col("event_id") < 800)
        & (F.col("event_id") % 13 == 0)
        & (F.col("event_id") % 7 != 0)
    ).select(
        "event_id",
        F.lit(None).cast("bigint").alias("bucket"),
        F.lit("delete").alias("__op"),
    )
    tt.apply_changes(ups.unionByName(ins).unionByName(dels))  # v2 (ts=2)
    return snapshot_diff(tt, 1, 2).orderBy("event_id")


Q275_SQL = """
WITH e AS (SELECT event_id, event_id % 100 AS bucket FROM events)
SELECT event_id, 'update' AS _change,
       bucket + 1000 AS bucket, bucket AS bucket_was
FROM e WHERE event_id < 800 AND event_id % 7 = 0
UNION ALL
SELECT event_id, 'delete', CAST(NULL AS BIGINT), bucket
FROM e WHERE event_id < 800 AND event_id % 13 = 0 AND event_id % 7 <> 0
UNION ALL
SELECT event_id, 'insert', bucket, CAST(NULL AS BIGINT)
FROM e WHERE event_id >= 900 AND event_id < 950
ORDER BY event_id
"""

SPECS.append(
    QuerySpec(
        "q275_snapshot_diff", q275_snapshot_diff, Q275_SQL,
        "semantic diff between two time-travel snapshots: insert/delete/"
        "update with before/after images (table_changes analog)",
    )
)


# --- q277: distributed table checksum (CHECKSUM TABLE analog) ---------------
# Order-insensitive md5-sum checksum over a lineitem projection, computed
# twice — once as-stored and once deliberately reshuffled+row-shuffled —
# proving the number is layout-independent (the replica-comparison
# property).  Int/string columns only: their string rendering is
# engine-identical (doubles are not — documented boundary).
def q277_table_checksum(spark, sf_dir):
    from tiledb_mariadb_spark.functions.pipeline import table_checksum  # noqa: PLC0415

    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]
    li = t(spark, sf_dir, "lineitem").select(*cols)
    a = table_checksum(li).select(
        F.lit("stored").alias("layout"), "n_rows", "checksum"
    )
    reshuffled = li.repartition(7, "l_linestatus").sortWithinPartitions(
        "l_returnflag"
    )
    b = table_checksum(reshuffled).select(
        F.lit("reshuffled").alias("layout"), "n_rows", "checksum"
    )
    return a.unionByName(b).orderBy("layout")


def _q277_sql():
    from tiledb_mariadb_spark.functions.pipeline import table_checksum_sql  # noqa: PLC0415

    inner = table_checksum_sql(
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus"
        " FROM lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"],
    )
    return f"""
SELECT layout, n_rows, checksum
FROM ({inner}) , (VALUES ('stored'), ('reshuffled')) AS v(layout)
ORDER BY layout
"""


SPECS.append(
    QuerySpec(
        "q277_table_checksum", q277_table_checksum, _q277_sql(),
        "CHECKSUM TABLE analog: order/layout-insensitive md5-sum, "
        "identical across a deliberate reshuffle",
    )
)
