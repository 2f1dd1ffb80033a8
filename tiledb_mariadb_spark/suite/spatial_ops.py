"""Spatial conformance queries (t/spatial_index.test parity — SURVEY §2.2).

q95 derives a deterministic point cloud from customer keys, applies the
MBR-prefilter + exact point-in-triangle split with identical arithmetic on
both engines.  The WKB tier (parse/MBR/ray-casting) is covered by unit
tests in tests/test_spatial.py since DuckDB here has no spatial extension
to act as an oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.spatial import (
    bbox_filter,
    point_in_triangle,
    point_in_triangle_sql,
)
from tiledb_mariadb_spark.suite import QuerySpec, t

TRI = [(10.0, 10.0), (90.0, 20.0), (50.0, 110.0)]
_XMIN, _YMIN = 10.0, 10.0
_XMAX, _YMAX = 90.0, 110.0


def q95_spatial_intersects(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 1201) / F.lit(10.0)).alias("x"),
        ((F.col("c_custkey") * 73 % 1201) / F.lit(10.0)).alias("y"),
    )
    pre = pts.filter(bbox_filter(F.col("x"), F.col("y"), _XMIN, _YMIN, _XMAX, _YMAX))
    return pre.select(
        "c_custkey",
        "x",
        "y",
        point_in_triangle(F.col("x"), F.col("y"), TRI).alias("in_triangle"),
    )


Q95_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey * 37 % 1201) / 10.0) AS x,
         ((c_custkey * 73 % 1201) / 10.0) AS y
  FROM customer)
SELECT c_custkey, x, y,
       {point_in_triangle_sql('x', 'y', TRI)} AS in_triangle
FROM pts
WHERE x BETWEEN {_XMIN} AND {_XMAX} AND y BETWEEN {_YMIN} AND {_YMAX}
"""


# --- q96: ST_Equals — exact-coordinate match, pushed as equality ranges ----
# (cond_push_func_spatial maps ST_Equals to zero-padding MBR ranges,
# ha_mytile.cc:2411-2421: an equality range per axis — which is exactly
# what an equality filter on the point columns is.)
def q96_st_equals(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1201).alias("xi"),
        (F.col("c_custkey") * 73 % 1201).alias("yi"),
    )
    target = (42 * 37 % 1201, 42 * 73 % 1201)
    return pts.filter(
        (F.col("xi") == target[0]) & (F.col("yi") == target[1])
    ).select("c_custkey", "xi", "yi")


Q96_SQL = f"""
SELECT c_custkey, xi, yi FROM (
  SELECT c_custkey,
         (c_custkey * 37 % 1201) AS xi,
         (c_custkey * 73 % 1201) AS yi
  FROM customer)
WHERE xi = {42 * 37 % 1201} AND yi = {42 * 73 % 1201}
"""


# --- q97: ST_Overlaps — strict interior box overlap, integer-exact ---------
def q97_st_overlaps(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    boxes = s.select(
        "s_suppkey",
        (F.col("s_suppkey") * 13 % 500).alias("x0"),
        (F.col("s_suppkey") * 29 % 500).alias("y0"),
        (F.col("s_suppkey") * 13 % 500 + F.col("s_suppkey") % 7 + 1).alias("x1"),
        (F.col("s_suppkey") * 29 % 500 + F.col("s_suppkey") % 11 + 1).alias("y1"),
    )
    qx0, qy0, qx1, qy1 = 50, 50, 300, 300
    return boxes.filter(
        (F.col("x0") < qx1)
        & (F.col("x1") > qx0)
        & (F.col("y0") < qy1)
        & (F.col("y1") > qy0)
    )


Q97_SQL = """
SELECT * FROM (
  SELECT s_suppkey,
         (s_suppkey * 13 % 500) AS x0,
         (s_suppkey * 29 % 500) AS y0,
         (s_suppkey * 13 % 500 + s_suppkey % 7 + 1) AS x1,
         (s_suppkey * 29 % 500 + s_suppkey % 11 + 1) AS y1
  FROM supplier)
WHERE x0 < 300 AND x1 > 50 AND y0 < 300 AND y1 > 50
"""


# --- q254: ST_Contains + ST_Distance (MariaDB-tier GIS widening) -----------
# The plugin pushes only Intersects/Equals/Overlaps (cond_push_func_spatial,
# ha_mytile.cc:2312-2507); every OTHER ST_* a reference user writes is
# evaluated by the MariaDB layer over scanned rows — the [M]-tier this
# spec covers: polygon containment (strict interior vs boundary) and
# Euclidean distance.  Coordinates derive from exact integers, so the
# distance is sqrt of an exact int64 — bit-stable on both engines.
_CX, _CY = 421, 473  # centroid-ish probe point in the 0..1200 int grid


def q254_st_contains_distance(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    pts = c.select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1201).alias("xi"),
        (F.col("c_custkey") * 73 % 1201).alias("yi"),
    ).select(
        "c_custkey",
        "xi",
        "yi",
        (F.col("xi") / F.lit(10.0)).alias("x"),
        (F.col("yi") / F.lit(10.0)).alias("y"),
    )
    return pts.select(
        "c_custkey",
        point_in_triangle(F.col("x"), F.col("y"), TRI).alias("contains"),
        (
            (F.col("x") >= _XMIN)
            & (F.col("x") <= _XMAX)
            & (F.col("y") >= _YMIN)
            & (F.col("y") <= _YMAX)
        ).alias("within_box"),
        F.expr(
            f"sqrt(CAST((xi - {_CX}) * (xi - {_CX})"
            f" + (yi - {_CY}) * (yi - {_CY}) AS DOUBLE)) / 10.0D"
        ).alias("dist"),
    ).orderBy("c_custkey")


Q254_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 37 % 1201) AS xi, (c_custkey * 73 % 1201) AS yi,
         ((c_custkey * 37 % 1201) / 10.0) AS x,
         ((c_custkey * 73 % 1201) / 10.0) AS y
  FROM customer WHERE c_custkey <= 400)
SELECT c_custkey,
       {point_in_triangle_sql('x', 'y', TRI)} AS contains,
       (x >= {_XMIN} AND x <= {_XMAX} AND y >= {_YMIN} AND y <= {_YMAX})
         AS within_box,
       sqrt(CAST((xi - {_CX}) * (xi - {_CX})
                 + (yi - {_CY}) * (yi - {_CY}) AS DOUBLE)) / CAST(10.0 AS DOUBLE)
         AS dist
FROM pts ORDER BY c_custkey
"""


SPECS = [
    QuerySpec(
        "q95_spatial_intersects",
        q95_spatial_intersects,
        Q95_SQL,
        "MBR prefilter + exact point-in-triangle",
    ),
    QuerySpec("q96_st_equals", q96_st_equals, Q96_SQL, "ST_Equals as equality ranges"),
    QuerySpec("q97_st_overlaps", q97_st_overlaps, Q97_SQL, "ST_Overlaps box predicate"),
    QuerySpec(
        "q254_st_contains_distance",
        q254_st_contains_distance,
        Q254_SQL,
        "ST_Contains / ST_Within / ST_Distance residual-tier GIS surface",
    ),
]
