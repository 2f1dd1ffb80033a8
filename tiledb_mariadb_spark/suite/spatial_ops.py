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


SPECS = [
    QuerySpec(
        "q95_spatial_intersects",
        q95_spatial_intersects,
        Q95_SQL,
        "MBR prefilter + exact point-in-triangle",
    ),
]
