"""Spatial predicates: MBR bbox pre-filter + exact residual check.

Reference parity: ``cond_push_func_spatial`` (ha_mytile.cc:2312-2507)
rewrites ST_Intersects/ST_Equals/ST_Overlaps into BETWEEN ranges on the
``_X``/``_Y`` dimension columns (coordinate pruning) and leaves the exact
geometry test to the server as a residual filter.  Here the same split is:

- bbox prefilter = plain Column comparisons on the x/y columns → Catalyst
  pushes them into the parquet scan (partition/row-group pruning at scale);
- exact test = either pure-arithmetic Column expressions (point-in-triangle
  sign tests, below) or a vectorized pandas UDF for WKB geometries
  (ray-casting point-in-polygon) — the residual tier.

No GEOS/Sedona in this container, so WKB parsing is implemented directly
(little-endian WKB Polygon, type id 3) in numpy-backed pandas UDFs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def bbox_filter(x: Column, y: Column, xmin, ymin, xmax, ymax) -> Column:
    """MBR prefilter — the pushable tier (BETWEEN ranges on dims)."""
    return x.between(xmin, xmax) & y.between(ymin, ymax)


def point_in_triangle(
    x: Column, y: Column, tri: list[tuple[float, float]]
) -> Column:
    """Exact point-in-triangle via three half-plane sign tests — pure
    JVM arithmetic, deterministic across engines for identical inputs."""
    (x1, y1), (x2, y2), (x3, y3) = tri

    def side(ax, ay, bx, by):
        return (F.lit(bx) - F.lit(ax)) * (y - F.lit(ay)) - (
            F.lit(by) - F.lit(ay)
        ) * (x - F.lit(ax))

    d1, d2, d3 = side(x1, y1, x2, y2), side(x2, y2, x3, y3), side(x3, y3, x1, y1)
    all_nonneg = (d1 >= 0) & (d2 >= 0) & (d3 >= 0)
    all_nonpos = (d1 <= 0) & (d2 <= 0) & (d3 <= 0)
    return all_nonneg | all_nonpos


def point_in_triangle_sql(x: str, y: str, tri: list[tuple[float, float]]) -> str:
    """DuckDB twin of :func:`point_in_triangle` (identical arithmetic)."""
    (x1, y1), (x2, y2), (x3, y3) = tri

    def side(ax, ay, bx, by):
        return f"(({bx} - {ax}) * ({y} - {ay}) - ({by} - {ay}) * ({x} - {ax}))"

    d1 = side(x1, y1, x2, y2)
    d2 = side(x2, y2, x3, y3)
    d3 = side(x3, y3, x1, y1)
    return (
        f"(({d1} >= 0 AND {d2} >= 0 AND {d3} >= 0)"
        f" OR ({d1} <= 0 AND {d2} <= 0 AND {d3} <= 0))"
    )


# --- WKB polygon support (residual tier, vectorized) -----------------------


def parse_wkb_polygon(buf: bytes) -> list[tuple[float, float]]:
    """Parse a little-endian WKB Polygon's outer ring."""
    if buf[0] != 1:
        raise ValueError("only little-endian WKB supported")
    (geom_type,) = struct.unpack_from("<I", buf, 1)
    if geom_type != 3:
        raise ValueError(f"not a WKB Polygon: type {geom_type}")
    (n_rings,) = struct.unpack_from("<I", buf, 5)
    if n_rings < 1:
        return []
    (n_pts,) = struct.unpack_from("<I", buf, 9)
    pts = []
    off = 13
    for _ in range(n_pts):
        px, py = struct.unpack_from("<dd", buf, off)
        pts.append((px, py))
        off += 16
    return pts


def make_wkb_polygon(pts: list[tuple[float, float]]) -> bytes:
    """Build a little-endian WKB Polygon (single outer ring; auto-closed)."""
    ring = list(pts)
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    out = b"\x01" + struct.pack("<II", 3, 1) + struct.pack("<I", len(ring))
    for px, py in ring:
        out += struct.pack("<dd", px, py)
    return out


MBR_SCHEMA = "xmin double, ymin double, xmax double, ymax double"


def wkb_mbr_udf():
    """Vectorized WKB → MBR (the bbox the reference derives for pushdown).
    Factory, not module-level decorator: pandas_udf parses its DDL schema
    eagerly and needs an active SparkSession."""

    @F.pandas_udf(MBR_SCHEMA)
    def _mbr(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            pts = parse_wkb_polygon(bytes(b))
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            rows.append((min(xs), min(ys), max(xs), max(ys)))
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    return _mbr


def point_in_wkb_polygon_udf():
    """Vectorized ray-casting point-in-polygon for the exact residual."""

    @F.pandas_udf("boolean")
    def _pip(xs: pd.Series, ys: pd.Series, blobs: pd.Series) -> pd.Series:
        out = []
        for x, y, b in zip(xs, ys, blobs):
            pts = parse_wkb_polygon(bytes(b))
            inside = False
            n = len(pts)
            for i in range(n - 1):
                x1, y1 = pts[i]
                x2, y2 = pts[i + 1]
                if (y1 > y) != (y2 > y):
                    xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                    if x < xint:
                        inside = not inside
            out.append(inside)
        return pd.Series(out)

    return _pip


def st_intersects_points(
    points: DataFrame,
    x: str,
    y: str,
    polygon_wkb: bytes,
    pad: float = 0.0,
) -> DataFrame:
    """The full rewrite: bbox prefilter (pushed) + exact residual (UDF),
    mirroring the reference's two-tier split."""
    pts = parse_wkb_polygon(polygon_wkb)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    pre = points.filter(
        bbox_filter(
            F.col(x), F.col(y), min(xs) - pad, min(ys) - pad, max(xs) + pad, max(ys) + pad
        )
    )
    pip = point_in_wkb_polygon_udf()
    return pre.withColumn(
        "st_intersects", pip(F.col(x), F.col(y), F.lit(polygon_wkb))
    )
