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


# --- polygon-polygon exact intersect + native-array spatial pushdown --------


def _point_in_ring(px: float, py: float, ring) -> bool:
    """Even-odd point-in-polygon, boundary-inclusive enough for the
    non-degenerate inputs the specs generate."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _segments_cross(a, b, c, d) -> bool:
    """Proper + touching segment intersection (OGC intersects counts a
    shared boundary point)."""

    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and on_seg(a, b, c))
        or (o2 == 0 and on_seg(a, b, d))
        or (o3 == 0 and on_seg(c, d, a))
        or (o4 == 0 and on_seg(c, d, b))
    )


def polygons_intersect(ring_a, ring_b) -> bool:
    """Exact ST_Intersects for two SIMPLE polygons (outer rings):
    true iff any edge pair intersects or one polygon contains a vertex
    of the other — the standard decomposition, O(|a|*|b|) edges, which
    is constant-bounded for the rectangle/triangle geometries the
    reference's spatial tests use."""
    ring_a = ring_a[:-1] if ring_a and ring_a[0] == ring_a[-1] else ring_a
    ring_b = ring_b[:-1] if ring_b and ring_b[0] == ring_b[-1] else ring_b
    if not ring_a or not ring_b:
        return False
    na, nb = len(ring_a), len(ring_b)
    for i in range(na):
        for j in range(nb):
            if _segments_cross(
                ring_a[i], ring_a[(i + 1) % na],
                ring_b[j], ring_b[(j + 1) % nb],
            ):
                return True
    return _point_in_ring(*ring_a[0], ring_b) or _point_in_ring(
        *ring_b[0], ring_a
    )


def wkb_polygons_intersect_udf():
    """Vectorized stored-WKB vs query-WKB exact intersect (the residual
    the reference evaluates after its MBR pushdown,
    mytile/ha_mytile.cc:2312-2507 cond_push_func_spatial)."""
    import pandas as pd  # noqa: PLC0415

    @F.pandas_udf("boolean")
    def _isect(blobs: pd.Series, qblobs: pd.Series) -> pd.Series:
        out = []
        for b, q in zip(blobs, qblobs):
            out.append(
                polygons_intersect(
                    parse_wkb_polygon(bytes(b)), parse_wkb_polygon(bytes(q))
                )
            )
        return pd.Series(out)

    return _isect


def st_intersects_native(
    spark,
    uri: str,
    query_wkb: bytes,
    x: str,
    y: str,
    geom: str,
    pad: float,
    columns=None,
    encryption_key=None,
) -> DataFrame:
    """ST_Intersects over a NATIVE array with the reference's two-tier
    split (cond_push_func_spatial, mytile/ha_mytile.cc:2312-2507): the
    query geometry's MBR — padded by ``pad`` — becomes DIM RANGES pushed
    into the connector, so splits outside the box never become tasks and
    inside each task only the covering chunks decode; the EXACT
    polygon-polygon test then runs on the stored WKB column as the
    residual.

    CORRECTNESS CONTRACT on ``pad`` (required, no default): the dims
    index geometry CENTROIDS (t/spatial_index.test's _X/_Y), so the MBR
    tier only over-selects when ``pad`` >= the maximum half-extent of
    any stored geometry.  A too-small pad UNDER-selects: a polygon whose
    centroid lies outside the padded query MBR but which still
    intersects it is dropped before the exact residual ever runs.
    Callers must supply their corpus's half-extent bound (the reference
    stores true per-geometry MBRs in its R-tree so it has no such
    parameter; this connector's dim ranges are centroid-based)."""
    if pad < 0:
        raise ValueError(f"pad must be >= 0, got {pad}")
    from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
        read_array,
    )

    pts = parse_wkb_polygon(query_wkb)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    cols = None if columns is None else list(set(columns) | {geom})
    pre = read_array(
        spark,
        uri,
        columns=cols,
        dim_ranges={
            x: (min(xs) - pad, max(xs) + pad),
            y: (min(ys) - pad, max(ys) + pad),
        },
        encryption_key=encryption_key,
    )
    isect = wkb_polygons_intersect_udf()
    return pre.withColumn(
        "st_intersects", isect(F.col(geom), F.lit(query_wkb))
    )
