"""WKB tier of the spatial operator (F7 fixture parity —
t/spatial_index.test): two polygons with centroids ~(15,15) and ~(89,89),
MBR extraction, and exact point-in-polygon residual."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.spatial import (
    make_wkb_polygon,
    parse_wkb_polygon,
    st_intersects_points,
    wkb_mbr_udf,
)

POLY_A = make_wkb_polygon([(10, 10), (20, 10), (20, 20), (10, 20)])
POLY_B = make_wkb_polygon([(84, 84), (94, 84), (94, 94), (84, 94)])


def test_wkb_roundtrip():
    pts = parse_wkb_polygon(POLY_A)
    assert pts[0] == (10.0, 10.0)
    assert pts[-1] == pts[0]  # ring closed
    assert len(pts) == 5


def test_wkb_mbr(spark):
    df = spark.createDataFrame([(1, POLY_A), (2, POLY_B)], "id int, g binary")
    rows = {
        r["id"]: r
        for r in df.select("id", wkb_mbr_udf()(F.col("g")).alias("m"))
        .select("id", "m.*")
        .collect()
    }
    assert (rows[1]["xmin"], rows[1]["ymax"]) == (10.0, 20.0)
    assert (rows[2]["xmin"], rows[2]["ymax"]) == (84.0, 94.0)


def test_st_intersects_two_tier(spark):
    pts = spark.createDataFrame(
        [(1, 15.0, 15.0), (2, 89.0, 89.0), (3, 50.0, 50.0), (4, 19.9, 10.1)],
        "id int, x double, y double",
    )
    res = st_intersects_points(pts, "x", "y", POLY_A)
    got = {r["id"]: r["st_intersects"] for r in res.collect()}
    # point 2 and 3 fail the bbox prefilter entirely (pruned, not present)
    assert set(got) == {1, 4}
    assert got[1] is True and got[4] is True

    res_b = st_intersects_points(pts, "x", "y", POLY_B)
    got_b = {r["id"]: r["st_intersects"] for r in res_b.collect()}
    assert set(got_b) == {2} and got_b[2] is True


def test_polygons_intersect_cases():
    """Exact simple-polygon ST_Intersects decomposition: edge crossing,
    containment (both directions), shared boundary, disjoint, and the
    cross-shape where edges cross but no vertex is contained."""
    from tiledb_mariadb_spark.operators.spatial import polygons_intersect

    def rect(x1, y1, x2, y2):
        return [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]

    assert polygons_intersect(rect(0, 0, 10, 10), rect(5, 5, 15, 15))
    assert not polygons_intersect(rect(0, 0, 10, 10), rect(11, 11, 15, 15))
    assert polygons_intersect(rect(0, 0, 10, 10), rect(2, 2, 3, 3))
    assert polygons_intersect(rect(2, 2, 3, 3), rect(0, 0, 10, 10))
    assert polygons_intersect(rect(0, 0, 10, 10), rect(10, 0, 20, 10))
    assert polygons_intersect(rect(-1, 4, 11, 6), rect(4, -1, 6, 11))
    tri = [(0, 0), (4, 0), (2, 3)]
    assert polygons_intersect(tri, rect(1, 1, 2, 2))
    assert not polygons_intersect(tri, rect(5, 5, 6, 6))


def test_native_geom_attr_roundtrip(tmp_path):
    """GEOM_WKB (41) reads back as bytes, GEOM_WKT (42) as text — the
    reference maps both to MariaDB GEOMETRY (mytile/mytile.cc:192-193);
    ids follow TILEDB_BOOL in the public tiledb.h enum."""
    from tiledb_mariadb_spark.operators.spatial import make_wkb_polygon
    from tiledb_mariadb_spark.sources.tiledb_native import (
        NativeAttr,
        NativeDim,
        read_native_array,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_write import (
        create_native_array,
        write_native_fragment,
    )

    d = str(tmp_path / "geo")
    create_native_array(
        d,
        [NativeDim("k", 1, 1, (0, 100), 10)],
        [
            NativeAttr("g", 41, 0xFFFFFFFF, False, None),
            NativeAttr("wkt", 42, 0xFFFFFFFF, False, None),
        ],
    )
    wkb = make_wkb_polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    write_native_fragment(
        d,
        {"k": [1, 2], "g": [wkb, b"\x01"], "wkt": ["POINT(1 2)", ""]},
        version=19,
    )
    _, rows = read_native_array(d)
    assert rows == [(1, wkb, "POINT(1 2)"), (2, b"\x01", "")]
    assert isinstance(rows[0][1], bytes)
