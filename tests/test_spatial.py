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
