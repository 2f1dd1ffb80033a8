"""Catalog-layer semantics the suite queries don't reach: write-path
validation, dup policy, drop, and evolution guards (reference parity cites
in catalog.py docstrings)."""

from __future__ import annotations

import pytest

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

TMP = "/root/repo/.tmp/tile_tables/unit"


def _mk(spark, name, **kw):
    return TileTable.create(
        spark,
        f"{TMP}/{name}",
        dimensions=kw.pop("dimensions", [Dim("k", "int")]),
        attributes=kw.pop("attributes", [Attr("v", "string")]),
        overwrite=True,
        **kw,
    )


def test_null_dimension_rejected(spark):
    tt = _mk(spark, "nulldim")
    df = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    with pytest.raises(ValueError, match="null values are not allowed"):
        tt.write(df)


def test_dense_bounds_enforced(spark):
    tt = _mk(
        spark,
        "densebounds",
        dimensions=[Dim("k", "int", lower=1, upper=4, tile_extent=4)],
        array_type="DENSE",
    )
    bad = spark.createDataFrame([(9, "x")], "k int, v string")
    with pytest.raises(ValueError, match="out of domain bounds"):
        tt.write(bad)


def test_dense_requires_bounds(spark):
    with pytest.raises(ValueError, match="requires lower/upper"):
        _mk(spark, "densenobounds", array_type="DENSE")


def test_last_writer_wins_vs_allows_dups(spark):
    tt = _mk(spark, "dups")
    tt.write(spark.createDataFrame([(1, "old")], "k int, v string"), version_ts=1)
    tt.write(spark.createDataFrame([(1, "new")], "k int, v string"), version_ts=2)
    rows = tt.read().collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"

    td = _mk(spark, "dups_ok", allows_dups=True)
    td.write(spark.createDataFrame([(1, "a")], "k int, v string"), version_ts=1)
    td.write(spark.createDataFrame([(1, "b")], "k int, v string"), version_ts=2)
    assert td.read().count() == 2


def test_time_travel_before_first_write_is_empty(spark):
    tt = _mk(spark, "ttempty")
    tt.write(spark.createDataFrame([(1, "a")], "k int, v string"), version_ts=100)
    assert tt.read(at=0).count() == 0
    assert tt.read(at=100).count() == 1


def test_drop_deletes_storage(spark):
    import os

    tt = _mk(spark, "dropme")
    uri = tt.uri
    tt.drop()
    assert not os.path.exists(uri)


def test_cannot_drop_dimension(spark):
    tt = _mk(spark, "dropdim")
    with pytest.raises(ValueError, match="cannot drop a dimension"):
        tt.drop_column("k")


def test_add_existing_column_rejected(spark):
    tt = _mk(spark, "dupcol")
    with pytest.raises(ValueError, match="already exists"):
        tt.add_column("v", "string")


def test_missing_column_on_write(spark):
    tt = _mk(spark, "misscol")
    with pytest.raises(ValueError, match="missing columns"):
        tt.write(spark.createDataFrame([(1,)], "k int"))


def test_heterogeneous_string_and_timestamp_dims(spark, tmp_path):
    """string + timestamp dimensions (t/string_dim.test,
    t/heterogeneus_dimensions.test, t/mrr_datetime_dimensions.test):
    round-trip, last-writer-wins on composite coords, ordered key scans."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "hetero"),
        dimensions=[Dim("sym", "string"), Dim("ts", "timestamp")],
        attributes=[Attr("px", "double")],
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("AAA", t0, 1.0),
        ("AAA", t0 + dt.timedelta(minutes=1), 2.0),
        ("BBB", t0, 3.0),
    ]
    tt.write(spark.createDataFrame(rows, "sym string, ts timestamp, px double"))
    # overwrite one coordinate in a second version
    tt.write(
        spark.createDataFrame([("AAA", t0, 9.0)], "sym string, ts timestamp, px double")
    )
    got = tt.read()
    assert got.count() == 3
    assert (
        got.filter((F.col("sym") == "AAA") & (F.col("ts") == t0)).collect()[0]["px"]
        == 9.0
    )
    # keyed read ordered by the dims (index_read_scan analog)
    ordered = got.filter(F.col("sym") == "AAA").orderBy("ts").collect()
    assert [r["px"] for r in ordered] == [9.0, 2.0]


def test_open_uri_virtual_suffixes(spark, tmp_path):
    """uri@metadata and uri@<ts> addressing (mytile/utils.h:52-53)."""
    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable, open_uri

    uri = str(tmp_path / "vuri")
    tt = TileTable.create(
        spark, uri, dimensions=[Dim("k", "int")], attributes=[Attr("v", "string")]
    )
    tt.set_metadata("owner", "alice")
    tt.write(spark.createDataFrame([(1, "a")], "k int, v string"), version_ts=100)
    tt.write(spark.createDataFrame([(2, "b")], "k int, v string"), version_ts=200)

    md = {r["key"]: r["value"] for r in open_uri(spark, uri + "@metadata").collect()}
    assert md["owner"] == "alice"
    assert open_uri(spark, uri + "@150").count() == 1
    assert open_uri(spark, uri).count() == 2
