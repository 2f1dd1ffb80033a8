"""Per-column filter/compression pipelines (mytile.cc:1308-1413
parse_filter_list; mysql-test/mytile/t/filters.test): filters='GZIP=6'
per attribute + coordinate_filters per table map to parquet codecs and
column encodings, are echoed by show_create, and round-trip data intact."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
from tiledb_mariadb_spark.operators.colfilters import (
    parse_filter_list,
    plan_for_schema,
)


def test_parse_filter_list_reference_vocabulary():
    assert parse_filter_list("GZIP=6") == [("GZIP", "6")]
    assert parse_filter_list("GZIP=-1,ZSTD=6") == [("GZIP", "-1"), ("ZSTD", "6")]
    assert parse_filter_list("BIT_WIDTH_REDUCTION=128") == [
        ("BIT_WIDTH_REDUCTION", "128")
    ]
    assert parse_filter_list("RLE") == [("RLE", None)]
    with pytest.raises(ValueError, match="Unknown or unsupported filter"):
        parse_filter_list("LZMA_EXTREME")


def test_unknown_filter_rejected_at_create(spark, tmp_path):
    with pytest.raises(ValueError, match="Unknown or unsupported filter"):
        TileTable.create(
            spark,
            str(tmp_path / "badf"),
            dimensions=[Dim("k", "int")],
            attributes=[Attr("v", "bigint", filters="NOT_A_FILTER")],
        )


def test_per_column_codecs_in_footers(spark, tmp_path):
    """The filters.test t1 shape: different codec per attribute column —
    each column chunk's footer must carry its declared codec, and data
    must round-trip byte-identically."""
    tt = TileTable.create(
        spark,
        str(tmp_path / "filt"),
        dimensions=[Dim("dim1", "bigint", lower=0, upper=100, tile_extent=10)],
        attributes=[
            Attr("attr1", "bigint", filters="GZIP=6"),
            Attr("attr2", "bigint", filters="ZSTD=6"),
            Attr("attr3", "bigint", filters="GZIP=-1,ZSTD=6"),
            Attr("attr7", "bigint", filters="RLE"),
        ],
        coordinate_filters="LZ4=-1",
        offset_filters="BZIP2=3",
        validity_filters="BZIP2=3",
    )
    rows = [(i, i * 100, i * 100 + 1, i * 100 + 2, i * 100 + 3) for i in range(1, 5)]
    tt.write(
        spark.createDataFrame(
            rows, "dim1 bigint, attr1 bigint, attr2 bigint, attr3 bigint, attr7 bigint"
        )
    )

    files = glob.glob(f"{tt.uri}/data/__tile_v=1/*.parquet")
    assert files, "no parquet files written"
    codecs = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                codecs[col.path_in_schema] = col.compression
    assert codecs["attr1"] == "GZIP"
    assert codecs["attr2"] == "ZSTD"
    assert codecs["attr3"] == "GZIP"  # pipeline head wins
    assert codecs["dim1"] == "LZ4"  # coordinate_filters cover dims

    got = {r["dim1"]: (r["attr1"], r["attr2"], r["attr3"], r["attr7"]) for r in tt.read().collect()}
    assert got == {i: (i * 100, i * 100 + 1, i * 100 + 2, i * 100 + 3) for i in range(1, 5)}

    sc = tt.show_create()
    assert "filters='GZIP=6'" in sc
    assert "coordinate_filters='LZ4=-1'" in sc
    assert "offset_filters='BZIP2=3'" in sc
    assert "validity_filters='BZIP2=3'" in sc


def test_uniform_codec_uses_stock_writer(spark, tmp_path):
    """All columns agreeing on one codec keeps the stock Spark writer
    (uniform_codec short-circuit) and stamps it in every footer."""
    tt = TileTable.create(
        spark,
        str(tmp_path / "unif"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "bigint", filters="ZSTD")],
        coordinate_filters="ZSTD",
    )
    plan = plan_for_schema(tt.schema)
    assert plan.uniform_codec == "zstd"
    assert not plan.needs_arrow_writer
    tt.write(spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint"))
    f = glob.glob(f"{tt.uri}/data/__tile_v=1/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"


def test_delta_and_dictionary_encodings(spark, tmp_path):
    """DOUBLE_DELTA → DELTA_BINARY_PACKED; DICTIONARY → RLE_DICTIONARY
    pages (the filters.test double-delta / dictionary cases)."""
    tt = TileTable.create(
        spark,
        str(tmp_path / "enc"),
        dimensions=[Dim("k", "bigint")],
        attributes=[
            Attr("dd", "bigint", filters="DOUBLE_DELTA"),
            Attr("dc", "string", filters="DICTIONARY,ZSTD"),
        ],
    )
    tt.write(
        spark.createDataFrame(
            [(i, 1000 + i, f"label{i % 3}") for i in range(100)],
            "k bigint, dd bigint, dc string",
        )
    )
    f = glob.glob(f"{tt.uri}/data/__tile_v=1/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    enc = {}
    for ci in range(md.num_columns):
        col = md.row_group(0).column(ci)
        enc[col.path_in_schema] = (set(col.encodings), col.compression)
    assert "DELTA_BINARY_PACKED" in enc["dd"][0]
    assert {"RLE_DICTIONARY", "PLAIN_DICTIONARY"} & enc["dc"][0]
    assert enc["dc"][1] == "ZSTD"


def test_float_split_and_checksum_encodings(spark, tmp_path):
    """CHECKSUM_MD5 → parquet page checksums (verified on read), and
    shuffle/scale-float filters stay READABLE by the engine's own
    vectorized scan: mapping them to BYTE_STREAM_SPLIT produced files
    Spark's vectorized reader rejects (round-3 footer-audit finding —
    a latent round-2 bug), so they are accepted+echo only and the
    column stays PLAIN-decodable."""
    tt = TileTable.create(
        spark,
        str(tmp_path / "enc2"),
        dimensions=[Dim("k", "bigint")],
        attributes=[
            Attr("sf", "double", filters="SCALE_FLOAT"),
            Attr("bs", "double", filters="BYTESHUFFLE"),
            Attr("ck", "bigint", filters="CHECKSUM_MD5,ZSTD"),
        ],
    )
    tt.write(
        spark.createDataFrame(
            [(i, i * 1.5, i * 2.5, i * 10) for i in range(100)],
            "k bigint, sf double, bs double, ck bigint",
        )
    )
    f = glob.glob(f"{tt.uri}/data/__tile_v=1/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    enc = {}
    for ci in range(md.num_columns):
        col = md.row_group(0).column(ci)
        enc[col.path_in_schema] = (set(col.encodings), col.compression)
    assert "BYTE_STREAM_SPLIT" not in enc["sf"][0]
    assert "BYTE_STREAM_SPLIT" not in enc["bs"][0]
    assert enc["ck"][1] == "ZSTD"
    # page checksums are present and verify clean
    got = pq.read_table(f, page_checksum_verification=True)
    assert got.num_rows == 100
    # and the values survived the encodings bit-exactly
    rows = {r["k"]: (r["sf"], r["bs"]) for r in tt.read().collect()}
    assert rows[3] == (4.5, 7.5)
