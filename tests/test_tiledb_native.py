"""The pure-Python TileDB 1.6 fragment decoder read against the
REFERENCE REPO'S OWN committed fixture arrays, validated against the mtr
golden outputs (mysql-test/mytile/r/*.result) — the engine answering the
reference's test queries from the reference's bytes, no libtiledb.
"""

from __future__ import annotations

import os

import pytest

FIXTURES = "/root/reference/mysql-test/mytile/test_data/tiledb_arrays/1.6"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


def test_dense_fixture_matches_mtr_golden():
    from tiledb_mariadb_spark.sources.tiledb_native import read_dense_array

    rows = read_dense_array(
        f"{FIXTURES}/quickstart_dense", [(1, 4), (1, 4)], {"a": "int32"}
    )
    # r/pushdown_ranges.result: SELECT * ... ORDER BY rows, cols → a = 1..16
    assert rows == [
        (r, c, (r - 1) * 4 + c) for r in range(1, 5) for c in range(1, 5)
    ]


def test_sparse_fixture_matches_mtr_golden():
    from tiledb_mariadb_spark.sources.tiledb_native import read_sparse_array

    rows = read_sparse_array(
        f"{FIXTURES}/quickstart_sparse", 2, "int32", {"a": "int32"}
    )
    # quickstart_sparse golden: (1,1)→1, (2,3)→3, (2,4)→2
    assert sorted(rows) == [(1, 1, 1), (2, 3, 3), (2, 4, 2)]


def test_pushdown_ranges_golden_query_through_spark(spark):
    """Run the reference's own pushdown_ranges.test query through OUR
    engine over the decoded fixture; the result must equal the committed
    golden file (r/pushdown_ranges.result lines 20-29)."""
    from tiledb_mariadb_spark.sources.tiledb_native import read_dense_array

    rows = read_dense_array(
        f"{FIXTURES}/quickstart_dense", [(1, 4), (1, 4)], {"a": "int32"}
    )
    df = spark.createDataFrame(rows, "rows int, cols int, a int")
    df.createOrReplaceTempView("quickstart_dense")
    got = [
        tuple(r)
        for r in spark.sql(
            "select * from quickstart_dense "
            "where `rows` >= 1 AND `rows` < 4 AND cols >= 1 AND cols < 4 "
            "ORDER BY `rows` asc, cols asc"
        ).collect()
    ]
    golden = [
        (1, 1, 1), (1, 2, 2), (1, 3, 3),
        (2, 1, 5), (2, 2, 6), (2, 3, 7),
        (3, 1, 9), (3, 2, 10), (3, 3, 11),
    ]
    assert got == golden


def test_zstd_minimal_decoder_edges():
    from tiledb_mariadb_spark.sources.tiledb_native import (
        _zstd_decode_minimal,
    )

    # raw block frame (single segment, FCS=3): magic, FHD 0x20, FCS,
    # block header (last=1, raw, size=3), payload
    frame = b"\x28\xb5\x2f\xfd" + bytes([0x20, 3]) + bytes([0x19, 0, 0]) + b"abc"
    assert _zstd_decode_minimal(frame) == b"abc"
    # RLE block: size=4 repeats of one byte
    rle = b"\x28\xb5\x2f\xfd" + bytes([0x20, 4]) + bytes([0x23, 0, 0]) + b"z"
    assert _zstd_decode_minimal(rle) == b"zzzz"
    with pytest.raises(NotImplementedError):
        _zstd_decode_minimal(
            b"\x28\xb5\x2f\xfd" + bytes([0x20, 1]) + bytes([0x05, 0, 0]) + b"x"
        )


def test_hilbert_fixture_2_3_matches_mtr_golden():
    """The 2.3 HILBERT-cell-order fixture (per-dimension coordinate
    files) decodes to the hilbert.test golden rows — cell order changes
    the on-disk sequence, never the cell set."""
    from tiledb_mariadb_spark.sources.tiledb_native import (
        read_sparse_array_v2,
    )

    base = FIXTURES.rsplit("/", 1)[0]
    rows = read_sparse_array_v2(
        f"{base}/2.3/quickstart_sparse_hilbert",
        ["rows", "cols"],
        "int32",
        {"a": "int32"},
    )
    # r/hilbert.result: (1,1)→1, (2,3)→3, (2,4)→2
    assert sorted(rows) == [(1, 1, 1), (2, 3, 3), (2, 4, 2)]
