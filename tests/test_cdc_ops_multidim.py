"""Multi-dimensional coverage for the session-3 CDC operators: the row
identity is the FULL dimension tuple, so `diff_arrays` and
`merge_into_array` must classify on composite keys exactly as on
single ones (2-D arrays; the 1-D batteries live in test_diff_arrays /
test_merge_into)."""

from __future__ import annotations

import pytest

from tiledb_mariadb_spark.sources.tiledb_array import (
    diff_arrays,
    merge_into_array,
    read_array,
)
from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)


def _mk2d(tmp_path, name="arr"):
    uri = str(tmp_path / name)
    create_native_array(
        uri,
        dims=[
            NativeDim("x", 1, 1, (0, 1000), None),
            NativeDim("y", 1, 1, (0, 1000), None),
        ],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )
    write_native_fragment(
        uri,
        {"x": [1, 1, 2, 2], "y": [1, 2, 1, 2], "v": [11, 12, 21, 22]},
        ts=1000,
        version=19,
    )
    return uri


def test_diff_2d(spark, tmp_path):
    uri = _mk2d(tmp_path)
    # change (1,2), add (3,3); (1,1)/(2,1)/(2,2) untouched
    write_native_fragment(
        uri,
        {"x": [1, 3], "y": [2, 3], "v": [99, 33]},
        ts=2000,
        version=19,
    )
    rows = diff_arrays(spark, uri, at_old=1000, at_new=2000).collect()
    got = {(r["x"], r["y"]): (r["change"], r["v_old"], r["v_new"])
           for r in rows}
    assert got == {
        (1, 2): ("changed", 12, 99),
        (3, 3): ("added", None, 33),
    }


def test_merge_into_2d(spark, tmp_path):
    uri = _mk2d(tmp_path)
    src = spark.createDataFrame(
        [(1, 2, 100), (5, 5, 55)], "x long, y long, v long"
    )
    c = merge_into_array(
        spark, uri, src, when_matched="update", when_not_matched="skip",
        ts=2000,
    )
    assert c == {"matched": 1, "not_matched": 1, "written": 1}
    st = {(r["x"], r["y"]): r["v"] for r in read_array(spark, uri).collect()}
    assert st == {(1, 1): 11, (1, 2): 100, (2, 1): 21, (2, 2): 22}
    # same-x different-y keys must NOT be treated as matches
    src2 = spark.createDataFrame([(1, 9, 19)], "x long, y long, v long")
    c2 = merge_into_array(
        spark, uri, src2, when_matched="skip", when_not_matched="insert",
        ts=3000,
    )
    assert c2 == {"matched": 0, "not_matched": 1, "written": 1}
    st2 = {(r["x"], r["y"]): r["v"]
           for r in read_array(spark, uri).collect()}
    assert st2[(1, 9)] == 19 and len(st2) == 5


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
