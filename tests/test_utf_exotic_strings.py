"""STRING_UTF16/UTF32/UCS2/UCS4 attributes (tiledb.h dtypes 13-16).

The reference maps all four to VARCHAR (mytile/mytile.cc:63-68); here
they round-trip through the native writer + decoder with the matching
LE codec (UCS-2/4 are strict subsets of UTF-16/32).  The numpy fast
path refuses these dtypes (not in its support sets), so decoding runs
on the exact row path."""

from __future__ import annotations

import pytest

from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
    read_native_array_range,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)

VAR = 0xFFFFFFFF
WORDS = ["héllo", "wörld", "日本語テキスト", "", "Ωμέγα", "plain"]


@pytest.mark.parametrize("dtype_id", [13, 14, 15, 16])
def test_var_roundtrip(tmp_path, dtype_id):
    uri = str(tmp_path / f"v{dtype_id}")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 100), None)],
        attrs=[NativeAttr("s", dtype_id, VAR, False, None)],
    )
    write_native_fragment(
        uri, {"k": list(range(len(WORDS))), "s": WORDS}, ts=1, version=19
    )
    names, rows = read_native_array_range(uri)
    got = [r[names.index("s")] for r in rows]
    assert got == WORDS
    # range + projection still exact
    names, rows = read_native_array_range(uri, ranges=[(1, 2)])
    assert [r[names.index("s")] for r in rows] == WORDS[1:3]


@pytest.mark.parametrize("dtype_id", [13, 14])
def test_fixed_width_roundtrip(tmp_path, dtype_id):
    """Fixed CHAR(k)-style cells: cvn counts CODE UNITS, cells pad with
    NUL units."""
    uri = str(tmp_path / f"f{dtype_id}")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 100), None)],
        attrs=[NativeAttr("s", dtype_id, 4, False, None)],
    )
    vals = ["abcd", "éé", "語", ""]
    write_native_fragment(
        uri, {"k": [0, 1, 2, 3], "s": vals}, ts=1, version=19
    )
    names, rows = read_native_array_range(uri)
    got = [r[names.index("s")].rstrip("\x00") for r in rows]
    assert got == ["abcd", "éé", "語", ""]


def test_nullable_utf16(tmp_path):
    uri = str(tmp_path / "n16")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 100), None)],
        attrs=[NativeAttr("s", 13, VAR, True, None)],
    )
    vals = ["ä", None, "βγ", None]
    write_native_fragment(
        uri, {"k": [0, 1, 2, 3], "s": vals}, ts=1, version=19
    )
    names, rows = read_native_array_range(uri)
    assert [r[names.index("s")] for r in rows] == vals


def test_spark_schema_maps_to_string(tmp_path):
    from tiledb_mariadb_spark.sources.tiledb_array import (
        NativeDecoderBackend,
    )

    uri = str(tmp_path / "sch")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 100), None)],
        attrs=[
            NativeAttr(f"s{d}", d, VAR, False, None)
            for d in (13, 14, 15, 16)
        ],
    )
    write_native_fragment(
        uri, {"k": [0], "s13": ["a"], "s14": ["b"], "s15": ["c"],
              "s16": ["d"]},
        ts=1, version=19,
    )
    info = NativeDecoderBackend().info(uri)
    assert all(a.dtype == "string" for a in info.attrs)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
