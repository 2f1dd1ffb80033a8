"""Encrypted-array interplay for the session-3 operators: the AES key
must reach the metadata planners (stats thresholds, window boxes,
neighbor bisects) through the backend's key registry, and every
operator must work end-to-end on ciphertext-at-rest arrays."""

from __future__ import annotations

import pytest

from tiledb_mariadb_spark.sources.tiledb_array import (
    NativeDecoderBackend,
    diff_arrays,
    merge_into_array,
    read_array,
    topk_array,
)
from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)

KEY = b"0123456789abcdef0123456789abcdef"


@pytest.fixture()
def enc_arr(tmp_path):
    uri = str(tmp_path / "arr")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**6), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
        encryption_key=KEY,
    )
    write_native_fragment(
        uri,
        {"k": list(range(100)), "v": list(range(100))},
        ts=1000, version=19, encryption_key=KEY,
    )
    return uri


def test_encrypted_topk_threshold_engages(spark, enc_arr):
    b = NativeDecoderBackend(encryption_key=KEY)
    # the bound comes from AES-sealed fmmsn stats — key must register
    assert b.topk_threshold(enc_arr, "v", 10) == 0
    got = [tuple(r) for r in topk_array(
        spark, enc_arr, "v", 3, backend=b
    ).collect()]
    assert got == [(99, 99), (98, 98), (97, 97)]


def test_encrypted_diff_and_merge(spark, enc_arr):
    b = NativeDecoderBackend(encryption_key=KEY)
    write_native_fragment(
        enc_arr, {"k": [5], "v": [999]}, ts=2000, version=19,
        encryption_key=KEY,
    )
    d = [tuple(r) for r in diff_arrays(
        spark, enc_arr, at_old=1000, at_new=2000, backend=b
    ).collect()]
    assert d == [(5, "changed", 5, 999)]
    c = merge_into_array(
        spark, enc_arr,
        spark.createDataFrame([(5, 0), (200, 7)], "k long, v long"),
        when_matched="update", when_not_matched="insert",
        backend=b, ts=3000,
    )
    assert c == {"matched": 1, "not_matched": 1, "written": 2}
    st = {r["k"]: r["v"]
          for r in read_array(spark, enc_arr, backend=b).collect()}
    assert st[5] == 0 and st[200] == 7


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
