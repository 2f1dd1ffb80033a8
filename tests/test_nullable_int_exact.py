"""Nullable-integral exactness through the row-path read (ADVICE r8).

pandas infers float64 for an int column containing None, silently
corrupting int64 values >= 2^53 (2^53+1 -> 2^53.0 -> 2^53).  The
NativeDecoderBackend row path must rebuild such columns as pandas
masked Int* arrays from the raw decoded values, so the Arrow wire
(jvm_bridge rows mode, the tiledb_native RecordBatch) carries exact
int64 + validity end-to-end."""

import pandas as pd
import pytest

from tiledb_mariadb_spark.sources import tiledb_array as ta
from tiledb_mariadb_spark.sources.tiledb_native import NativeAttr, NativeDim
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)

BIG = 2**53 + 1  # not representable in float64 (rounds to 2^53)


@pytest.fixture()
def arr(tmp_path):
    d = str(tmp_path / "bigarr")
    create_native_array(
        d,
        dims=[NativeDim("k", 1, 1, (0, 1000), None)],
        attrs=[NativeAttr("big", 1, 1, True, None)],
    )
    write_native_fragment(
        d, {"k": [1, 2, 3], "big": [BIG, None, 5]}, ts=1000, version=19
    )
    return d


def _read(arr, conditions=None):
    be = ta.NativeDecoderBackend()
    return be.read_range(
        arr, [(None, None)], ["k", "big"], conditions=conditions
    )


def test_fast_path_exact(arr):
    pdf = _read(arr)
    vals = {k: v for k, v in zip(pdf["k"], pdf["big"])}
    assert vals[1] == BIG and vals[3] == 5
    assert pd.isna(vals[2])


def test_row_path_exact(arr, monkeypatch):
    import tiledb_mariadb_spark.sources.tiledb_native as tn

    monkeypatch.setattr(
        tn, "read_native_array_range_np", lambda *a, **k: None
    )
    pdf = _read(arr)
    assert str(pdf["big"].dtype) == "Int64"
    vals = {k: v for k, v in zip(pdf["k"], pdf["big"])}
    assert vals[1] == BIG and vals[3] == 5
    assert pd.isna(vals[2])


def test_row_path_conditions_3vl(arr, monkeypatch):
    # pushed condition on the masked Int64 column: NULL never matches
    import tiledb_mariadb_spark.sources.tiledb_native as tn

    monkeypatch.setattr(
        tn, "read_native_array_range_np", lambda *a, **k: None
    )
    pdf = _read(arr, conditions=[("big", ">", 0)])
    assert sorted(pdf["k"]) == [1, 3]
    assert list(pdf["big"])[0] == BIG or list(pdf["big"])[1] == BIG


def test_arrow_wire_exact(arr, monkeypatch):
    # the jvm_bridge rows mode serializes read_range output via
    # pa.Table.from_pandas — masked Int64 must map to int64+validity
    import pyarrow as pa

    import tiledb_mariadb_spark.sources.tiledb_native as tn

    monkeypatch.setattr(
        tn, "read_native_array_range_np", lambda *a, **k: None
    )
    tbl = pa.Table.from_pandas(_read(arr), preserve_index=False)
    assert tbl.schema.field("big").type == pa.int64()
    assert tbl.column("big").to_pylist() == [BIG, None, 5]
