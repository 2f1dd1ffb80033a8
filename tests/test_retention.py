"""TTL retention (`expire_native_fragments`): age-based fragment expiry
— fragments wholly before the cutoff are physically removed (markers
first), spanning fragments are kept whole, obsolete `.del` commits are
swept, and every read at-or-after the cutoff is bit-identical before
and after."""

from __future__ import annotations

import os

import pytest

from tiledb_mariadb_spark.sources.tiledb_array import (
    consolidate_array,
    read_array,
)
from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
    _fragment_dirs,
    read_native_array_range_np,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    expire_native_fragments,
    write_delete_condition,
    write_native_fragment,
)


def _mk(tmp_path, name="arr"):
    uri = str(tmp_path / name)
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**6), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )
    for i, ts in enumerate((1000, 2000, 3000)):
        ks = list(range(i * 100, i * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=ts, version=19)
    return uri


def _rows(uri, at=None):
    out = read_native_array_range_np(
        uri, ranges=[(None, None)], columns=["v"], at=at
    )
    names, arrays = out
    return sorted(zip(arrays["k"].tolist(), arrays["v"].tolist()))


def test_expire_basic(tmp_path):
    uri = _mk(tmp_path)
    want_after = _rows(uri, at=None)
    want_at3000 = _rows(uri, at=3000)
    n = expire_native_fragments(uri, before=2500)
    assert n == 2
    assert len(_fragment_dirs(uri)) == 1
    # rows from the expired fragments are gone; the 3000 fragment whole
    assert _rows(uri) == [(k, k) for k in range(200, 300)]
    assert _rows(uri, at=3000) == [
        p for p in want_at3000 if p[0] >= 200
    ]
    _ = want_after


def test_expire_markers_swept(tmp_path):
    uri = _mk(tmp_path)
    commits = os.path.join(uri, "__commits")
    pre = [e for e in os.listdir(commits) if e.endswith(".wrt")]
    assert len(pre) == 3
    expire_native_fragments(uri, before=2500)
    post = [e for e in os.listdir(commits) if e.endswith(".wrt")]
    assert len(post) == 1


def test_expire_keeps_spanning_consolidated(spark, tmp_path):
    uri = _mk(tmp_path)
    consolidate_array(spark, uri, target_splits=2)  # span [1000, 3000]
    before = _rows(uri)
    # cutoff INSIDE the consolidated span: the merged fragment survives
    # whole; the covered originals (t2 < cutoff) go
    n = expire_native_fragments(uri, before=2500)
    assert n >= 2
    assert _rows(uri) == before  # merged state intact


def test_expire_sweeps_obsolete_deletes(tmp_path):
    uri = _mk(tmp_path)
    # delete affects only the ts<=1500 cells (the 1000 fragment)
    write_delete_condition(uri, [("v", "<", 50)], ts=1500)
    commits = os.path.join(uri, "__commits")
    assert any(e.endswith(".del") for e in os.listdir(commits))
    expire_native_fragments(uri, before=2500)
    # min surviving t1 = 3000 > 1500: the .del can never match again
    assert not any(e.endswith(".del") for e in os.listdir(commits))
    assert _rows(uri) == [(k, k) for k in range(200, 300)]


def test_expire_keeps_live_deletes(tmp_path):
    uri = _mk(tmp_path)
    # delete at 2500 affects the 1000 AND 2000 fragments
    write_delete_condition(uri, [("v", "<", 150)], ts=2500)
    commits = os.path.join(uri, "__commits")
    expire_native_fragments(uri, before=2000)  # removes only frag@1000
    # frag@2000 (t1=2000 <= 2500) still has deletable cells: .del stays
    assert any(e.endswith(".del") for e in os.listdir(commits))
    assert _rows(uri) == [(k, k) for k in range(150, 300)]


def test_expire_read_equality_after_cutoff(spark, tmp_path):
    uri = _mk(tmp_path)
    pre = sorted(tuple(r) for r in read_array(spark, uri).collect())
    pre_at = sorted(
        tuple(r) for r in read_array(spark, uri, at=3000).collect()
    )
    expire_native_fragments(uri, before=1500)  # only frag@1000 goes
    post = sorted(tuple(r) for r in read_array(spark, uri).collect())
    post_at = sorted(
        tuple(r) for r in read_array(spark, uri, at=3000).collect()
    )
    keep = [p for p in pre if p[0] >= 100]
    assert post == keep
    assert post_at == [p for p in pre_at if p[0] >= 100]


def test_expire_nothing(tmp_path):
    uri = _mk(tmp_path)
    assert expire_native_fragments(uri, before=500) == 0
    assert len(_fragment_dirs(uri)) == 3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
