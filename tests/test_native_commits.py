"""Commit-marker visibility for native arrays.

The reference's storage engine never reads a fragment whose commit marker
is missing — that marker (a zero-length file written last) is what makes
fragment writes crash-atomic.  Era artifacts pinned by the fixtures:
``.ok`` beside the fragment (2.0-2.3), ``__commits/*.wrt`` (2.3+,
multi_attribute), ``.con`` consolidated-commit lists (var/obs), and the
pre-marker 1.6 era (directory presence only).
"""
import os

import pytest

from tiledb_mariadb_spark.sources.tiledb_native import (
    _frag_range,
    _fragment_dirs,
    read_native_array,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    NativeAttr,
    NativeDim,
    create_native_array,
    write_native_fragment,
)


def _mkarray(d):
    uri = str(d / "arr")
    create_native_array(
        uri,
        [NativeDim("x", 1, 1, (0, 999), 10)],
        [NativeAttr("v", 1, 1, False, None)],
    )
    return uri


def _frag_names(uri):
    return [os.path.basename(f) for f in _fragment_dirs(uri)]


def test_frag_range_parses_consolidated_names():
    assert _frag_range("__100_200_abc_5") == (100, 200)
    assert _frag_range("__7_7_abc") == (7, 7)
    assert _frag_range("not_a_fragment") == (0, 0)


def test_unmarked_fragment_invisible_in_commits_era(tmp_path):
    uri = _mkarray(tmp_path)
    frag = write_native_fragment(uri, {"x": [1, 2], "v": [10, 20]}, ts=100)
    commits = os.path.join(uri, "__commits")
    if not os.path.isdir(commits):
        pytest.skip("writer predates __commits layout")
    name = os.path.basename(frag)
    marker = os.path.join(commits, name + ".wrt")
    assert os.path.isfile(marker), "writer must emit the commit marker"
    assert _frag_names(uri) == [name]
    # a crash between data files and marker = staged dir, no marker
    os.unlink(marker)
    assert _frag_names(uri) == []
    _, rows = read_native_array(uri)
    assert rows == []
    # marker restored -> visible again
    open(marker, "w").close()
    _, rows = read_native_array(uri)
    assert [r for r in rows] == [(1, 10), (2, 20)]


def test_con_file_commits_fragment(tmp_path):
    uri = _mkarray(tmp_path)
    frag = write_native_fragment(uri, {"x": [5], "v": [50]}, ts=100)
    name = os.path.basename(frag)
    commits = os.path.join(uri, "__commits")
    if not os.path.isdir(commits):
        pytest.skip("writer predates __commits layout")
    os.unlink(os.path.join(commits, name + ".wrt"))
    # the var/obs fixture format: newline-separated commit URIs
    con = os.path.join(commits, f"__100_100_{'c' * 32}_5.con")
    with open(con, "w") as f:
        f.write(f"__commits/{name}.wrt\n")
    assert _frag_names(uri) == [name]
    # an .ign file disregards the .con again (post-vacuum artifact)
    with open(os.path.join(commits, "x.ign"), "w") as f:
        f.write(f"__commits/{os.path.basename(con)}\n")
    assert _frag_names(uri) == []


def test_legacy_ok_marker_gates_root_fragments(tmp_path):
    uri = _mkarray(tmp_path)
    import shutil

    # degrade to the 2.0-era layout: fragments in the root, .ok markers
    frag = write_native_fragment(uri, {"x": [1], "v": [10]}, ts=100)
    name = os.path.basename(frag)
    root_frag = os.path.join(uri, name)
    if root_frag != frag:
        shutil.move(frag, root_frag)
    shutil.rmtree(os.path.join(uri, "__commits"), ignore_errors=True)
    shutil.rmtree(os.path.join(uri, "__fragments"), ignore_errors=True)
    # no marker era at all -> directory presence wins (1.6 parity)
    assert _frag_names(uri) == [name]
    # one .ok appears -> gating activates; the unmarked twin goes dark
    open(os.path.join(uri, name + ".ok"), "w").close()
    assert _frag_names(uri) == [name]
    os.unlink(os.path.join(uri, name + ".ok"))
    open(os.path.join(uri, "__999_999_other_5.ok"), "w").close()
    assert _frag_names(uri) == []


def test_open_at_excludes_mid_range_consolidated(tmp_path):
    uri = _mkarray(tmp_path)
    os.makedirs(os.path.join(uri, "__commits"), exist_ok=True)
    frag = write_native_fragment(uri, {"x": [1], "v": [1]}, ts=100)
    commits = os.path.join(uri, "__commits")
    root = os.path.dirname(frag)
    # hand-build a consolidated twin spanning [100, 300]
    import shutil

    cons = os.path.join(root, f"__100_300_{'d' * 32}_5")
    shutil.copytree(frag, cons)
    for n in (os.path.basename(frag), os.path.basename(cons)):
        open(os.path.join(commits, n + ".wrt"), "w").close()
    # full view: the wider fragment covers the original
    assert _frag_names(uri) == [os.path.basename(cons)]
    # opening mid-range (at=200 < 300) skips the consolidated fragment
    # and falls back to the original — TileDB's time-travel rule
    assert [os.path.basename(f) for f in _fragment_dirs(uri, at=200)] == [
        os.path.basename(frag)
    ]
    assert [os.path.basename(f) for f in _fragment_dirs(uri, at=99)] == []
