"""Zero-shuffle as-of join (`copartitioned_asof_join`): per-split local
merge_asof with exact boundary extension — `dim0_neighbor` bisects each
B fragment's coordinate chunk index for the predecessor/successor of
every split edge, so a task always sees the reference row its matches
need, without decoding a tile.

Contract: equals a global pandas merge_asof for every direction,
tolerance, fragment layout, and boundary position; visible delete
commits disable the (now-unsound) neighbor extension and widen
conservatively."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from tiledb_mariadb_spark.sources.tiledb_array import (
    copartitioned_asof_join,
)
from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
    dim0_neighbor,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_delete_condition,
    write_native_fragment,
)


def _mk_pair(tmp_path, tag=""):
    ua, ub = str(tmp_path / f"a{tag}"), str(tmp_path / f"b{tag}")
    for u, attr in ((ua, "va"), (ub, "vb")):
        create_native_array(
            u,
            dims=[NativeDim("ts", 1, 1, (0, 10**7), None)],
            attrs=[NativeAttr(attr, 1, 1, False, None)],
        )
    return ua, ub


def _expected(a, b, direction="backward", tolerance=None):
    pa = pd.DataFrame({"ts": [t for t, _ in a], "va": [v for _, v in a]})
    pb = pd.DataFrame({"ts": [t for t, _ in b], "vb": [v for _, v in b]})
    m = pd.merge_asof(
        pa, pb, on="ts", direction=direction, tolerance=tolerance
    )
    return {
        int(r.ts): (int(r.va), None if pd.isna(r.vb) else int(r.vb))
        for r in m.itertuples()
    }


def _got(spark, ua, ub, **kw):
    rows = copartitioned_asof_join(spark, ua, ub, **kw).collect()
    return {
        r["ts"]: (r["va"], None if r["vb"] is None else int(r["vb"]))
        for r in rows
    }


def test_dim0_neighbor(tmp_path):
    ua, _ = _mk_pair(tmp_path)
    write_native_fragment(
        ua, {"ts": [10, 20, 30], "va": [1, 2, 3]}, ts=1, version=19
    )
    write_native_fragment(
        ua, {"ts": [100, 200], "va": [4, 5]}, ts=2, version=19
    )
    assert dim0_neighbor(ua, 25, side="pred") == (True, 20)
    assert dim0_neighbor(ua, 10, side="pred") == (True, None)
    assert dim0_neighbor(ua, 150, side="pred") == (True, 100)
    assert dim0_neighbor(ua, 25, side="succ") == (True, 30)
    assert dim0_neighbor(ua, 200, side="succ") == (True, None)
    assert dim0_neighbor(ua, 99, side="succ") == (True, 100)


def test_asof_directions(spark, tmp_path):
    ua, ub = _mk_pair(tmp_path)
    a = [(t, t) for t in range(10, 1001, 10)]
    b = [(7, 70), (333, 3330), (666, 6660)]
    write_native_fragment(
        ua, {"ts": [t for t, _ in a], "va": [v for _, v in a]},
        ts=1, version=19,
    )
    write_native_fragment(
        ub, {"ts": [t for t, _ in b], "vb": [v for _, v in b]},
        ts=1, version=19,
    )
    for kw in (
        {},
        {"direction": "forward"},
        {"direction": "nearest"},
        {"tolerance": 50},
    ):
        want = _expected(a, b, kw.get("direction", "backward"),
                         kw.get("tolerance"))
        assert _got(spark, ua, ub, target_splits=8, **kw) == want, kw


def test_asof_boundary_rows_multifragment(spark, tmp_path):
    """B rows sitting JUST below split edges (the boundary hazard) over
    multiple B fragments — randomized."""
    rng = random.Random(5)
    for trial in range(3):
        ua, ub = _mk_pair(tmp_path, f"t{trial}")
        a_ts = sorted(rng.sample(range(0, 5000), 300))
        write_native_fragment(
            ua, {"ts": a_ts, "va": a_ts}, ts=1, version=19
        )
        b_all = []
        for f in range(3):  # three overlapping quote fragments
            b_ts = sorted(rng.sample(range(0, 5000), rng.randint(5, 40)))
            write_native_fragment(
                ub,
                {"ts": b_ts, "vb": [t * 10 + f for t in b_ts]},
                ts=f + 1, version=19,
            )
            b_all.append(dict(zip(b_ts, [t * 10 + f for t in b_ts])))
        # newest-wins merged B view
        merged = {}
        for d in b_all:
            merged.update(d)
        b = sorted(merged.items())
        a = [(t, t) for t in a_ts]
        want = _expected(a, b)
        assert _got(spark, ua, ub, target_splits=16) == want, trial


def test_asof_empty_b(spark, tmp_path):
    ua, ub = _mk_pair(tmp_path)
    write_native_fragment(
        ua, {"ts": [1, 2, 3], "va": [1, 2, 3]}, ts=1, version=19
    )
    write_native_fragment(ub, {"ts": [9000], "vb": [9]}, ts=1, version=19)
    got = _got(spark, ua, ub, target_splits=4)
    assert got == {1: (1, None), 2: (2, None), 3: (3, None)}


def test_asof_delete_commit_widens(spark, tmp_path):
    """A visible .del may have removed the predecessor row — the
    neighbor extension is then unsound and the join must widen (still
    exact)."""
    ua, ub = _mk_pair(tmp_path)
    a_ts = list(range(100, 1001, 100))
    write_native_fragment(ua, {"ts": a_ts, "va": a_ts}, ts=1, version=19)
    b_ts = [50, 450, 850]
    write_native_fragment(
        ub, {"ts": b_ts, "vb": [500, 4500, 8500]}, ts=1, version=19
    )
    write_delete_condition(ub, [("vb", "=", 4500)], ts=2)
    b = [(50, 500), (850, 8500)]  # 450 deleted
    want = _expected([(t, t) for t in a_ts], b)
    assert _got(spark, ua, ub, target_splits=8) == want


def test_asof_mismatched_dims_raise(spark, tmp_path):
    ua = str(tmp_path / "x")
    create_native_array(
        ua,
        dims=[NativeDim("other", 1, 1, (0, 10), None)],
        attrs=[NativeAttr("va", 1, 1, False, None)],
    )
    ub = str(tmp_path / "y")
    create_native_array(
        ub,
        dims=[NativeDim("ts", 1, 1, (0, 10), None)],
        attrs=[NativeAttr("vb", 1, 1, False, None)],
    )
    with pytest.raises(ValueError, match="co-partitionable"):
        copartitioned_asof_join(spark, ua, ub)


def test_asof_by_key(spark, tmp_path):
    """Keyed as-of (the real trades/quotes shape): matches are
    per-symbol; tolerance bounds the lookback so split extensions stay
    exact without a per-key bisect."""
    ua, ub = str(tmp_path / "ka"), str(tmp_path / "kb")
    create_native_array(
        ua,
        dims=[NativeDim("ts", 1, 1, (0, 10**7), None)],
        attrs=[
            NativeAttr("sym", 1, 1, False, None),
            NativeAttr("va", 1, 1, False, None),
        ],
    )
    create_native_array(
        ub,
        dims=[NativeDim("ts", 1, 1, (0, 10**7), None)],
        attrs=[
            NativeAttr("sym", 1, 1, False, None),
            NativeAttr("vb", 1, 1, False, None),
        ],
    )
    rng = random.Random(9)
    a = sorted(
        (t, t % 3, t) for t in rng.sample(range(10, 5000), 400)
    )
    b = sorted(
        (t, t % 3, t * 10) for t in rng.sample(range(0, 5000), 60)
    )
    write_native_fragment(
        ua,
        {"ts": [x[0] for x in a], "sym": [x[1] for x in a],
         "va": [x[2] for x in a]},
        ts=1, version=19,
    )
    write_native_fragment(
        ub,
        {"ts": [x[0] for x in b], "sym": [x[1] for x in b],
         "vb": [x[2] for x in b]},
        ts=1, version=19,
    )
    TOL = 400
    got = {
        (r["ts"], r["sym"]): (None if r["vb"] is None else int(r["vb"]))
        for r in copartitioned_asof_join(
            spark, ua, ub, by_cols=["sym"], tolerance=TOL,
            target_splits=16,
        ).collect()
    }
    pa = pd.DataFrame(a, columns=["ts", "sym", "va"])
    pb = pd.DataFrame(b, columns=["ts", "sym", "vb"])
    want_df = pd.merge_asof(
        pa, pb, on="ts", by="sym", tolerance=TOL, direction="backward"
    )
    want = {
        (int(r.ts), int(r.sym)): (None if pd.isna(r.vb) else int(r.vb))
        for r in want_df.itertuples()
    }
    assert got == want
    # missing tolerance must refuse loudly
    with pytest.raises(ValueError, match="tolerance"):
        copartitioned_asof_join(spark, ua, ub, by_cols=["sym"])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
