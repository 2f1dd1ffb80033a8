"""Zone-map top-k pushdown: `topk_threshold` (metadata-only bound from
v11+ fragment stats) + `topk_array` (the bound pushed as an ordinary
attribute condition, then TakeOrdered).

The contract under test: topk_array == full scan + ORDER BY + LIMIT for
EVERY array shape — when a bound is provable the pruned plan returns the
identical rows (poison test proves refuted fragments are never decoded);
when it is not provable (floats, enums, deletes, dense, missing stats)
the planner returns None and the plain scan answers.

Reference anchor: mytile surfaces fragment min/max only as optimizer
table stats (ha_mytile.cc info/records_in_range); ORDER BY ... LIMIT in
the reference always scans — this operator completes that metadata into
an O(relevant-fragments) read."""

from __future__ import annotations

import os
import random

import pytest

from tiledb_mariadb_spark.sources.tiledb_array import (
    NativeDecoderBackend,
    read_array,
    topk_array,
)
from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
    _fragment_dirs,
    topk_threshold,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)


def _mk(tmp_path, name="arr", nullable=False, attr_dt=1):
    uri = str(tmp_path / name)
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[NativeAttr("v", attr_dt, 1, nullable, None)],
    )
    return uri


def _brute(spark, uri, col, k, ascending=False, **kw):
    pdf = read_array(spark, uri, **kw).toPandas()
    pdf = pdf.sort_values([col, "k"], ascending=[ascending, True])
    return list(map(tuple, pdf.head(k)[["k", col]].itertuples(index=False)))


def _got(spark, uri, col, k, ascending=False, **kw):
    rows = topk_array(spark, uri, col, k, ascending=ascending, **kw).collect()
    return [(r["k"], r[col]) for r in rows]


# --- planner unit behavior ---------------------------------------------------


def test_threshold_disjoint_fragments(tmp_path):
    uri = _mk(tmp_path)
    for f in range(4):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    assert topk_threshold(uri, "v", 10) == 300
    assert topk_threshold(uri, "v", 150) == 200
    assert topk_threshold(uri, "v", 10, ascending=True) == 99
    assert topk_threshold(uri, "v", 400) == 0
    assert topk_threshold(uri, "v", 401) is None  # only 400 rows provable
    assert topk_threshold(uri, "k", 10) == 300  # dims carry stats too
    assert topk_threshold(uri, "v", 0) is None


def test_threshold_shadow_guard(tmp_path):
    """A later overlapping fragment disqualifies the older one from the
    guarantee (its high values may be overwritten), but never breaks
    correctness of the final answer."""
    uri = _mk(tmp_path)
    for f in range(4):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    # newest fragment overwrites keys 350..399 with v=0
    write_native_fragment(
        uri, {"k": list(range(350, 400)), "v": [0] * 50}, ts=9, version=19
    )
    # fragment 300..399 no longer contributes: bound drops to 200
    assert topk_threshold(uri, "v", 10) == 200


def test_threshold_refusals(tmp_path):
    # float attr: NaN ordering makes a pushed bound unsound
    urif = _mk(tmp_path, "f", attr_dt=3)
    write_native_fragment(
        urif, {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}, version=19
    )
    assert topk_threshold(urif, "v", 1) is None
    # visible delete condition: counted rows may be gone
    urid = _mk(tmp_path, "d")
    ks = list(range(100))
    write_native_fragment(urid, {"k": ks, "v": ks}, ts=1, version=19)
    from tiledb_mariadb_spark.sources.tiledb_native_write import (
        write_delete_condition,
    )

    write_delete_condition(urid, [("v", ">", 90)], ts=2)
    assert topk_threshold(urid, "v", 5) is None
    # unknown column
    assert topk_threshold(urid, "nope", 5) is None


def test_threshold_time_travel(tmp_path):
    uri = _mk(tmp_path)
    for f in range(3):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    assert topk_threshold(uri, "v", 10) == 200
    assert topk_threshold(uri, "v", 10, at=2) == 100  # newest invisible
    assert topk_threshold(uri, "v", 10, since=3) == 200  # window = newest


# --- end-to-end parity -------------------------------------------------------


def test_topk_matches_brute_force(spark, tmp_path):
    uri = _mk(tmp_path)
    for f in range(4):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    write_native_fragment(
        uri, {"k": list(range(350, 400)), "v": [0] * 50}, ts=9, version=19
    )
    for k, asc in [(10, False), (5, True), (1000, False)]:
        assert _got(spark, uri, "v", k, asc) == _brute(spark, uri, "v", k, asc)


def test_topk_randomized_overlaps(spark, tmp_path):
    """Randomized fragment layouts — overlapping key ranges, duplicate
    overwrites, ties — pruned top-k must equal brute force."""
    rng = random.Random(7)
    for trial in range(4):
        uri = _mk(tmp_path, f"r{trial}")
        for f in range(rng.randint(2, 6)):
            lo = rng.randrange(0, 500)
            n = rng.randint(20, 120)
            ks = sorted(rng.sample(range(lo, lo + 400), n))
            vs = [rng.randrange(0, 50) for _ in ks]  # heavy ties
            write_native_fragment(
                uri, {"k": ks, "v": vs}, ts=f + 1, version=19
            )
        for k, asc in [(7, False), (13, True)]:
            assert _got(spark, uri, "v", k, asc) == _brute(
                spark, uri, "v", k, asc
            ), f"trial {trial} k={k} asc={asc}"


def test_topk_nullable_attr(spark, tmp_path):
    uri = _mk(tmp_path, nullable=True)
    ks = list(range(200))
    vs = [None if i % 3 == 0 else i for i in range(200)]
    write_native_fragment(uri, {"k": ks, "v": vs}, ts=1, version=19)
    write_native_fragment(
        uri,
        {"k": list(range(200, 400)), "v": list(range(200, 400))},
        ts=2,
        version=19,
    )
    got = _got(spark, uri, "v", 10)
    brute = _brute(spark, uri, "v", 10)
    assert got == brute
    assert all(v is not None for _, v in got)


def test_topk_nullable_ascending_both_plans(spark, tmp_path):
    """Ascending over a nullable column must agree between the PRUNED
    plan (pushed (col, '<=', thr) drops NULLs — they fail every
    comparison) and the FALLBACK plan — which therefore must sort
    NULLS LAST, not Spark's asc() default of NULLS FIRST.  Advisor
    finding r7 (tiledb_array.py topk_array ordering)."""
    # pruned path: two disjoint fragments, bound provable
    uri = _mk(tmp_path, "an", nullable=True)
    write_native_fragment(
        uri,
        {"k": list(range(100)),
         "v": [None if i % 4 == 0 else i for i in range(100)]},
        ts=1, version=19,
    )
    write_native_fragment(
        uri,
        {"k": list(range(100, 200)), "v": list(range(100, 200))},
        ts=2, version=19,
    )
    assert topk_threshold(uri, "v", 10, ascending=True) is not None
    got = _got(spark, uri, "v", 10, ascending=True)
    assert got == _brute(spark, uri, "v", 10, ascending=True)
    assert all(v is not None for _, v in got)
    # fallback path: one tiny overlapped layout where no bound proves
    urif = _mk(tmp_path, "anf", nullable=True)
    write_native_fragment(
        urif, {"k": [1, 2, 3, 4], "v": [None, 3, 1, 2]}, ts=1, version=19
    )
    write_native_fragment(
        urif, {"k": [2, 5], "v": [None, 0]}, ts=2, version=19
    )
    b = NativeDecoderBackend()
    assert b.topk_threshold(urif, "v", 4, ascending=True) is None
    gotf = _got(spark, urif, "v", 4, ascending=True)
    # NULLS LAST: the non-null values come first, ascending
    assert gotf == [(5, 0), (3, 1), (4, 2), (1, None)]


def test_topk_projection_drops_widened_col(spark, tmp_path):
    """When `columns` excludes the ordering column, it is widened in
    only to sort and must NOT appear in the returned schema."""
    uri = str(tmp_path / "projw")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[
            NativeAttr("v", 1, 1, False, None),
            NativeAttr("w", 1, 1, False, None),
        ],
    )
    ks = list(range(50))
    write_native_fragment(
        uri, {"k": ks, "v": ks, "w": [i * 10 for i in ks]},
        ts=1, version=19,
    )
    df = topk_array(spark, uri, "v", 3, columns=["w"])
    assert "v" not in df.columns
    assert sorted(r["w"] for r in df.collect()) == [470, 480, 490]


def test_topk_string_attr(spark, tmp_path):
    uri = str(tmp_path / "s")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[NativeAttr("v", 12, 0xFFFFFFFF, False, None)],
    )
    for f in range(3):
        ks = list(range(f * 50, f * 50 + 50))
        vs = [f"w{f}_{i:03d}" for i in range(50)]
        write_native_fragment(uri, {"k": ks, "v": vs}, ts=f + 1, version=19)
    # the bound is the newest contributing fragment's MIN (guarantees
    # all 50 of its rows), not the exact 5th-largest value
    assert topk_threshold(uri, "v", 5) == "w2_000"
    assert _got(spark, uri, "v", 5) == _brute(spark, uri, "v", 5)


def test_topk_decode_poison(spark, tmp_path):
    """Fragments the bound refutes are NEVER decoded: poison their data
    tiles (not the metadata) and the pruned top-k still answers."""
    uri = _mk(tmp_path)
    for f in range(4):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    thr = topk_threshold(uri, "v", 10)
    assert thr == 300
    poisoned = 0
    for frag in _fragment_dirs(uri):
        import re

        base = os.path.basename(frag)
        # fragment holding values < 300 only: max stat < thr
        from tiledb_mariadb_spark.sources.tiledb_native import (
            fragment_attr_stats,
            parse_array_schema,
            _schema_path,
        )

        schema = parse_array_schema(_schema_path(uri))
        st = fragment_attr_stats(frag, schema)
        _ = re, base
        if st and st["v"]["max"] < thr:
            for fn in os.listdir(frag):
                if fn.endswith(".tdb") and fn != "__fragment_metadata.tdb":
                    p = os.path.join(frag, fn)
                    with open(p, "r+b") as fh:
                        fh.write(b"\xde\xad\xbe\xef" * 4)
                    poisoned += 1
    assert poisoned > 0
    got = _got(spark, uri, "v", 10)
    assert got == [(399 - i, 399 - i) for i in range(10)]


def test_topk_fallback_when_unprovable(spark, tmp_path):
    """Float column: planner refuses, plain scan answers correctly."""
    uri = _mk(tmp_path, "fl", attr_dt=3)
    ks = list(range(100))
    write_native_fragment(
        uri, {"k": ks, "v": [float(i) for i in ks]}, ts=1, version=19
    )
    b = NativeDecoderBackend()
    assert b.topk_threshold(uri, "v", 5) is None
    got = _got(spark, uri, "v", 5)
    assert got == [(99, 99.0), (98, 98.0), (97, 97.0), (96, 96.0), (95, 95.0)]


def test_topk_projection_keeps_order_col(spark, tmp_path):
    uri = _mk(tmp_path, "proj")
    ks = list(range(50))
    write_native_fragment(uri, {"k": ks, "v": ks}, ts=1, version=19)
    df = topk_array(spark, uri, "v", 3, columns=["v"])
    rows = df.collect()
    assert [r["v"] for r in rows] == [49, 48, 47]


def test_topk_at_window(spark, tmp_path):
    uri = _mk(tmp_path, "tt")
    for f in range(3):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    got = _got(spark, uri, "v", 5, at=2)
    assert got == [(199 - i, 199 - i) for i in range(5)]
    got_w = _got(spark, uri, "v", 5, since=3)
    assert got_w == [(299 - i, 299 - i) for i in range(5)]


def test_topk_dups_schema(spark, tmp_path):
    """allows_dups arrays: every fragment counts toward the guarantee
    even when NEDs overlap (duplicates are kept, nothing shadows)."""
    uri = str(tmp_path / "dups")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
        allows_dups=True,
    )
    write_native_fragment(
        uri, {"k": list(range(100)), "v": list(range(100))}, ts=1, version=19
    )
    write_native_fragment(
        uri,
        {"k": list(range(100)), "v": list(range(100, 200))},
        ts=2,
        version=19,
    )
    # overlapping NEDs but dups kept: both fragments guarantee rows
    assert topk_threshold(uri, "v", 150) == 0
    assert topk_threshold(uri, "v", 100) == 100


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_topk_with_conditions(spark, tmp_path):
    """User conditions + bound: only fragments whose EVERY row provably
    passes the conditions count toward the guarantee, so the pushed
    bound stays valid under the residual filter."""
    uri = str(tmp_path / "cond")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[
            NativeAttr("v", 1, 1, False, None),
            NativeAttr("cat", 1, 1, False, None),
        ],
    )
    # fragment 0: cat=1 uniformly (provably satisfies cat=1)
    write_native_fragment(
        uri,
        {"k": list(range(100)), "v": list(range(100)), "cat": [1] * 100},
        ts=1, version=19,
    )
    # fragment 1: cat mixed (cannot contribute to a cat=1 guarantee)
    write_native_fragment(
        uri,
        {
            "k": list(range(100, 200)),
            "v": list(range(100, 200)),
            "cat": [i % 2 for i in range(100)],
        },
        ts=2, version=19,
    )
    # unconditioned: newest fragment guarantees, bound = 100
    assert topk_threshold(uri, "v", 10) == 100
    # cat=1: only fragment 0 counts -> bound drops to 0
    assert topk_threshold(uri, "v", 10, conditions=[("cat", "=", 1)]) == 0
    # end-to-end: conditioned top-k equals brute force
    from pyspark.sql import functions as F

    got = [
        (r["k"], r["v"])
        for r in topk_array(
            spark, uri, "v", 10, conditions=[("cat", "=", 1)]
        ).collect()
    ]
    brute = (
        read_array(spark, uri)
        .filter(F.col("cat") == 1)
        .orderBy(F.col("v").desc(), F.col("k"))
        .limit(10)
        .collect()
    )
    assert got == [(r["k"], r["v"]) for r in brute]
    # range condition the mixed fragment DOES satisfy wholly
    thr = topk_threshold(uri, "v", 10, conditions=[("v", ">=", 0)])
    assert thr == 100  # both fragments satisfy v>=0: full guarantee


def test_topk_conditions_nullable_blocks(spark, tmp_path):
    """A nullable condition column with unknown NULL count can hide a
    failing row — such fragments must not contribute."""
    uri = str(tmp_path / "nullable_cond")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**7), None)],
        attrs=[
            NativeAttr("v", 1, 1, False, None),
            NativeAttr("flag", 1, 1, True, None),
        ],
    )
    write_native_fragment(
        uri,
        {
            "k": list(range(50)),
            "v": list(range(50)),
            "flag": [1] * 49 + [None],
        },
        ts=1, version=19,
    )
    # one NULL flag row -> fragment can't guarantee flag=1 for all rows
    assert topk_threshold(
        uri, "v", 5, conditions=[("flag", "=", 1)]
    ) is None
    got = [
        (r["k"], r["v"])
        for r in topk_array(
            spark, uri, "v", 5, conditions=[("flag", "=", 1)]
        ).collect()
    ]
    assert got == [(48 - i, 48 - i) for i in range(5)]


def test_topk_dense_fallback(spark, tmp_path):
    """Dense arrays: the threshold planner refuses (fills carry no
    stats), the plain scan + TakeOrdered answers."""
    uri = str(tmp_path / "dense")
    create_native_array(
        uri,
        dims=[NativeDim("k", 0, 1, (0, 99), 10)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
        array_type="DENSE",
    )
    write_native_fragment(
        uri, {"v": list(range(10))}, subarray=[(0, 9)], ts=1, version=19
    )
    assert topk_threshold(uri, "v", 3) is None
    got = _got(spark, uri, "v", 3)
    assert got == [(9, 9), (8, 8), (7, 7)]


def test_topk_dim_ranges_disable_bound(spark, tmp_path):
    """dim_ranges restrict which rows compete, but the stats guarantee
    counts whole fragments — the bound must be DISABLED so an in-range
    row can't be excluded by an out-of-range guarantee."""
    uri = _mk(tmp_path, "rng")
    for f in range(4):
        ks = list(range(f * 100, f * 100 + 100))
        write_native_fragment(uri, {"k": ks, "v": ks}, ts=f + 1, version=19)
    # restricted to keys < 150: the true top-3 are 149/148/147 — a
    # bound from the unrestricted stats (300) would exclude them all
    got = [
        (r["k"], r["v"])
        for r in topk_array(
            spark, uri, "v", 3, dim_ranges={"k": (0, 149)}
        ).collect()
    ]
    assert got == [(149, 149), (148, 148), (147, 147)]
