"""The jvm_bridge numpy rows path applies pushed conditions with
vectorized masks (_np_cond_mask) instead of the pandas evaluator
(_apply_conditions).  Both implement the same 3VL contract (NULL never
matches; IS NULL / IS NOT NULL test validity) — this fuzz pins them
row-for-row equal across the column shapes the decoder produces:
int64/float64 numpy columns and object columns (strings or nullable
ints with None)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from tiledb_mariadb_spark.sources.tiledb_array import _apply_conditions
from tiledb_mariadb_spark.tools.jvm_bridge import _np_cond_mask

OPS = ["=", "!=", "<", "<=", ">", ">="]


def _apply_np(arrays, conds):
    mask = None
    for c in conds:
        m = _np_cond_mask(
            np, arrays[c[0]], c[1], c[2] if len(c) > 2 else None
        )
        mask = m if mask is None else (mask & m)
    if mask is None:
        return arrays
    return {nm: a[mask] for nm, a in arrays.items()}


def _check(arrays, conds):
    pdf = pd.DataFrame({nm: a for nm, a in arrays.items()})
    want = _apply_conditions(pdf, conds)
    got = _apply_np(arrays, conds)
    n = len(next(iter(got.values()))) if got else 0
    assert n == len(want), (conds, n, len(want))
    for nm in arrays:
        g = list(got[nm])
        w = list(want[nm])
        same = [
            (a == b) or (a is None and (b is None or b != b))
            or (isinstance(a, float) and a != a and (b is None or b != b))
            for a, b in zip(g, w)
        ]
        assert all(same), (nm, conds, g[:5], w[:5])


@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(st.integers(-5, 5), min_size=0, max_size=40),
    op=st.sampled_from(OPS + ["in", "is_null", "is_not_null"]),
    pivot=st.integers(-5, 5),
)
def test_int_column_parity(vals, op, pivot):
    arrays = {"x": np.asarray(vals, dtype=np.int64)}
    c = (
        ("x", op) if op.startswith("is_")
        else ("x", op, (pivot, pivot + 2) if op == "in" else pivot)
    )
    _check(arrays, [c])


@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-5, 5, allow_nan=False)),
        min_size=0, max_size=40,
    ),
    op=st.sampled_from(OPS + ["in", "is_null", "is_not_null"]),
    pivot=st.floats(-5, 5, allow_nan=False),
)
def test_float_nan_column_parity(vals, op, pivot):
    # decoder float columns carry NaN for NULL
    arr = np.asarray(
        [np.nan if v is None else v for v in vals], dtype=np.float64
    )
    arrays = {"x": arr}
    c = (
        ("x", op) if op.startswith("is_")
        else ("x", op, (pivot,) if op == "in" else pivot)
    )
    _check(arrays, [c])


@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "cc", ""])),
        min_size=0, max_size=40,
    ),
    op=st.sampled_from(OPS + ["in", "is_null", "is_not_null"]),
    pivot=st.sampled_from(["a", "b", "z"]),
)
def test_object_string_parity(vals, op, pivot):
    arr = np.empty(len(vals), dtype=object)
    arr[:] = vals
    arrays = {"x": arr}
    c = (
        ("x", op) if op.startswith("is_")
        else ("x", op, (pivot, "b") if op == "in" else pivot)
    )
    _check(arrays, [c])


@settings(max_examples=80, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-(2**60), 2**60)),
        min_size=0, max_size=30,
    ),
    op=st.sampled_from(OPS),
    pivot=st.integers(-(2**60), 2**60),
)
def test_object_nullable_int_parity(vals, op, pivot):
    # nullable bigints ride as object arrays (exactness past 2^53)
    arr = np.empty(len(vals), dtype=object)
    arr[:] = vals
    _check({"x": arr}, [("x", op, pivot)])


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 30),
    seed=st.integers(0, 10**6),
    k=st.integers(1, 3),
)
def test_conjunction_parity(n, seed, k):
    import random

    rng = random.Random(seed)
    xs = np.asarray([rng.randint(-5, 5) for _ in range(n)], np.int64)
    ys = np.empty(n, object)
    ys[:] = [
        None if rng.random() < 0.3 else rng.choice("abc") for _ in range(n)
    ]
    conds = []
    for _ in range(k):
        if rng.random() < 0.5:
            conds.append(("x", rng.choice(OPS), rng.randint(-5, 5)))
        else:
            conds.append(("y", rng.choice([*OPS[:2], "is_null", "in"])))
    conds = [
        c if len(c) > 2 or c[1].startswith("is_")
        else (c[0], c[1], ("a", "b") if c[1] == "in" else "b")
        for c in conds
    ]
    _check({"x": xs, "y": ys}, conds)
