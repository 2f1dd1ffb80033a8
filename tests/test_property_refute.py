"""Hypothesis fuzz: the fragment-pruning refutation core is SOUND — when
_stats_refute says a (op, val) conjunct cannot match any value in
[lo, hi], a brute-force sweep of the interval (plus the caller's pandas
filter semantics for NULL) must agree.  A single false refutation is a
silently dropped row at 100 TB; this pins the proof obligation."""

import math

from hypothesis import given, settings, strategies as st

from tiledb_mariadb_spark.sources.tiledb_native import _stats_refute

OPS = ["=", "!=", "<>", "<", "<=", ">", ">="]


def _matches(v, op, val):
    """The caller's post-read filter semantics (pandas-style: NaN passes
    '!=', fails everything else).  v=None models a NULL cell."""
    if v is None:
        return op in ("!=", "<>")
    return {
        "=": v == val, "!=": v != val, "<>": v != val,
        "<": v < val, "<=": v <= val, ">": v > val, ">=": v >= val,
    }[op]


@settings(max_examples=500, deadline=None)
@given(
    op=st.sampled_from(OPS),
    val=st.integers(min_value=-25, max_value=25),
    bounds=st.tuples(
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=-20, max_value=20),
    ),
    nullable=st.booleans(),
)
def test_refutation_never_drops_a_matching_value(op, val, bounds, nullable):
    lo, hi = min(bounds), max(bounds)
    if not _stats_refute(op, val, lo, hi, may_have_nulls=nullable):
        return  # no proof claimed — nothing to check
    # claimed: NO cell in this fragment can pass the filter.  Sweep every
    # value the stats allow, plus a NULL cell when the fragment may hold
    # one (min/max ignore NULLs, so a NULL can coexist with any bounds).
    candidates = list(range(lo, hi + 1))
    if nullable:
        candidates.append(None)
    violating = [v for v in candidates if _matches(v, op, val)]
    assert violating == [], (
        f"refuted {op} {val} over [{lo},{hi}] nullable={nullable} "
        f"but {violating[:3]} match"
    )


@settings(max_examples=200, deadline=None)
@given(
    val=st.floats(allow_nan=False, allow_infinity=False, width=32),
    bounds=st.tuples(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    op=st.sampled_from(OPS),
)
def test_refutation_sound_on_floats_at_the_bounds(val, bounds, op):
    """Float stats: refutation may only rely on the closed interval's
    ENDPOINTS — lo and hi themselves are always attainable values."""
    lo, hi = min(bounds), max(bounds)
    if not _stats_refute(op, val, lo, hi, may_have_nulls=False):
        return
    for v in (lo, hi, (lo + hi) / 2 if math.isfinite(lo + hi) else lo):
        if lo <= v <= hi:
            assert not _matches(v, op, val)
