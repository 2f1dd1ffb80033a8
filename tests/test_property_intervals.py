"""Property-based binned interval-overlap join: random interval sets vs
brute force.  Targets the single-emission rule (one row per overlapping
pair, produced only in the later-start bucket) across the boundary cases
random data produces: intervals spanning many buckets, touching
endpoints, zero-length intervals, bucket-edge starts."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiledb_mariadb_spark.operators.intervals import interval_overlap_join

intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),   # start
        st.integers(min_value=0, max_value=40),    # length (0 allowed)
    ),
    min_size=0,
    max_size=15,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(aa=intervals, bb=intervals, width=st.sampled_from([7, 16, 50]))
def test_binned_overlap_matches_bruteforce(spark, aa, bb, width):
    a_rows = [(i, s, s + ln) for i, (s, ln) in enumerate(aa)]
    b_rows = [(i, s, s + ln) for i, (s, ln) in enumerate(bb)]
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long") if a_rows else spark.createDataFrame([], "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long") if b_rows else spark.createDataFrame([], "b_id long, b_s long, b_e long")
    got = sorted(
        (r["a_id"], r["b_id"], r["overlap"])
        for r in interval_overlap_join(a, b, width).collect()
    )
    want = sorted(
        (ai, bi, min(ae, be) - max(a_s, b_s))
        for ai, a_s, ae in a_rows
        for bi, b_s, be in b_rows
        if a_s <= be and b_s <= ae
    )
    assert got == want, f"width={width} a={a_rows} b={b_rows}"
