"""Binned interval-overlap join: all (a, b) pairs whose [start, end]
intervals overlap, without a theta join.

Each interval explodes into the fixed-width time buckets it covers;
candidate pairs meet by bucket EQUI-join; the exact overlap predicate
verifies; and the single-emission rule (a pair is produced only in the
bucket containing the LATER of the two starts — a bucket both intervals
provably cover when they overlap) guarantees each pair appears exactly
once with no post-dedup shuffle.

Cost scales with bucket-local density products (the true overlap
workload), never |A|×|B|; bucket width trades explode factor against
candidate precision (width ≈ typical interval length is the sweet spot).
The q223 conformance spec pins parity against DuckDB's plain theta join
and tests/test_property_intervals.py fuzzes random interval sets against
a brute-force reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bucket_width: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_s", "a_e"),
    b_cols: tuple[str, str, str] = ("b_id", "b_s", "b_e"),
) -> DataFrame:
    """``a``/``b`` carry (id, start, end) integer columns named by
    ``a_cols``/``b_cols`` (end inclusive, end >= start >= 0).  Returns
    one row per overlapping pair: both ids plus ``overlap`` (inclusive
    overlap length in the same units)."""
    a_id, a_s, a_e = a_cols
    b_id, b_s, b_e = b_cols

    def binned(df, s, e):
        return df.withColumn(
            "__bucket",
            F.explode(
                F.expr(f"sequence({s} DIV {bucket_width}, {e} DIV {bucket_width})")
            ),
        )

    joined = binned(a, a_s, a_e).join(binned(b, b_s, b_e), "__bucket")
    return (
        joined.filter(
            (F.col(a_s) <= F.col(b_e))
            & (F.col(b_s) <= F.col(a_e))
            & (
                F.col("__bucket")
                == F.expr(f"greatest({a_s}, {b_s}) DIV {bucket_width}")
            )
        )
        .select(
            a_id,
            b_id,
            (F.least(a_e, b_e) - F.greatest(a_s, b_s)).alias("overlap"),
        )
    )
