"""As-of join — an operator the reference lacks natively but a time-series
table engine needs (SURVEY.md lists it as custom-operator scope).

Implemented as a *composition of built-in ops* (union + window with a range
frame), so the whole thing stays inside whole-stage codegen — no Python
boundary.  Scale notes: one shuffle on the join key (same as any sort-merge
join would need); the range frame is evaluated streamingly per partition;
skewed keys behave like any windowed aggregation (salt upstream if a single
key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _struct_type(df: DataFrame, cols: list[str]) -> StructType:
    return StructType([df.schema[c] for c in cols])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``on`` key and ``right_ts`` < ``left_ts`` (``<=`` when strict=False).

    Returns all left columns plus ``<value><suffix>`` for each of
    ``right_values``.  Timestamps are compared at microsecond resolution.
    """
    lcols = left.columns
    lpay_t = _struct_type(left, lcols)
    rpay_t = _struct_type(right, right_values)

    l = left.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(left_ts)).alias("__ts"),
        F.struct(*lcols).alias("__lpay"),
        F.lit(None).cast(rpay_t).alias("__rpay"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(right_ts)).alias("__ts"),
        F.lit(None).cast(lpay_t).alias("__lpay"),
        F.struct(*right_values).alias("__rpay"),
    )
    unioned = l.unionByName(r)

    # Range frame over event-time micros: all rows with equal __ts enter
    # the frame together, so left/right tie-order inside the union can't
    # change the result (deterministic under any shuffle order).
    upper = -1 if strict else 0
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts")
        .rangeBetween(Window.unboundedPreceding, upper)
    )
    matched = unioned.withColumn(
        "__match", F.last(F.col("__rpay"), ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__lpay").isNotNull()).select(
        *[F.col(f"__lpay.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{v}").alias(f"{v}{suffix}") for v in right_values],
    )
