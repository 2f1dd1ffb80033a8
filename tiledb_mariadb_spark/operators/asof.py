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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the matching right row with the same
    ``on`` key per ``direction`` (pandas ``merge_asof`` parity):

    - ``backward`` — most recent right row with ``right_ts`` < ``left_ts``
      (``<=`` when strict=False);
    - ``forward`` — earliest right row with ``right_ts`` > ``left_ts``
      (``>=`` when strict=False);
    - ``nearest`` — whichever of the two is closer in time (ties →
      backward).

    ``tolerance_us`` nulls out matches further than that many
    microseconds away.  Returns all left columns plus ``<value><suffix>``
    for each of ``right_values``.  Still one shuffle + codegen windows —
    the forward/nearest variants just add the mirrored frame.

    Two RIGHT rows sharing (key, ts) make the match among them
    order-dependent (same as pandas merge_asof with duplicate
    timestamps); keep right timestamps unique per key when the choice
    matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    lpay_t = _struct_type(left, lcols)
    rpay_t = _struct_type(right, right_values)

    l = left.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(left_ts)).alias("__ts"),
        F.struct(*lcols).alias("__lpay"),
        F.lit(None).cast(rpay_t).alias("__rpay"),
        F.lit(None).cast("long").alias("__rts"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(right_ts)).alias("__ts"),
        F.lit(None).cast(lpay_t).alias("__lpay"),
        F.struct(*right_values).alias("__rpay"),
        F.unix_micros(F.col(right_ts)).alias("__rts"),
    )
    unioned = l.unionByName(r)

    # Range frames over event-time micros: all rows with equal __ts enter
    # the frame together, so left/right tie-order inside the union can't
    # change the result (deterministic under any shuffle order).
    base = Window.partitionBy("__k").orderBy("__ts")
    matched = unioned
    if direction in ("backward", "nearest"):
        wb = base.rangeBetween(Window.unboundedPreceding, -1 if strict else 0)
        matched = matched.withColumn(
            "__mb", F.last("__rpay", ignorenulls=True).over(wb)
        ).withColumn("__tb", F.last("__rts", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        wf = base.rangeBetween(1 if strict else 0, Window.unboundedFollowing)
        matched = matched.withColumn(
            "__mf", F.first("__rpay", ignorenulls=True).over(wf)
        ).withColumn("__tf", F.first("__rts", ignorenulls=True).over(wf))
    if direction == "backward":
        match, mts = F.col("__mb"), F.col("__tb")
    elif direction == "forward":
        match, mts = F.col("__mf"), F.col("__tf")
    else:
        back_closer = F.col("__mf").isNull() | (
            F.col("__mb").isNotNull()
            & (
                (F.col("__ts") - F.col("__tb"))
                <= (F.col("__tf") - F.col("__ts"))
            )
        )
        match = F.when(back_closer, F.col("__mb")).otherwise(F.col("__mf"))
        mts = F.when(back_closer, F.col("__tb")).otherwise(F.col("__tf"))
    if tolerance_us is not None:
        in_tol = F.abs(F.col("__ts") - mts) <= F.lit(tolerance_us)
        match = F.when(in_tol, match).otherwise(F.lit(None).cast(rpay_t))
    matched = matched.withColumn("__match", match)
    return matched.filter(F.col("__lpay").isNotNull()).select(
        *[F.col(f"__lpay.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{v}").alias(f"{v}{suffix}") for v in right_values],
    )
