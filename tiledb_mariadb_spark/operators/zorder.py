"""Z-order (Morton) clustering — the Spark-side analog of the reference's
HILBERT cell order (ha_mytile.cc:71-73, t/hilbert.test): multi-dimensional
locality for range queries over several dimension columns.

At write time, ``cluster_by_zorder`` range-partitions and sorts by the
interleaved key, so a 2-D box predicate touches a small number of files /
row groups instead of all of them — the same goal TileDB pursues with
Hilbert cell order.  The z-value is pure JVM bit arithmetic (codegen'd),
built from non-negative normalized coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into a Morton key.  With k columns the result uses k*bits bits
    (≤ 63 required)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError("k*bits must fit in a signed 64-bit integer")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z + (bit * F.lit(1 << (b * k + i)).cast("long"))
    return z


def z_value_py(coords: list[int], bits: int = 16) -> int:
    """Python reference implementation (for tests)."""
    z = 0
    for b in range(bits):
        for i, c in enumerate(coords):
            z |= ((c >> b) & 1) << (b * len(coords) + i)
    return z


def hilbert2_expr(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression for the TRUE 2-D Hilbert index of
    (``x``, ``y``) — exact parity with the reference's HILBERT cell order
    (ha_mytile.cc:71-73 maps to tiledb HILBERT; t/hilbert.test), not the
    Morton approximation: Hilbert's defining property is that successive
    index values are ADJACENT cells (Manhattan distance 1), so a range of
    the key is a connected region — strictly better box-query locality
    than Morton's discontinuous jumps.

    The classic xy2d loop carries mutable (x, y, d) state across
    ``bits`` rotation steps; naively inlining it doubles the expression
    tree per step (3^bits nodes).  Each step here binds the previous
    state ONCE as a lambda variable via the let-idiom
    ``element_at(transform(array(<state>), t -> <next-state>), 1)``,
    keeping the tree linear in ``bits`` and fully codegen-inline (no
    UDF).  Coordinates must be non-negative and < 2^bits.
    """
    if bits > 31:
        raise ValueError("bits must be <= 31 (d uses 2*bits bits)")
    state = (
        f"named_struct('x', CAST({x} AS BIGINT), 'y', CAST({y} AS BIGINT),"
        f" 'd', CAST(0 AS BIGINT))"
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (t.x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (t.y & {s}) > 0 THEN 1 ELSE 0 END)"
        newd = (
            f"t.d + CAST({s} AS BIGINT) * {s}"
            f" * CAST(({rx} * 3) ^ {ry} AS BIGINT)"
        )
        newx = (
            f"CASE WHEN {ry} = 1 THEN t.x"
            f" WHEN {rx} = 1 THEN {s - 1} - t.y ELSE t.y END"
        )
        newy = (
            f"CASE WHEN {ry} = 1 THEN t.y"
            f" WHEN {rx} = 1 THEN {s - 1} - t.x ELSE t.x END"
        )
        state = (
            f"element_at(transform(array({state}), t -> named_struct("
            f"'x', {newx}, 'y', {newy}, 'd', {newd})), 1)"
        )
    return f"({state}).d"


def hilbert2_py(x: int, y: int, bits: int = 16) -> int:
    """Python reference xy2d (for tests)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def cluster_by_zorder(
    df: DataFrame, dim_cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort by the Morton key.  Input columns must be
    non-negative integral (normalize/offset upstream)."""
    z = z_value([F.col(c) for c in dim_cols], bits=bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
