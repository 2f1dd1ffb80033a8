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
