"""Skyline (Pareto-frontier) query: rows not dominated by any other row
on a (minimize, maximize) criteria pair.

The textbook single-node formulation is a NOT EXISTS self-join — O(n²)
and a cross-product at cluster scale.  The distributive property of
dominance (the global skyline is a subset of the union of per-partition
skylines, because dominance is transitive) gives the scale shape used
here:

1. **local phase** — each input partition removes its locally dominated
   rows with one sort + two window maxes (no shuffle: the window is
   PARTITION BY spark_partition_id, so every partition is an independent
   window group);
2. **global phase** — the same elimination over the surviving frontier
   candidates, which for real data are a vanishing fraction of the input
   (frontier size grows ~O(log n) for independent dims), so the global
   window's single sort is over a bounded set, not the corpus.

Dominance test per phase, with rows sorted by (min_col ASC):
``dominated ⟺ MAX(max_col) over strictly-cheaper rows ≥ my max_col
           OR MAX(max_col) over same-cost rows > my max_col``
— the first window is a RANGE frame ending 1 before the current cost
(so ties on cost are excluded — they cannot dominate via strict cost),
the second a per-cost-group max (a same-cost row dominates only via a
strictly larger max_col).  Exact-duplicate pairs dominate neither way and
are both kept, matching the NOT EXISTS semantics the DuckDB oracle runs.

Reference parity: no skyline exists in TileDB-MariaDB; this extends the
analytics surface (driver-added scope) the way a price/performance
frontier query would be written over array data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _eliminate(df: DataFrame, min_col: str, max_col: str, pid) -> DataFrame:
    """One elimination pass; ``pid`` is the window-partition expression
    (spark_partition_id for the local phase, a constant for the global
    one, where the candidate set is already bounded)."""
    strictly_cheaper = (
        Window.partitionBy(pid)
        .orderBy(F.col(min_col).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_cost = Window.partitionBy(pid, F.col(min_col))
    out = df.withColumn("__m1", F.max(max_col).over(strictly_cheaper)).withColumn(
        "__m2", F.max(max_col).over(same_cost)
    )
    return out.filter(
        ~(
            F.coalesce(F.col("__m1") >= F.col(max_col), F.lit(False))
            | (F.col("__m2") > F.col(max_col))
        )
    ).drop("__m1", "__m2")


def skyline(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Pareto frontier: minimize ``min_col``, maximize ``max_col``.

    Both criteria columns must be orderable; ``min_col`` must be integral
    (the strict-dominance window uses a RANGE frame ending at −1).

    NULL criteria follow the NOT EXISTS oracle's 3VL: every dominance
    comparison against a NULL is unknown, so a row with a NULL criterion
    can neither dominate nor be dominated — it is always part of the
    frontier, and is excluded from the elimination windows (where the
    negated ``__m2 > max_col`` filter would otherwise silently drop it —
    round-2 advisor item).
    """
    crit_null = F.col(min_col).isNull() | F.col(max_col).isNull()
    clean = df.filter(~crit_null)
    local = _eliminate(clean, min_col, max_col, F.spark_partition_id())
    return _eliminate(local, min_col, max_col, F.lit(0)).unionByName(
        df.filter(crit_null)
    )


def skyline_sql(rel: str, min_col: str, max_col: str, keys: str) -> str:
    """DuckDB oracle: the NOT EXISTS formulation (oracle-scale only)."""
    return f"""
SELECT {keys}, {min_col}, {max_col} FROM ({rel}) p
WHERE NOT EXISTS (
  SELECT 1 FROM ({rel}) q
  WHERE q.{min_col} <= p.{min_col} AND q.{max_col} >= p.{max_col}
    AND (q.{min_col} < p.{min_col} OR q.{max_col} > p.{max_col}))
"""
