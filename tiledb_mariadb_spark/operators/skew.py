"""Skewed-key join salting.

At 100 TB a handful of hot keys (one customer with 1% of all orders) turn
a shuffle join into a straggler: every row of a hot key lands on ONE
reducer.  First line of defense is AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled`` — on in session.py), which
handles sort-merge joins transparently.  Salting is the explicit fallback
for the cases AQE doesn't cover (stream-static joins, aggregations over a
hot group, broadcast-ineligible hash joins):

- fact side: ``salt = pmod(hash(key, ...), n_salts)`` — deterministic,
  JVM-side, spreads each hot key over ``n_salts`` reducers;
- dim side: replicated ``n_salts``× via an inline explode (only the dim
  side grows, by a constant factor);
- join on ``(key, salt)``; result parity with the unsalted join is exact.

Salted two-phase aggregation (``salted_agg_count``) does the same for a
hot GROUP BY: partial agg on (key, salt), final agg on key — the second
shuffle moves only n_salts rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic per-row salt: hash of the full row bounded to
    [0, n_salts) — spreads a hot key's rows evenly without RNG."""
    return df.withColumn(SALT, F.pmod(F.hash(*df.columns), F.lit(n_salts)))


def replicated(df: DataFrame, n_salts: int) -> DataFrame:
    """Dim side: one copy per salt value."""
    return df.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with hot-key spreading; same rows as fact.join(dim, on, how)."""
    f = with_salt(fact, n_salts)
    d = replicated(dim, n_salts)
    return f.join(d, on=on + [SALT], how=how).drop(SALT)


def salted_agg_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """COUNT per hot key in two phases: (key, salt) partial → key final.
    Phase-1 reducers each see ≤ 1/n_salts of any hot key's rows."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, SALT)
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))
