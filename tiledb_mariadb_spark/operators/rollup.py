"""Incremental rollup maintenance — the continuous-aggregate /
materialized-rollup pattern over versioned tile tables.

The reference keeps arrays fresh by appending fragments
(mytile/ha_mytile.cc write path; fragments accumulate until
consolidation); analytics over them re-aggregate from scratch.  This
operator maintains a pre-aggregated rollup table *incrementally*: each
refresh reads ONLY the source versions written since the last refresh
(TileTable.read_changes — partition-pruned to the new fragments), partial
aggregates the delta, and merges it with the stored rollup by summing —
never rescanning history.

Scale: the whole point.  A full recompute scans the 100 TB fact table per
refresh; this scans the delta (bounded by ingest rate), shuffles only
``delta-groups + rollup-rows`` narrow rows, and writes back one rollup
version.  Correct for ALGEBRAIC aggregates (count/sum, and anything
derivable: avg = sum/count) over APPEND-ONLY sources — overwrite
semantics would double-count, the same restriction real continuous
aggregates impose (they invalidate regions instead).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    delta: DataFrame, keys: Sequence[str], sums: dict[str, Column]
) -> DataFrame:
    """Partial (map-side-combinable) aggregate of a change-feed batch:
    every measure is a SUM over an expression, plus an ``n`` row count —
    the merge-able form."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")] + [
        F.sum(expr).cast("bigint").alias(name) for name, expr in sums.items()
    ]
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollup(
    stored: DataFrame, delta_partial: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge stored rollup rows with a new partial: union + re-sum.  Both
    sides are already one-row-per-group, so the shuffle moves only narrow
    pre-aggregated rows."""
    measures = [c for c in stored.columns if c not in keys]
    merged = stored.unionByName(delta_partial.select(*stored.columns))
    return merged.groupBy(*keys).agg(
        *[F.sum(c).cast("bigint").alias(c) for c in measures]
    )


def refresh_rollup(
    rollup_table,
    source_table,
    since_ts: int,
    version_ts: int,
    keys: Sequence[str],
    sums: dict[str, Column],
    key_exprs: dict[str, Column] | None = None,
) -> int:
    """One maintenance cycle: delta = source versions newer than
    ``since_ts`` → partial aggregate → merge with the stored rollup rows
    of the SAME keys → write only those merged groups as rollup version
    ``version_ts``.  Untouched groups are not rewritten — the rollup
    table's own last-writer-wins read keeps serving them from earlier
    versions, so refresh cost (read, shuffle, AND write) scales with the
    delta's key span, not the rollup size.  ``key_exprs`` derives rollup
    keys from source columns (e.g. hour bucket from a timestamp).
    Returns the new rollup version number."""
    delta = source_table.read_changes(since_ts)
    if key_exprs:
        for name, expr in key_exprs.items():
            delta = delta.withColumn(name, expr)
    partial = partial_rollup(delta, keys, sums)
    # empty on first refresh — semi-join + merge are then no-ops
    stored_dirty = rollup_table.read().join(
        partial.select(*keys).distinct(), list(keys), "left_semi"
    )
    merged = merge_rollup(stored_dirty, partial, keys)
    return rollup_table.write(merged, version_ts=version_ts)


def refresh_rollup_cdc(
    rollup_table,
    source_table,
    since_ts: int,
    version_ts: int,
    keys: Sequence[str],
    sums: dict[str, Column],
    key_exprs: dict[str, Column] | None = None,
) -> int:
    """Delete/overwrite-aware maintenance cycle — lifts
    :func:`refresh_rollup`'s append-only restriction using classic
    pre/post-image delta maintenance:

        ΔAgg = Agg(post-image of changed coordinates)
             − Agg(pre-image  of changed coordinates)

    The change feed (``read_changes`` — partition-pruned to the new
    fragments) only identifies WHICH coordinates changed; both images are
    snapshot reads restricted to those coordinates by a broadcast
    semi-join, so upserts that overwrite count once, repeated upserts in
    one window count once, and deletes (absent from the post-image)
    subtract cleanly — tombstones never need to carry old values.

    Scale: cost is bounded by the changed-coordinate count (both image
    scans are semi-join-filtered and their aggregates shuffle only
    delta-group rows), never by table or rollup size.  Correct for
    algebraic aggregates, same as refresh_rollup.
    """
    dims = source_table.schema.dim_names
    changed = (
        source_table.read_changes(since_ts).select(*dims).distinct()
    )

    def image(df: DataFrame) -> DataFrame:
        img = df.join(F.broadcast(changed), dims, "left_semi")
        if key_exprs:
            for name, expr in key_exprs.items():
                img = img.withColumn(name, expr)
        return img

    post = partial_rollup(image(source_table.read()), keys, sums)
    pre = partial_rollup(image(source_table.read(at=since_ts)), keys, sums)
    measures = [c for c in post.columns if c not in keys]
    neg = pre.select(
        *keys, *[(-F.col(c)).cast("bigint").alias(c) for c in measures]
    )
    delta = post.unionByName(neg)
    stored_dirty = rollup_table.read().join(
        delta.select(*keys).distinct(), list(keys), "left_semi"
    )
    merged = merge_rollup(stored_dirty, delta, keys)
    # a group whose count reaches 0 must be DELETED from the rollup, not
    # merely left out of the new version — last-writer-wins would keep
    # serving the stale row from the prior version (caught at sf0.001,
    # where deletes empty whole hour groups).  Tombstone it.
    attr_types = {a.name: a.dtype for a in rollup_table.schema.attributes}
    alive = merged.filter(F.col("n") > 0).withColumn(
        "__tombstone", F.lit(False)
    )
    dead = merged.filter(F.col("n") <= 0).select(
        *keys,
        *[F.lit(None).cast(t).alias(c) for c, t in attr_types.items()],
        F.lit(True).alias("__tombstone"),
    )
    return rollup_table.write(
        alive.unionByName(dead), version_ts=version_ts
    )
