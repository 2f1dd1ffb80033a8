"""Unit tests for the fifth pipeline-ops batch: stable global ordinals,
skyline elimination, and BM25 score structure (cross-engine value parity
is covered by the driver-sim oracle; these pin the operator-level
invariants and plan shapes)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions.pipeline import stable_ordinal
from tiledb_mariadb_spark.functions.ranking import bm25_scores
from tiledb_mariadb_spark.operators.skyline import skyline


def test_stable_ordinal_contiguous_and_total_order(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(7)
    out = stable_ordinal(df, ["v", "id"], n_parts=8).collect()
    assert sorted(r["ordinal"] for r in out) == list(range(1, 501))
    by_ord = sorted(out, key=lambda r: r["ordinal"])
    assert [(r["v"], r["id"]) for r in by_ord] == sorted(
        (v, i) for i, v in rows
    )


def test_stable_ordinal_descending(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(40)], ["id", "v"])
    out = stable_ordinal(df, ["v", "id"], descending=(True, False), n_parts=4)
    first = out.filter(F.col("ordinal") == 1).collect()[0]
    assert first["v"] == 4 and first["id"] == 4


def test_stable_ordinal_avoids_single_partition_window(spark):
    """The plan must contain NO Window at all: ordinals are map-side
    arithmetic over the persisted range-sorted partitions, so the only
    data movement is the one range shuffle."""
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    plan = (
        stable_ordinal(df, ["v", "id"], n_parts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "InMemory" in plan  # reads the pinned partitioning


def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce_randomized(spark):
    rng = random.Random(7)
    for trial in range(3):
        pts = [
            (i, rng.randrange(0, 40), rng.randrange(0, 40)) for i in range(120)
        ]
        df = spark.createDataFrame(pts, ["id", "cost", "gain"]).repartition(5)
        got = sorted(
            (r["id"], r["cost"], r["gain"])
            for r in skyline(df, "cost", "gain").collect()
        )
        assert got == _brute_skyline(pts), f"trial {trial}"


def test_skyline_keeps_exact_duplicates(spark):
    pts = [(1, 10, 10), (2, 10, 10), (3, 5, 20)]
    df = spark.createDataFrame(pts, ["id", "cost", "gain"])
    got = sorted(r["id"] for r in skyline(df, "cost", "gain").collect())
    # (5,20) dominates both (10,10) rows strictly
    assert got == [3]
    dup_only = spark.createDataFrame(pts[:2], ["id", "cost", "gain"])
    got2 = sorted(r["id"] for r in skyline(dup_only, "cost", "gain").collect())
    assert got2 == [1, 2]


def test_bm25_saturates_and_length_normalizes(spark):
    docs = [
        (1, "spark " * 1 + "filler " * 9),
        (2, "spark " * 8 + "filler " * 2),   # more hits, same length
        (3, "spark " * 1),                   # same tf as 1, much shorter
    ]
    df = spark.createDataFrame([(i, s.strip()) for i, s in docs], ["id", "txt"])
    got = {r["id"]: r["bm25"] for r in bm25_scores(df, "id", "txt", ("spark",)).collect()}
    assert got[2] > got[1], "higher tf must score higher"
    assert got[3] > got[1], "shorter doc with equal tf must score higher"
    # saturation: 8x the tf must NOT give 8x the score
    assert got[2] < 4 * got[1]


def test_skyline_null_criteria_rows_survive(spark):
    """3VL parity with the NOT EXISTS oracle: rows with a NULL criterion
    can neither dominate nor be dominated — they must be kept, not
    silently dropped by the negated window filter (round-2 advisor
    item)."""
    rows = [
        (1, 1, 100),      # frontier
        (2, 2, 50),       # dominated by id=1
        (3, None, 999),   # NULL cost → kept
        (4, 5, None),     # NULL gain → kept
    ]
    df = spark.createDataFrame(rows, ["id", "cost", "gain"])
    got = sorted(r["id"] for r in skyline(df, "cost", "gain").collect())
    assert got == [1, 3, 4]
