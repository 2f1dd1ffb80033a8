"""Incremental rollup maintenance: delta-only refresh must converge to
the from-scratch aggregate, and each refresh must WRITE only the dirty
key groups (untouched groups keep serving from older rollup versions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
from tiledb_mariadb_spark.operators.rollup import refresh_rollup
from tiledb_mariadb_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
CUT = "2024-01-21 00:00:00"


def _build(spark, tmp_path):
    e = load_table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    src = TileTable.create(
        spark,
        os.path.join(str(tmp_path), "src"),
        dimensions=[Dim("event_id", "bigint")],
        attributes=[Attr("ts", "timestamp"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        os.path.join(str(tmp_path), "roll"),
        dimensions=[Dim("h", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("cents", "bigint")],
        array_type="SPARSE",
        overwrite=True,
    )
    return e, src, roll


def _refresh(roll, src, since, ts):
    return refresh_rollup(
        roll,
        src,
        since,
        ts,
        ["h"],
        {"cents": F.col("cents")},
        {"h": F.expr("CAST(ts AS LONG) div 3600")},
    )


def test_incremental_refresh_converges_and_writes_only_dirty(spark, tmp_path):
    e, src, roll = _build(spark, tmp_path)
    src.write(e.filter(F.col("ts") < CUT), version_ts=1000)
    _refresh(roll, src, 0, 1000)
    n_v1_groups = roll.read().count()

    src.write(e.filter(F.col("ts") >= CUT), version_ts=2000)
    _refresh(roll, src, 1000, 2000)

    # the second refresh wrote only the delta's hour groups
    v2_rows = roll.read_changes(1000).count()
    delta_hours = (
        e.filter(F.col("ts") >= CUT)
        .select(F.expr("CAST(ts AS LONG) div 3600"))
        .distinct()
        .count()
    )
    assert v2_rows == delta_hours
    assert roll.read().count() >= n_v1_groups

    # converges to the from-scratch aggregate
    expected = {
        (r["h"], r["n"], r["cents"])
        for r in e.groupBy(F.expr("CAST(ts AS LONG) div 3600").alias("h"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .collect()
    }
    got = {(r["h"], r["n"], r["cents"]) for r in roll.read().collect()}
    assert got == expected


def test_read_changes_empty_when_no_new_versions(spark, tmp_path):
    e, src, roll = _build(spark, tmp_path)
    src.write(e.limit(10), version_ts=1000)
    assert src.read_changes(1000).count() == 0
    assert src.read_changes(0).count() == 10


def test_cdc_rollup_handles_upserts_and_deletes(spark, tmp_path):
    """refresh_rollup_cdc converges to the from-scratch aggregate across
    overwrites, new inserts, repeated upserts to one coordinate, and
    deletes — the cases the append-only refresh double-counts or misses."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
    from tiledb_mariadb_spark.operators.rollup import refresh_rollup_cdc

    src = TileTable.create(
        spark,
        str(tmp_path / "cdc_src"),
        dimensions=[Dim("id", "bigint")],
        attributes=[Attr("grp", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        str(tmp_path / "cdc_roll"),
        dimensions=[Dim("grp", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    sums = {"v": F.col("v")}
    base = [(i, i % 3, 10 * i) for i in range(30)]
    # apply_changes assigns version_ts = version number, so keep the
    # base write on the same auto scale (v1 -> ts 1)
    src.write(spark.createDataFrame(base, "id bigint, grp bigint, v bigint"))
    refresh_rollup_cdc(roll, src, 0, 100, ["grp"], sums)

    # window 2: overwrite id=5 (same grp), move id=7 to another grp via
    # overwrite, double-upsert id=8, insert id=100, delete id=9
    changes = spark.createDataFrame(
        [
            (5, 2, 999, "upsert"),
            (7, 0, 70, "upsert"),
            (8, 2, 1, "upsert"),
            (100, 1, 5, "upsert"),
            (9, None, None, "delete"),
        ],
        "id bigint, grp bigint, v bigint, __op string",
    )
    src.apply_changes(changes)
    # a second change in the same... next window: re-upsert id=8 again
    src.apply_changes(
        spark.createDataFrame([(8, 2, 2, "upsert")],
                              "id bigint, grp bigint, v bigint, __op string")
    )
    refresh_rollup_cdc(roll, src, 1, 200, ["grp"], sums)

    got = {r["grp"]: (r["n"], r["v"]) for r in roll.read().collect()}
    want_rows = src.read().groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("v")
    ).collect()
    want = {r["grp"]: (r["n"], r["v"]) for r in want_rows}
    assert got == want
    # deletes really subtracted: id=9 (grp 0) gone from the rollup count
    assert got[0][0] == sum(1 for i in range(30) if i % 3 == 0) - 1 + 1  # -9 +7


def test_cdc_rollup_randomized_rounds(spark, tmp_path):
    """Model-based fuzz for the CDC-maintained rollup: several rounds of
    RANDOM mixed change batches (inserts, overwrites that may move a row
    across groups, deletes, re-inserts of deleted keys), refreshing after
    every round — the rollup must equal the from-scratch aggregate after
    each refresh, including groups that empty out and later repopulate."""
    import random

    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
    from tiledb_mariadb_spark.operators.rollup import refresh_rollup_cdc

    rng = random.Random(1234)
    src = TileTable.create(
        spark,
        str(tmp_path / "fz_src"),
        dimensions=[Dim("id", "bigint")],
        attributes=[Attr("grp", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        str(tmp_path / "fz_roll"),
        dimensions=[Dim("grp", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    sums = {"v": F.col("v")}
    model: dict[int, tuple[int, int]] = {}  # id -> (grp, v)

    def batch_rows():
        rows = []
        touched = set()
        for _ in range(rng.randint(3, 10)):
            k = rng.randint(0, 24)
            if k in touched:  # one change per coordinate per batch
                continue
            touched.add(k)
            if k in model and rng.random() < 0.3:
                rows.append((k, None, None, "delete"))
                del model[k]
            else:
                g, v = rng.randint(0, 4), rng.randint(1, 100)
                rows.append((k, g, v, "upsert"))
                model[k] = (g, v)
        return rows

    # seed state, then rounds of CDC batches
    seed = [(i, i % 5, 10 + i) for i in range(15)]
    model.update({i: (i % 5, 10 + i) for i in range(15)})
    src.write(spark.createDataFrame(seed, "id bigint, grp bigint, v bigint"))
    last_ts = max(ver["ts"] for ver in src.schema.versions)
    refresh_rollup_cdc(roll, src, 0, 1000, ["grp"], sums)

    for rnd in range(6):
        rows = batch_rows()
        if not rows:
            continue
        src.apply_changes(
            spark.createDataFrame(
                rows, "id bigint, grp bigint, v bigint, __op string"
            )
        )
        new_ts = max(ver["ts"] for ver in src.schema.versions)
        refresh_rollup_cdc(
            roll, src, last_ts, 2000 + rnd, ["grp"], sums
        )
        last_ts = new_ts
        got = {r["grp"]: (r["n"], r["v"]) for r in roll.read().collect()}
        want: dict[int, list[int]] = {}
        for g, v in model.values():
            want.setdefault(g, [0, 0])
            want[g][0] += 1
            want[g][1] += v
        assert got == {g: (n, v) for g, (n, v) in want.items()}, f"round {rnd}"
