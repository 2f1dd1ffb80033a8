"""CDC-apply / MERGE surface: upsert + tombstone-delete batches over the
versioned tile table, resolved by the read path's last-writer-wins window.

The reference engine cannot DELETE (no handler::delete_row anywhere in
mytile/ha_mytile.cc) — this is a superset surface; semantics follow
TileDB's own delete-fragment model (time travel shows pre-delete state,
consolidation physically purges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable


@pytest.fixture()
def table(spark, tmp_path):
    t = TileTable.create(
        spark,
        str(tmp_path / "merge_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string"), Attr("n", "int")],
        overwrite=True,
    )
    t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "v", "n"]
        )
    )
    return t


def _state(t, at=None):
    return {
        r["k"]: (r["v"], r["n"]) for r in t.read(at=at).collect()
    }


def test_apply_changes_upsert_insert_delete(spark, table):
    changes = spark.createDataFrame(
        [
            (2, "B", 200, "upsert"),   # update
            (4, "d", 40, "upsert"),    # insert
            (3, None, None, "delete"),  # delete
        ],
        "k int, v string, n int, __op string",
    )
    table.apply_changes(changes)
    assert _state(table) == {1: ("a", 10), 2: ("B", 200), 4: ("d", 40)}


def test_time_travel_shows_predelete_state(spark, table):
    changes = spark.createDataFrame(
        [(1, None, None, "delete")], "k int, v string, n int, __op string"
    )
    table.apply_changes(changes)
    assert 1 not in _state(table)
    assert _state(table, at=1)[1] == ("a", 10)


def test_reinsert_after_delete(spark, table):
    table.apply_changes(
        spark.createDataFrame(
            [(2, None, None, "delete")], "k int, v string, n int, __op string"
        )
    )
    assert 2 not in _state(table)
    table.apply_changes(
        spark.createDataFrame(
            [(2, "bb", 22, "upsert")], "k int, v string, n int, __op string"
        )
    )
    assert _state(table)[2] == ("bb", 22)


def test_consolidate_purges_tombstones(spark, table):
    table.apply_changes(
        spark.createDataFrame(
            [(3, None, None, "delete")], "k int, v string, n int, __op string"
        )
    )
    table.consolidate()
    assert _state(table) == {1: ("a", 10), 2: ("b", 20)}
    # physically one version left, no tombstone rows inside
    assert len(table.schema.versions) == 1
    assert not any(v.get("tombstones") for v in table.schema.versions)


def test_apply_changes_rejects_bad_op_and_dup_tables(spark, tmp_path, table):
    with pytest.raises(ValueError, match="upsert"):
        table.apply_changes(
            spark.createDataFrame(
                [(1, "x", 1, "replace")], "k int, v string, n int, __op string"
            )
        )
    dup_t = TileTable.create(
        spark,
        str(tmp_path / "dups_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        allows_dups=True,
        overwrite=True,
    )
    with pytest.raises(ValueError, match="allows_dups"):
        dup_t.apply_changes(
            spark.createDataFrame([(1, "x", "upsert")], "k int, v string, __op string")
        )


def test_plain_tables_unaffected_by_tombstone_path(spark, table):
    # a table that never saw apply_changes must not pay the tombstone
    # filter or mergeSchema: single-version read stays window-free
    plan = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "__tombstone" not in plan


def test_erasure_physically_removes_data_after_consolidate(spark, tmp_path):
    """Right-to-erasure: tombstone delete hides the row immediately;
    consolidate() (vacuum) must remove the value from STORAGE — no
    fragment file may still contain the erased payload bytes."""
    import glob

    t = TileTable.create(
        spark,
        str(tmp_path / "gdpr_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        overwrite=True,
    )
    secret = "SENSITIVE-PAYLOAD-42"
    t.write(
        spark.createDataFrame([(1, secret), (2, "ordinary")], ["k", "v"])
    )
    t.apply_changes(
        spark.createDataFrame([(1, None, "delete")], "k int, v string, __op string")
    )
    # logically gone, physically still present (pre-vacuum)
    assert 1 not in {r["k"] for r in t.read().collect()}
    raw = b"".join(
        open(f, "rb").read()
        for f in glob.glob(f"{t.uri}/data/**/*.parquet", recursive=True)
    )
    assert secret.encode() in raw
    t.consolidate()
    raw_after = b"".join(
        open(f, "rb").read()
        for f in glob.glob(f"{t.uri}/data/**/*.parquet", recursive=True)
    )
    assert secret.encode() not in raw_after
    assert {r["k"] for r in t.read().collect()} == {2}


def test_apply_changes_after_add_column(spark, table):
    """Schema evolution composes with CDC: after ADD COLUMN, change
    batches carry the new attribute; rows written before the evolution
    read back with the fill default through read_evolved."""
    table.add_column("score", "int", fill=0)
    table.apply_changes(
        spark.createDataFrame(
            [(2, "B2", 22, 9, "upsert"), (3, None, None, None, "delete")],
            "k int, v string, n int, score int, __op string",
        )
    )
    got = {
        r["k"]: (r["v"], r["n"], r["score"])
        for r in table.read_evolved().collect()
    }
    assert got == {1: ("a", 10, 0), 2: ("B2", 22, 9)}


def test_apply_changes_rejects_encrypted_tables(spark, tmp_path):
    """Sealed fragments can't be overlaid with plaintext tombstones —
    the surface refuses loudly rather than corrupting."""
    t = TileTable.create(
        spark,
        str(tmp_path / "enc_cdc"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        encryption_key="0123456789abcdef0123456789abcdef",
        overwrite=True,
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        t.apply_changes(
            spark.createDataFrame(
                [(1, "x", "upsert")], "k int, v string, __op string"
            )
        )


def test_read_changes_with_op_distinguishes_deletes(spark, table):
    """The change feed must expose delete semantics: a tombstone row is
    '_op = delete', an upsert (even to NULL attributes) is 'upsert', and
    pre-CDC fragments coalesce to 'upsert' (round-2 advisor item)."""
    base_ts = max(v["ts"] for v in table.schema.versions)
    changes = spark.createDataFrame(
        [(2, None, None, "delete"), (4, "d", 40, "upsert")],
        ["k", "v", "n", "__op"],
    )
    table.apply_changes(changes)
    feed = table.read_changes(base_ts, with_version=True, with_op=True)
    ops = {r["k"]: r["_op"] for r in feed.collect()}
    assert ops == {2: "delete", 4: "upsert"}
    # the delete row's attributes are NULL *and* flagged — consumers no
    # longer have to guess which NULL rows are deletes
    dels = feed.filter(F.col("_op") == "delete").collect()
    assert len(dels) == 1 and dels[0]["v"] is None

    # pre-CDC fragments (no __tombstone column on disk) → 'upsert'
    full = table.read_changes(-1, with_op=True)
    assert full.filter(F.col("_op") == "delete").count() == 1
    assert full.filter(F.col("_op") == "upsert").count() == 4  # 3 base + 1

    # default shape is unchanged (no _op column)
    assert "_op" not in table.read_changes(-1).columns
