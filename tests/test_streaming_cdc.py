"""Streaming CDC apply: a change-feed stream (upserts + deletes) drains
into a tile table through foreachBatch → apply_changes, surviving a
stream restart from the checkpoint without reapplying processed batches.
This composes the MERGE surface (tests/test_merge.py) with Structured
Streaming's exactly-once micro-batch contract."""

from __future__ import annotations

import glob
import os
import shutil

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable


def _write_change_file(spark, src: str, name: str, rows) -> None:
    pdf = spark.createDataFrame(rows, "k int, v string, __op string")
    stage = f"{src}/_stage_{name}"
    pdf.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/*.parquet")[0]
    shutil.copyfile(part, f"{src}/{name}.parquet")
    shutil.rmtree(stage)


def _drain(spark, src: str, ckpt: str, tt: TileTable) -> None:
    stream = spark.readStream.schema("k int, v string, __op string").parquet(
        src
    )
    q = (
        stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda batch, _epoch: batch.count() and tt.apply_changes(batch)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_cdc_stream_applies_and_survives_restart(spark, tmp_path):
    src = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    tt = TileTable.create(
        spark,
        str(tmp_path / "cdc_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        overwrite=True,
    )

    _write_change_file(
        spark,
        src,
        "b1",
        [(1, "a", "upsert"), (2, "b", "upsert"), (3, "c", "upsert")],
    )
    _drain(spark, src, ckpt, tt)
    n_versions_after_first = len(tt.schema.versions)
    assert {r["k"]: r["v"] for r in tt.read().collect()} == {
        1: "a",
        2: "b",
        3: "c",
    }

    # restart the stream with new files only — the checkpoint must skip b1
    _write_change_file(
        spark, src, "b2", [(2, "B", "upsert"), (3, None, "delete")]
    )
    _drain(spark, src, ckpt, tt)
    tt2 = TileTable(spark, str(tmp_path / "cdc_t"))
    assert {r["k"]: r["v"] for r in tt2.read().collect()} == {1: "a", 2: "B"}
    # b1 was not reapplied: exactly one more version landed
    assert len(tt2.schema.versions) == n_versions_after_first + 1


def test_stream_tile_table_with_op_flags_deletes(spark, tmp_path):
    """The streaming change feed's _op column (streaming twin of
    read_changes(with_op=True)): tombstone rows stream as 'delete',
    pre-CDC fragments (no __tombstone on disk) as 'upsert'."""
    from tiledb_mariadb_spark.streaming.events import stream_tile_table

    tt = TileTable.create(
        spark,
        str(tmp_path / "feed_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        overwrite=True,
    )
    tt.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    tt.apply_changes(
        spark.createDataFrame(
            [(2, None, "delete"), (3, "c", "upsert")], "k int, v string, __op string"
        )
    )
    feed = stream_tile_table(spark, tt, with_op=True)
    assert feed.isStreaming and "_op" in feed.columns
    out = str(tmp_path / "feed_out")
    q = (
        feed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "feed_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["_op"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, "upsert"), (2, "upsert"), (2, "delete"), (3, "upsert")}
