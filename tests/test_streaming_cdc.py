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


def test_streaming_maintained_continuous_aggregate(spark, tmp_path):
    """Composition flagship: a STREAM of MERGE batches keeps a rollup
    continuously fresh — foreachBatch applies each micro-batch with
    apply_changes, then refresh_rollup_cdc folds ONLY that batch's
    pre/post-image delta into the stored rollup.  After the stream
    drains, the rollup equals a from-scratch aggregate of the table."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.operators.rollup import refresh_rollup_cdc

    src_dir = str(tmp_path / "changes")
    os.makedirs(src_dir)
    tt = TileTable.create(
        spark,
        str(tmp_path / "ca_src"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("grp", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    roll = TileTable.create(
        spark,
        str(tmp_path / "ca_roll"),
        dimensions=[Dim("grp", "bigint")],
        attributes=[Attr("n", "bigint"), Attr("v", "bigint")],
        overwrite=True,
    )
    sums = {"v": F.col("v")}

    def change_file(name, rows):
        pdf = spark.createDataFrame(
            rows, "k int, grp bigint, v bigint, __op string"
        )
        stage = f"{src_dir}/_stage_{name}"
        pdf.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/*.parquet")[0]
        shutil.copyfile(part, f"{src_dir}/{name}.parquet")
        shutil.rmtree(stage)

    # three change files: inserts, overwrite+insert, delete+overwrite
    change_file(
        "b1",
        [(1, 0, 10, "upsert"), (2, 1, 20, "upsert"), (3, 0, 30, "upsert")],
    )
    change_file("b2", [(2, 1, 25, "upsert"), (4, 1, 40, "upsert")])
    change_file("b3", [(3, None, None, "delete"), (1, 1, 11, "upsert")])

    state = {"last_ts": 0}

    def apply_and_refresh(batch, _epoch):
        if not batch.count():
            return
        tt.apply_changes(batch)
        new_ts = max(ver["ts"] for ver in tt.schema.versions)
        refresh_rollup_cdc(
            roll, tt, state["last_ts"], new_ts, ["grp"], sums
        )
        state["last_ts"] = new_ts

    stream = spark.readStream.schema(
        "k int, grp bigint, v bigint, __op string"
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        stream.writeStream.option(
            "checkpointLocation", str(tmp_path / "ca_ckpt")
        )
        .foreachBatch(apply_and_refresh)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["grp"]: (r["n"], r["v"]) for r in roll.read().collect()}
    want = {
        r["grp"]: (r["n"], r["v"])
        for r in tt.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
        .collect()
    }
    assert got == want  # k1->grp1(11), k2->grp1(25), k4->grp1(40); grp0 gone
    assert got == {1: (3, 76)}
