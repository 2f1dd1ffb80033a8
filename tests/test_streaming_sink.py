"""Streaming sink into the tile-table catalog (micro-batch → snapshot
version) and watermark late-data semantics (a row behind the watermark is
dropped from an append-mode windowed aggregate)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
from tiledb_mariadb_spark.streaming.events import (
    read_events_stream,
    stream_into_tile_table,
)


def test_stream_into_tile_table(spark, tmp_path):
    tt = TileTable.create(
        spark,
        str(tmp_path / "events_sink"),
        dimensions=[Dim("event_id", "bigint")],
        attributes=[
            Attr("user_id", "bigint"),
            Attr("event_type", "string"),
            Attr("value", "double"),
        ],
    )
    events = read_events_stream(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", "value"
    )
    stream_into_tile_table(events, tt)
    assert len(tt.schema.versions) >= 1
    got = tt.read()
    assert got.count() == 1000
    # version log makes the streamed data time-travelable like any write
    assert tt.read(at=0).count() == 0


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(name: str, rows, mtime: float):
        pdf = spark.createDataFrame(rows, "ts timestamp, k string")
        pdf.coalesce(1).write.mode("overwrite").parquet(f"{src}/_stage_{name}")
        import glob
        import shutil

        part = glob.glob(f"{src}/_stage_{name}/*.parquet")[0]
        dst = f"{src}/{name}.parquet"
        shutil.copyfile(part, dst)
        shutil.rmtree(f"{src}/_stage_{name}")
        os.utime(dst, (mtime, mtime))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    now = time.time()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: three rows in [10:00,11:00) plus one at 12:30 → watermark
    # checkpoints at 12:30, closing and emitting the [10,11) window (n=3)
    write_file(
        "b1",
        [
            (t0, "a"),
            (t0 + dt.timedelta(minutes=10), "a"),
            (t0 + dt.timedelta(minutes=20), "a"),
            (dt.datetime(2024, 1, 1, 12, 30), "a"),
        ],
        now - 100,
    )
    drain()
    # run 2 (same checkpoint → watermark restored): a LATE row at 10:30,
    # behind the watermark and in an already-closed window → dropped
    write_file("b2", [(dt.datetime(2024, 1, 1, 10, 30), "a")], now - 50)
    drain()

    rows = spark.read.parquet(out).collect()
    got = {r["ws"]: r["n"] for r in rows}
    # exactly one closed window, with 3 — the late row did NOT count
    assert got == {t0: 3}, rows


def test_stream_tile_table_source(spark, tmp_path):
    """TileTable as streaming source: a second snapshot version written
    AFTER the first drain arrives in the next drain (change-feed over the
    catalog)."""
    tt = TileTable.create(
        spark,
        str(tmp_path / "cdc"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
    )
    tt.write(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), 100)

    from tiledb_mariadb_spark.streaming.events import stream_tile_table

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_tile_table(spark, tt)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 2
    tt.write(spark.createDataFrame([(3, "c")], "k int, v string"), 200)
    drain()
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_rocksdb_state_store_matches_default(spark):
    """The RocksDB state-store provider (the corpus-scale configuration)
    must produce identical windowed aggregates to the default provider."""
    from tiledb_mariadb_spark.session import tune_for_streaming
    from tiledb_mariadb_spark.streaming.events import (
        run_to_completion,
        windowed_counts,
    )

    events = read_events_stream(spark, SF_DIR)
    baseline = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["total_value"])
        for r in run_to_completion(windowed_counts(events), "complete").collect()
    }
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        tune_for_streaming(spark)
        got = {
            (r["win_start_us"], r["event_type"]): (r["n"], r["total_value"])
            for r in run_to_completion(
                windowed_counts(read_events_stream(spark, SF_DIR)), "complete"
            ).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    assert got == baseline and len(got) > 0
