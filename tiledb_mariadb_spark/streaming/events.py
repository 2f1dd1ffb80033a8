"""Structured Streaming operators over the events table.

The reference has NO streaming surface (SURVEY.md §2.6 — the plugin even
disables binlogging); this module is the driver-added scope: event-time
tumbling windows with watermarks, session windows, and a custom stateful
operator via applyInPandasWithState.

Local smoke pattern (per the public Spark docs): file source over the
events parquet + memory sink + processAllAvailable() drives the stream to
completion synchronously.  At scale the same code points readStream at a
Kafka/file-stream source; watermarks bound state, and the shuffle is the
same keyed exchange a batch groupBy would do.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA_TMPL = (
    "event_id bigint, ts {ts}, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.  ``ts`` has shipped both as
    parquet TIMESTAMP(NANOS) (read as raw long via nanosAsLong, floored to
    micros) and TIMESTAMP(MICROS, ntz); a one-off batch schema probe picks
    the matching stream schema so downstream always sees TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_kind = probe.schema["ts"].dataType.typeName()
    schema = EVENTS_SCHEMA_TMPL.format(
        ts="bigint" if ts_kind == "long" else ts_kind
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_kind == "long":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (rolling-ingest smoke:
    at scale this is the Kafka/object-store landing feed)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_to_completion(df: DataFrame, output_mode: str) -> DataFrame:
    """Start df as a memory-sink stream, drain all available input, stop,
    and return the materialized result table."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def sliding_counts(
    events: DataFrame, window: str = "6 hours", slide: str = "3 hours"
) -> DataFrame:
    """Sliding event-time windows: each event lands in window/slide
    overlapping windows (Spark expands map-side; the shuffle key is the
    window start, so state is bounded by the watermark exactly like
    tumbling windows)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n",
        )
    )


def windowed_counts(events: DataFrame, window: str = "6 hours") -> DataFrame:
    """Tumbling event-time window aggregation with a watermark."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n",
            (F.col("value_cents") / F.lit(100.0)).alias("total_value"),
        )
    )


def interval_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases within 1 hour AFTER a click by
    the same user.  Both sides carry watermarks and the join condition
    bounds event-time distance, so state for either side is evictable —
    the two requirements Structured Streaming imposes for stream-stream
    joins to run with bounded memory at scale."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros(F.col("c_ts")).alias("click_us"),
        F.unix_micros(F.col("p_ts")).alias("purchase_us"),
        "amount",
    )


def interval_join_outer(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join: like :func:`interval_join`, but a
    click with NO purchase inside its hour is still emitted (null
    purchase columns) — once the watermark proves no match can arrive.
    The outer side therefore emits on watermark progression, not match
    arrival: rows whose eviction horizon hasn't passed at shutdown stay
    unemitted (Structured Streaming contract, not a bug — asserted in
    tests/test_streaming_outer.py)."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros(F.col("c_ts")).alias("click_us"),
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Exactly-once event delivery: drop replayed event_ids.  The
    watermark bounds the dedup state (ids older than the watermark are
    forgotten — at 100 TB/day unbounded dedup state is the failure mode,
    so the watermark IS the design)."""
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])


def stream_into_tile_table(events: DataFrame, table) -> None:
    """foreachBatch sink into a TileTable: each micro-batch becomes one
    snapshot version (an independent fragment — TileDB's write model maps
     1:1 onto micro-batch commits; version log gives replay idempotence a
    place to hook)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            table.write(batch_df, version_ts=int(batch_id) + 1)

    q = (
        events.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", table.uri + "/_stream_checkpoint")
        .start()
    )
    q.awaitTermination()


def stream_tile_table(
    spark: SparkSession, table, with_op: bool = False
) -> DataFrame:
    """TileTable as a streaming SOURCE: each snapshot version directory is
    a set of files the file-stream source picks up as it appears, so a
    writer appending versions feeds a reader's micro-batches — CDC-lite
    over the catalog with no extra infrastructure.  Append-only semantics:
    rows stream as written (last-writer-wins collapses only in batch
    reads; streaming consumers see the raw change feed, which is what a
    downstream pipeline wants anyway).

    ``with_op=True`` appends ``_op`` ('delete' for apply_changes
    tombstones, else 'upsert') — the streaming twin of
    ``read_changes(with_op=True)``, so stream consumers can also
    distinguish deletes from upserts-to-NULL.  Pre-CDC fragments (no
    __tombstone column on disk) coalesce to 'upsert' via the declared
    read schema."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    cols = table.schema.dim_names + table.schema.attr_names
    ddl = table._spark_ddl(include=cols)  # noqa: SLF001
    if with_op:
        # declare the hidden column in the read schema; files lacking it
        # yield NULL, which coalesces to 'upsert'
        ddl += ", __tombstone boolean"
    df = (
        spark.readStream.schema(ddl)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(table.uri, "data", "__tile_v=*"))
    )
    if with_op:
        tomb = F.coalesce(F.col("__tombstone"), F.lit(False))
        df = df.withColumn(
            "_op", F.when(tomb, F.lit("delete")).otherwise(F.lit("upsert"))
        ).drop("__tombstone")
    return df


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, max value) via
    applyInPandasWithState — the arbitrary-state API the reference has no
    analog for."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, max_value double"
    state_schema = "n bigint, mx double"

    def update(key, pdf_iter, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
