"""LEFT OUTER stream-stream join semantics: matched pairs equal the
batch join; unmatched clicks are emitted with null purchase ids once the
watermark passes their eviction horizon (clicks too close to the end of
the stream legitimately stay unemitted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.sources.registry import load_table
from tiledb_mariadb_spark.streaming.events import (
    interval_join_outer,
    read_events_stream,
)


def _drain(df):
    q = (
        df.writeStream.format("memory")
        .queryName("outer_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return df.sparkSession.sql("SELECT * FROM outer_join_out")


def test_left_outer_stream_join_emits_unmatched(spark):
    clicks = read_events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "purchase"
    )
    got = _drain(interval_join_outer(clicks, purchases)).collect()

    ev = load_table(spark, SF_DIR, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = (
        c.join(
            p,
            F.expr(
                "c_user = p_user AND p_ts >= c_ts"
                " AND p_ts <= c_ts + INTERVAL 1 HOUR"
            ),
            "left_outer",
        )
        .select("click_id", "purchase_id")
        .collect()
    )
    want_matched = {
        (r["click_id"], r["purchase_id"])
        for r in batch
        if r["purchase_id"] is not None
    }
    got_matched = {
        (r["click_id"], r["purchase_id"])
        for r in got
        if r["purchase_id"] is not None
    }
    # inner pairs emit eagerly: stream == batch exactly
    assert got_matched == want_matched

    # null-extended rows exist, and every one is a genuinely unmatched
    # click (subset of the batch unmatched set — the complement near the
    # stream tail is allowed to stay in state)
    want_unmatched = {
        r["click_id"] for r in batch if r["purchase_id"] is None
    }
    got_unmatched = {
        r["click_id"] for r in got if r["purchase_id"] is None
    }
    assert got_unmatched, "watermark never released any unmatched click"
    assert got_unmatched <= want_unmatched
    # the stream must release the bulk of them (events span ~30 days,
    # horizon is 2h — only tail clicks may be withheld)
    assert len(got_unmatched) >= len(want_unmatched) * 0.9
