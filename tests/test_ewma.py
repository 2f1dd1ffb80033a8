"""Grouped-recurrence EWMA via applyInPandas: matches the reference
recurrence exactly, per key, in event order."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.operators.ewma import ewma, ewma_py
from tiledb_mariadb_spark.sources.registry import load_table


def test_ewma_matches_reference_recurrence(spark):
    e = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
        )
    )
    got = ewma(e, "user_id", "ts_us", "value", alpha=0.3)
    rows = got.filter(F.col("user_id") == 3).orderBy("ts_us").collect()
    assert len(rows) > 10
    want = ewma_py([r["value"] for r in rows], alpha=0.3)
    for r, w in zip(rows, want):
        assert abs(r["ewma"] - w) < 1e-9
