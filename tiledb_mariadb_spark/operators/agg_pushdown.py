"""Storage-level scalar aggregates — the group_by_handler parity path.

The reference pushes filter-less SUM/COUNT/AVG/MIN/MAX into TileDB so
the storage engine answers them without materializing rows
(mytile_create_group_by_handler, ha_mytile.cc:607-715).  Spark's exact
analog: parquet aggregate pushdown on the V2 reader — MIN/MAX/COUNT are
answered from file footers (row-group statistics), no data pages read.
The plan shows ``PushedAggregation: [MIN(..), ..]`` under BatchScan.

Same constraint set as the reference: no filters, no grouping (the
reference also bails then, README.md:139-140) — but unlike it, falling
back is free: the normal partial+final aggregate runs instead.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def _v2_agg_configs(spark: SparkSession):
    saved = {
        "spark.sql.parquet.aggregatePushdown": spark.conf.get(
            "spark.sql.parquet.aggregatePushdown", "false"
        ),
        "spark.sql.sources.useV1SourceList": spark.conf.get(
            "spark.sql.sources.useV1SourceList", None
        ),
    }
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        yield
    finally:
        spark.conf.set(
            "spark.sql.parquet.aggregatePushdown",
            saved["spark.sql.parquet.aggregatePushdown"],
        )
        if saved["spark.sql.sources.useV1SourceList"] is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set(
                "spark.sql.sources.useV1SourceList",
                saved["spark.sql.sources.useV1SourceList"],
            )


def footer_aggregates(
    spark: SparkSession,
    path: str,
    mins: tuple[str, ...] = (),
    maxs: tuple[str, ...] = (),
    count: bool = True,
):
    """MIN/MAX/COUNT answered from parquet footers (V2 scan).  Executes
    inside the config scope (pushdown is an optimizer-time decision) and
    returns ``(row, plan)`` — the single result Row plus the formatted
    physical plan, which contains ``PushedAggregation: [...]`` when the
    footers answered the query."""
    from tiledb_mariadb_spark.plans.audit import formatted_plan  # noqa: PLC0415

    exprs = (
        [f"MIN({c}) AS min_{c}" for c in mins]
        + [f"MAX({c}) AS max_{c}" for c in maxs]
        + (["COUNT(*) AS n"] if count else [])
    )
    with _v2_agg_configs(spark):
        df = spark.read.parquet(path).selectExpr(*exprs)
        row = df.collect()[0]
        plan = formatted_plan(df)
    return row, plan
