"""Bucketed co-location eliminates the join shuffle entirely: the same
join that needs two Exchanges on plain parquet needs zero on same-bucketed
tables (result parity asserted too)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.operators.bucketing import (
    bucket_table,
    exchanges_in_plan,
    joined_bucketed,
)
from tiledb_mariadb_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    bucket_table(orders, "b_orders", ["o_orderkey"], 8)
    bucket_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = joined_bucketed(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        agg = j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        assert exchanges_in_plan(j) == 0

        plain = load_table(spark, SF_DIR, "orders").join(
            load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            on="o_orderkey",
        )
        assert exchanges_in_plan(plain) >= 2

        got = {r["o_orderpriority"]: r["n"] for r in agg.collect()}
        want = {
            r["o_orderpriority"]: r["n"]
            for r in plain.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
