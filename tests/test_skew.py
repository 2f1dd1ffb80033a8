"""Salted joins/aggs: exact result parity with unsalted equivalents, and
the salt actually spreads a hot key across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.skew import (
    SALT,
    salted_agg_count,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # 10k rows of one hot key + 1k spread across 100 cold keys
    hot = spark.range(10_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(1_000).select(
        (F.col("id") % 100 + 100).alias("k"), F.col("id").alias("payload")
    )
    return hot.unionAll(cold)


def test_salted_join_parity(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [(7, "hot"), (150, "cold"), (199, "cold2")], "k bigint, name string"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(fact, dim, ["k"], n_salts=8)
        want = fact.join(dim, on="k")
        assert got.count() == want.count() == 10_000 + 10 + 10
        assert (
            got.groupBy("k", "name").count().orderBy("k").collect()
            == want.groupBy("k", "name").count().orderBy("k").collect()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salt_spreads_hot_key(spark):
    fact = _skewed(spark)
    salts = (
        with_salt(fact, 8)
        .filter(F.col("k") == 7)
        .select(SALT)
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key occupies all salt buckets


def test_salted_agg_parity(spark):
    df = _skewed(spark)
    got = {r["k"]: r["n"] for r in salted_agg_count(df, "k", 8).collect()}
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
