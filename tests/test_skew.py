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


def test_aqe_splits_skewed_partition(spark):
    """With thresholds tuned to the test's data volume, AQE's skew-join
    split activates on the hot key (the first line of defense before
    explicit salting; session.py enables it for real workloads)."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        fact = _skewed(spark).withColumn("pad", F.lit("x" * 64))
        dim = spark.range(300).select(F.col("id").alias("k"), F.lit("d").alias("name"))
        j = fact.join(dim, "k")
        assert len(j.collect()) == 11_000
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
