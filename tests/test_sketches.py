"""Sketch-operator invariants (beyond the oracle hash-match): the
mathematical guarantees each sketch advertises must hold on real data.

- HLL: relative error within ~3x the theoretical 1.04/sqrt(m) bound.
- count-min: never undercounts (point estimate >= true frequency).
- Bloom: NO false negatives (every build key passes its own filter).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.functions import sketches as K
from tiledb_mariadb_spark.suite import t


def test_hll_error_within_bound(spark):
    li = t(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    bucket, rho = K.hll_register_cols(F.col("k"))
    registers = (
        li.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = K.hll_estimate(registers).collect()[0]["hll_estimate"]
    exact = li.distinct().count()
    # 1.04/sqrt(64) ~= 13% std error; allow 3 sigma
    assert abs(est - exact) / exact < 0.39, (est, exact)


def test_cm_never_undercounts(spark):
    d = t(spark, SF_DIR, "documents")
    tokens = d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"))
    sketch = K.cm_sketch(tokens, "token").collect()
    sk = {(r["row"], r["bucket"]): r["cnt"] for r in sketch}
    true = {
        r["token"]: r["cnt"]
        for r in tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    probe = (
        tokens.select("token")
        .distinct()
        .select(
            "token",
            *[K.cm_bucket(F.col("token"), r).alias(f"b{r}") for r in range(K.CM_DEPTH)],
        )
        .collect()
    )
    for row in probe:
        est = min(sk[(r, row[f"b{r}"])] for r in range(K.CM_DEPTH))
        assert est >= true[row["token"]], row["token"]


def test_bloom_no_false_negatives(spark):
    o = t(spark, SF_DIR, "orders")
    build = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").cast("string").alias("k"))
        .distinct()
    )
    words = K.bloom_build(build, "k")
    probed = K.bloom_probe(build, "k", words)
    n_build = build.count()
    n_pass = probed.filter(F.col("bloom_pass") == 1).count()
    assert n_pass == n_build, (n_pass, n_build)


def test_bloom_word_table_bounded(spark):
    o = t(spark, SF_DIR, "orders")
    build = o.select(F.col("o_custkey").cast("string").alias("k")).distinct()
    words = K.bloom_build(build, "k")
    assert words.count() <= K.BLOOM_BITS // 63 + 1
