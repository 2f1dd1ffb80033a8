"""The Arrow-vectorized LSH signature/cosine paths must be bit-identical
to the JVM SQL-expr paths (which the DuckDB oracle mirrors): same md5
planes, same ROUND-HALF-UP scaling, exact int64 products."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import similarity as S
from tiledb_mariadb_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_arrow_bucket_and_norm_match_expr(spark):
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    arrow = S.lsh_assign_arrow(e, "embedding", num_planes=8, dim=64)
    expr = e.select(
        "vec_id",
        F.expr(S.lsh_bucket_expr("embedding", 8, dim=64)).alias("bucket_e"),
        F.expr(S.norm2_int_expr("embedding")).alias("n2_e"),
    )
    diff = (
        arrow.join(expr, "vec_id")
        .filter("bucket != bucket_e OR n2 != n2_e")
        .count()
    )
    assert diff == 0


def test_literal_planes_match_md5_planes(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    diff = e.filter(
        F.expr(S.lsh_bucket_expr("embedding", 8, dim=64))
        != F.expr(S.lsh_bucket_expr("embedding", 8))
    ).count()
    assert diff == 0


def test_arrow_pair_cosine_matches_expr(spark):
    e = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 40)
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    arrow = S.cosine_pairs_arrow(pairs, "va", "vb").select("a", "b", "cos")
    expr = pairs.select(
        "a", "b", F.expr(S.cosine_expr("va", "vb")).alias("cos_e")
    )
    # exact equality — both are one IEEE division of identical int operands
    diff = arrow.join(expr, ["a", "b"]).filter("cos != cos_e").count()
    assert diff == 0


def test_scaled_staging_matches_raw_exprs(spark):
    """The r9 staged-scaled-vector helpers (scaled_vec_expr +
    dot_scaled_expr / cosine_scaled_expr / lsh_bucket_scaled_expr) must
    be bit-identical to the raw-vector expressions they replace in
    q159's pair verify (SPARK-36718 staging changes WHERE scaling runs,
    never the values)."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    staged = e.select(
        "vec_id",
        "embedding",
        F.expr(S.scaled_vec_expr("embedding")).alias("sv"),
    ).select(
        "vec_id",
        "embedding",
        "sv",
        F.expr(S.lsh_bucket_scaled_expr("sv", 8, dim=64)).alias("bucket_s"),
        F.expr(f"SQRT({S.dot_scaled_expr('sv', 'sv')})").alias("nrm_s"),
    )
    both = staged.select(
        "vec_id",
        "embedding",
        "bucket_s",
        "nrm_s",
        "sv",
        F.expr(S.lsh_bucket_expr("embedding", 8, dim=64)).alias("bucket_r"),
        F.expr(f"SQRT({S.norm2_int_expr('embedding')})").alias("nrm_r"),
        F.expr(S.cosine_expr("embedding", "embedding")).alias("cos_r"),
    ).withColumn(
        "cos_s",
        F.expr(S.cosine_scaled_expr("sv", "sv", "nrm_s", "nrm_s")),
    )
    diff = both.filter(
        "bucket_s != bucket_r OR nrm_s != nrm_r OR cos_s != cos_r"
    ).count()
    assert diff == 0
    # cross-pair dots too: adjacent-id pairs, staged vs raw
    a = both.alias("a")
    b = both.alias("b")
    pairs = a.join(b, F.col("a.vec_id") + 1 == F.col("b.vec_id")).select(
        F.expr(S.dot_scaled_expr("a.sv", "b.sv")).alias("dot_s"),
        F.expr(S.dot_int_expr("a.embedding", "b.embedding")).alias("dot_r"),
        F.expr(
            S.cosine_scaled_expr("a.sv", "b.sv", "a.nrm_s", "b.nrm_s")
        ).alias("cos_s"),
        F.expr(S.cosine_expr("a.embedding", "b.embedding")).alias("cos_r"),
    )
    assert pairs.filter("dot_s != dot_r OR cos_s != cos_r").count() == 0
