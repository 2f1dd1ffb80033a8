"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k (the baseline) and random-hyperplane LSH
bucketing (the scale path — restrict candidate generation to buckets).

Determinism: components are scaled to integers (round(x * 1e4)) so dot
products and norms are *exact* int64 arithmetic, order-independent across
engines; the one float division producing the cosine is a deterministic
IEEE op on identical operands.  Hyperplane components are md5-derived so
the DuckDB oracle reproduces them exactly.

Scale notes: brute-force is a broadcast of the query vector + a single
scan (no shuffle); IVF/LSH bucketing turns ANN into a bucket-equi-join.
All expressions are JVM higher-order functions — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = "10000.0"

# Scaling MUST promote float32 elements to DOUBLE before the multiply on
# BOTH engines: Spark float*decimal-literal → double but DuckDB → float,
# and a product landing on a .5 tie then rounds to different ints
# (observed on q152's element sums).  float→double is exact and the
# double multiply is one IEEE op, so the explicit casts make the rounded
# products identical by construction.


def _scaled_int_spark(x: str) -> str:
    return f"CAST(ROUND(CAST({x} AS DOUBLE) * {SCALE}D) AS BIGINT)"


def _scaled_int_sql(x: str) -> str:
    return f"CAST(ROUND(CAST({x} AS DOUBLE) * {SCALE}) AS BIGINT)"


def dot_int_expr(a: str, b: str) -> str:
    """Exact int64 dot product of two scaled vectors (SQL expr string)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        f" {_scaled_int_spark('x')} * {_scaled_int_spark('y')}),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def norm2_int_expr(a: str) -> str:
    return dot_int_expr(a, a)


def cosine_expr(a: str, b: str) -> str:
    """Deterministic cosine: exact int dot / (sqrt · sqrt)."""
    return (
        f"({dot_int_expr(a, b)} / (SQRT({norm2_int_expr(a)}) * SQRT({norm2_int_expr(b)})))"
    )


def cosine_topk(
    vectors: DataFrame, query: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Brute-force top-k by cosine against a single-row query DataFrame
    with column ``qv``.  Query side is broadcast; no shuffle on the scan."""
    joined = vectors.crossJoin(F.broadcast(query))
    return (
        joined.select(
            F.col(id_col),
            F.expr(cosine_expr(vec_col, "qv")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_batch(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int,
) -> DataFrame:
    """Many-query brute-force top-k: broadcast the query set (small side),
    score corpus × queries map-side, then TWO-PHASE top-k — partial top-k
    per (query, input partition) first, so the final per-query window sees
    only ``queries × partitions × k`` narrow rows instead of the whole
    scored corpus.  A single-phase ``Window.partitionBy(qid)`` would
    funnel the entire corpus through #queries partitions (severe skew at
    Q ≪ corpus); here the wide shuffle is spread over (qid, pid) keys and
    only (qid, id, cos) triples move — the vectors never shuffle."""
    from pyspark.sql import Window  # noqa: PLC0415

    scored = (
        vectors.crossJoin(F.broadcast(queries))
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.expr(cosine_expr(vec_col, qvec_col)).alias("cos"),
        )
        .withColumn("__pid", F.spark_partition_id())
    )
    order = [F.col("cos").desc(), F.col(id_col).asc()]
    partial = Window.partitionBy(qid_col, "__pid").orderBy(*order)
    survivors = (
        scored.withColumn("__rk", F.row_number().over(partial))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__pid")
    )
    final = Window.partitionBy(qid_col).orderBy(*order)
    return (
        survivors.withColumn("__rk", F.row_number().over(final))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# --- DuckDB oracle twins ---------------------------------------------------


def dot_int_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform({a}, (x, i) ->"
        f" {_scaled_int_sql('x')} * {_scaled_int_sql(f'{b}[i]')}))"
        f" AS BIGINT)"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_int_sql(a, b)} / (SQRT({dot_int_sql(a, a)}) * SQRT({dot_int_sql(b, b)})))"
    )


# --- random-hyperplane LSH -------------------------------------------------


def hyperplane_component_sql(j: int, i_expr: str) -> str:
    """Deterministic pseudo-random int in [-1000, 1000]: md5-derived."""
    return (
        f"((CAST(('0x' || substr(md5('{j}_' || CAST({i_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % 2001) - 1000)"
    )


def hyperplane_component_spark(j: int, i_expr: str) -> str:
    return (
        f"((CAST(conv(substr(md5(CAST(concat('{j}_', CAST({i_expr} AS STRING)) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
        f" % 2001) - 1000)"
    )


def lsh_bucket_expr(vec_col: str, num_planes: int = 8) -> str:
    """Spark SQL expr: bucket id from the sign pattern of ``num_planes``
    exact-integer hyperplane dots."""
    terms = []
    for j in range(num_planes):
        dot = (
            f"aggregate(transform(sequence(1, size({vec_col})), i ->"
            f" {hyperplane_component_spark(j, 'i')} *"
            f" {_scaled_int_spark(f'element_at({vec_col}, i)')}),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_bucket_sql(vec_col: str, num_planes: int = 8) -> str:
    terms = []
    for j in range(num_planes):
        dot = (
            f"CAST(list_sum(list_transform({vec_col}, (x, i) ->"
            f" {hyperplane_component_sql(j, 'i')} *"
            f" {_scaled_int_sql('x')})) AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
