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
Expressions are JVM higher-order functions; for the corpus-wide
signature computation there is also an Arrow-vectorized twin
(:func:`lsh_assign_arrow`) — HOF lambdas evaluate interpreted at ~1 ms
per 64-dim vector (8 planes × 64 elements of per-element closures),
which is the wrong cost model for billions of vectors, while one numpy
int64 matmul per Arrow batch is microseconds per row and bit-identical.
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


def scaled_vec_expr(vec_col: str) -> str:
    """Stage the scaled-int vector ONCE per row:
    ``transform(vec, x -> CAST(ROUND(x*SCALE) AS BIGINT))``.

    Spark cannot CSE across lambda functions (SPARK-36718), so every
    ``dot_int_expr``/``norm2_int_expr``/``lsh_bucket_expr`` use re-runs
    the per-element ROUND+CAST chain — per PAIR in a pair-verify shape.
    Pre-scaling each row once and folding with :func:`dot_scaled_expr`
    / :func:`lsh_bucket_scaled_expr` computes the SAME exact int64
    element products and sums (each element scales through the identical
    expression on the identical input), so every downstream value is
    bit-identical; only where the scaling happens changes."""
    return f"transform({vec_col}, x -> {_scaled_int_spark('x')})"


def dot_scaled_expr(sa: str, sb: str) -> str:
    """Exact int64 dot of two :func:`scaled_vec_expr` columns — the
    value equals ``dot_int_expr`` on the raw vectors (same per-element
    int64 products, same left-to-right exact-integer sum)."""
    return (
        f"aggregate(zip_with({sa}, {sb}, (x, y) -> x * y),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def cosine_scaled_expr(sa: str, sb: str, na: str, nb: str) -> str:
    """Cosine from pre-staged scaled vectors and pre-staged norms
    (``na``/``nb`` = ``SQRT(dot_scaled(s, s))`` doubles).  Bit-identical
    to :func:`cosine_expr` on the raw vectors: the dot is the same exact
    int64, each norm is SQRT of the same exact int64 (IEEE sqrt is
    correctly rounded), and the final ``dot / (na * nb)`` multiplies and
    divides the same doubles in the same order."""
    return f"({dot_scaled_expr(sa, sb)} / ({na} * {nb}))"


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


# --- int8 symmetric quantization ------------------------------------------
# The 4x-memory scale path for ANN: each vector maps to int8 components
# q_i = round(x_i * 127 / max|x|).  All downstream arithmetic is exact
# int64, so the quantized scores are engine-independent by construction.
# float→double is exact, max over doubles is exact, and the single
# divide+round per component follows the hardened _scaled_int recipe.
# greatest(maxabs, 1e-30) guards the all-zero vector (ANSI /0 raises in
# Spark 4).


def quantize_int8_expr(v: str) -> str:
    maxabs = (
        f"greatest(array_max(transform({v}, x -> abs(CAST(x AS DOUBLE)))),"
        f" CAST(1e-30 AS DOUBLE))"
    )
    return (
        f"transform({v}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0D"
        f" / {maxabs}) AS BIGINT))"
    )


def quantize_int8_sql(v: str) -> str:
    maxabs = (
        f"greatest(list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE)))),"
        f" CAST(1e-30 AS DOUBLE))"
    )
    return (
        f"list_transform({v}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0"
        f" / {maxabs}) AS BIGINT))"
    )


def qdot_expr(qa: str, qb: str) -> str:
    """Exact int64 dot of two already-quantized (BIGINT array) vectors."""
    return (
        f"aggregate(zip_with({qa}, {qb}, (x, y) -> x * y),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def qdot_sql(qa: str, qb: str) -> str:
    return (
        f"CAST(list_sum(list_transform({qa}, (x, i) -> x * {qb}[i])) AS BIGINT)"
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


def hyperplane_component(j: int, i: int) -> int:
    """Python twin of the md5 expressions above — same value for the same
    (plane, element index), so precomputed literal planes are bit-identical
    to the in-engine md5 path."""
    import hashlib  # noqa: PLC0415

    return int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000


def _plane_literal(j: int, dim: int) -> str:
    """Literal int array for plane ``j`` over a known vector length.
    Components depend only on (plane, index) — hashing them per ROW (the
    md5-in-engine variant below) costs rows × dim × planes md5 calls; a
    64-dim 8-plane bucketing over 2 k vectors is already ~1 M hashes, and
    the join in near-dup specs pays it twice.  Inlining the constants
    keeps the per-row work at just the dot products."""
    return ",".join(str(hyperplane_component(j, i)) for i in range(1, dim + 1))


def lsh_bucket_expr(vec_col: str, num_planes: int = 8, dim: int | None = None) -> str:
    """Spark SQL expr: bucket id from the sign pattern of ``num_planes``
    exact-integer hyperplane dots.  Pass ``dim`` when the vector length is
    known (it always is for a declared embedding column): planes become
    inline literals and no per-row hashing happens."""
    terms = []
    for j in range(num_planes):
        if dim is not None:
            dot = (
                f"aggregate(zip_with(array({_plane_literal(j, dim)}), {vec_col},"
                f" (p, x) -> p * {_scaled_int_spark('x')}),"
                f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            )
        else:
            dot = (
                f"aggregate(transform(sequence(1, size({vec_col})), i ->"
                f" {hyperplane_component_spark(j, 'i')} *"
                f" {_scaled_int_spark(f'element_at({vec_col}, i)')}),"
                f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_bucket_scaled_expr(
    sv_col: str, num_planes: int = 8, dim: int = 64
) -> str:
    """Bucket id from a pre-staged :func:`scaled_vec_expr` column —
    value-identical to :func:`lsh_bucket_expr` on the raw vector (each
    plane dot folds the same exact int64 products in the same order)."""
    terms = []
    for j in range(num_planes):
        dot = (
            f"aggregate(zip_with(array({_plane_literal(j, dim)}), {sv_col},"
            f" (p, s) -> p * s),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_bucket_sql(vec_col: str, num_planes: int = 8, dim: int | None = None) -> str:
    terms = []
    for j in range(num_planes):
        if dim is not None:
            dot = (
                f"CAST(list_sum(list_transform({vec_col}, (x, i) ->"
                f" ([{_plane_literal(j, dim)}])[i] *"
                f" {_scaled_int_sql('x')})) AS BIGINT)"
            )
        else:
            dot = (
                f"CAST(list_sum(list_transform({vec_col}, (x, i) ->"
                f" {hyperplane_component_sql(j, 'i')} *"
                f" {_scaled_int_sql('x')})) AS BIGINT)"
            )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_assign_arrow(
    df: DataFrame,
    vec_col: str,
    num_planes: int = 8,
    dim: int = 64,
    with_norm: bool = True,
) -> DataFrame:
    """Arrow-vectorized twin of :func:`lsh_bucket_expr` (+ squared norm):
    appends ``bucket`` (and ``n2``) BIGINT columns via one numpy int64
    matmul per Arrow batch.

    Bit-identical to the SQL-expr path by construction — the scaling is
    the same ROUND-HALF-UP on the same float64 products (no ties occur by
    the corpus's k-decimal design, and the half-up formula is implemented
    explicitly because numpy's ``round`` is half-even), the plane
    components come from the same md5 derivation
    (:func:`hyperplane_component`), and every product/sum is exact int64.
    ``tests/test_suite_oracle.py``'s q159 row cross-checks it against the
    DuckDB md5-expression oracle.

    This is the signature path to use corpus-wide: interpreted HOF
    lambdas cost ~1 ms per 64-dim vector, a vectorized batch matmul is
    ~µs-scale per row, and the op stays map-only (no shuffle) either way.
    """
    import numpy as np  # noqa: PLC0415

    planes = np.array(
        [
            [hyperplane_component(j, i) for i in range(1, dim + 1)]
            for j in range(num_planes)
        ],
        dtype=np.int64,
    )
    weights = 1 << np.arange(num_planes, dtype=np.int64)
    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes]
        + ["bucket bigint"]
        + (["n2 bigint"] if with_norm else [])
    )

    def assign(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * 1e4
            scaled = np.where(
                mat >= 0, np.floor(mat + 0.5), np.ceil(mat - 0.5)
            ).astype(np.int64)
            dots = scaled @ planes.T
            out = pdf.copy()
            out["bucket"] = ((dots > 0) * weights).sum(axis=1)
            if with_norm:
                out["n2"] = (scaled * scaled).sum(axis=1)
            yield out

    return df.mapInPandas(assign, schema=out_schema)


def cosine_pairs_arrow(pairs: DataFrame, va_col: str, vb_col: str) -> DataFrame:
    """Arrow-vectorized exact cosine over pair rows: appends ``cos`` from
    one batched scaled-int dot + the single IEEE division, replacing the
    per-pair interpreted zip_with/aggregate lambdas.  Same arithmetic as
    :func:`cosine_expr` (scaling identical to :func:`lsh_assign_arrow`),
    so results are bit-identical to the SQL-expr and DuckDB-oracle paths.
    Map-only — partitioning of the candidate pairs is preserved."""
    import numpy as np  # noqa: PLC0415

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in pairs.dtypes] + ["cos double"]
    )

    def _scaled(col) -> "np.ndarray":
        mat = np.stack(col.to_numpy()).astype(np.float64) * 1e4
        return np.where(mat >= 0, np.floor(mat + 0.5), np.ceil(mat - 0.5)).astype(
            np.int64
        )

    def score(batches):
        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                out["cos"] = np.zeros(0, dtype=np.float64)
                yield out
                continue
            sa, sb = _scaled(pdf[va_col]), _scaled(pdf[vb_col])
            dot = (sa * sb).sum(axis=1)
            na = np.sqrt((sa * sa).sum(axis=1))
            nb = np.sqrt((sb * sb).sum(axis=1))
            out["cos"] = dot / (na * nb)
            yield out

    return pairs.mapInPandas(score, schema=out_schema)


# --- SemDeDup: cluster-confined semantic dedup ------------------------------
# Abbas et al. 2023 (public): assign vectors to centroids, prune
# near-duplicate pairs only WITHIN a cluster — the quadratic compare is
# bounded by the largest cluster, never the corpus.  Deterministic
# engine-exact variant: centroids are elementwise scaled-int SUMS of
# caller-provided seed groups (cosine is scale-invariant, so the sum
# stands in for the mean exactly); every comparison is an exact int64
# dot + IEEE sqrt/divide.  Conformance: q290 (suite/pipeline_ops2.py).


def quantized_with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    """Stage the scaled-int vector AND its norm once per row (CSE does
    not cross lambda boundaries): adds ``qv`` (array<bigint>) and
    ``nrm`` (double) columns."""
    return df.withColumn(
        "qv",
        F.expr(
            f"transform({vec_col}, x ->"
            " CAST(ROUND(CAST(x AS DOUBLE) * 10000.0D) AS BIGINT))"
        ),
    ).withColumn("nrm", F.expr(f"SQRT({qdot_expr('qv', 'qv')})"))


def seeded_centroids(
    seeds: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Deterministic centroids: elementwise scaled-int sum per seed
    group ``id % k`` -> (j, cv array<bigint>, cnrm double), k rows."""
    return (
        seeds.select(
            (F.col(id_col) % k).alias("j"),
            F.posexplode(F.col(vec_col)).alias("dim", "x"),
        )
        .select("j", "dim", F.expr(_scaled_int_spark("x")).alias("xs"))
        .groupBy("j", "dim")
        .agg(F.sum("xs").alias("cx"))
        .groupBy("j")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(dim, cx))),"
                " s -> s.cx)"
            ).alias("cv")
        )
        .withColumn("cnrm", F.expr(f"SQRT({qdot_expr('cv', 'cv')})"))
    )


def semdedup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Cluster-confined near-dup pairs: ``corpus`` must carry qv/nrm
    (quantized_with_norm), ``centroids`` j/cv/cnrm (seeded_centroids or
    any deterministic source).  Returns (kept, dropped, cluster, cos) —
    kept = the lower id of each pair above ``threshold``.  Scale shape:
    centroid side broadcasts, assignment is map-side + one bounded
    window, pair generation is an equi-join on cluster."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        "qv",
        "nrm",
        "j",
        F.expr(f"({qdot_expr('qv', 'cv')} / (nrm * cnrm))").alias("cosc"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosc").desc(), F.col("j").asc()
    )
    # assigned feeds BOTH sides of the pair self-join below; persist so
    # the corpus scan + 32-centroid scoring + assignment window run
    # once, not once per join side (the q200/q269 shared-frame lesson)
    from pyspark import StorageLevel  # noqa: PLC0415

    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col(id_col), "qv", "nrm", F.col("j").alias("cluster"))
    )
    from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

    assigned = _P.track(assigned.persist(StorageLevel.MEMORY_AND_DISK))
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("kept"),
            F.col(f"b.{id_col}").alias("dropped"),
            F.col("a.cluster").cast("long").alias("cluster"),
            F.expr(
                f"({qdot_expr('a.qv', 'b.qv')} / (a.nrm * b.nrm))"
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
