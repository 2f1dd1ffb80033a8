"""Corpus-pipeline operators, fourth batch: eval-set decontamination and
the mergeable-sketch tier (HyperLogLog cardinality, count-min heavy
hitters, Bloom-filter semi-join pruning), plus ANALYZE-style column
statistics and near-dup cluster representative selection.

* q192 — **benchmark decontamination**: flag corpus documents sharing
  >= 2 distinct word-5-gram fingerprints with a (bounded) eval set — the
  standard train/test contamination sweep before LLM training.  The eval
  n-gram set is benchmark-sized (MBs), so the plan is a broadcast hash
  semi-join: one map pass over the 100 TB corpus, no corpus shuffle
  before the per-doc count.
* q193 — **HyperLogLog cardinality**: 64 md5-derived registers built by
  one groupBy, indicator sum as exact BIGINT, one final IEEE division —
  the sketch answer next to the exact COUNT(DISTINCT) it approximates
  (the exact one is the 3×-expand shuffle; the sketch shuffle is <= 64
  rows per partition).  ``functions/sketches.py``.
* q194 — **count-min heavy hitters**: d=3 × w=256 counter sketch in one
  pass, then point queries (min over rows) for the exact top-20 tokens —
  over-estimation visible by construction (cm_est >= true count).
* q195 — **Bloom semi-join pruning**: 65536-bit / k=3 filter built from
  the dim-side key set with one groupBy(word) bit_or, probe side checked
  with broadcast joins; reports false positives per segment against the
  exact semi-join.  The "ship the filter, not the rows" reduction Spark's
  runtime row-group pruning applies at scale.
* q196 — **column statistics (ANALYZE analog)**: one scan of lineitem ->
  per-column rows (nulls, exact NDV, min/max, avg string length) via a
  single multi-aggregate + stack unpivot.  The reference surfaces only a
  table-level record estimate (ha_mytile::info,
  mytile/ha_mytile.cc:1232-1260); this is the per-column optimizer-stats
  tier Spark's ANALYZE TABLE ... FOR COLUMNS computes.
* q197 — **dedup representative selection**: LSH edges -> connected
  components -> keep the highest-quality member per cluster (tie: lowest
  doc_id).  The decision step that turns near-dup *detection* into an
  actual dedup *action* (keep one, drop the rest).

Sketches/decontamination are driver-added training-data scope; q196/q197
extend reference surfaces cited inline.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import pipeline as P
from tiledb_mariadb_spark.functions import sketches as K
from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q192: eval-set (benchmark) decontamination ----------------------------
_DECON_K = 5
_DECON_MIN_HITS = 2


def q192_decontaminate(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_set = d.filter(F.col("doc_id") % 23 == 0)
    corpus = d.filter(F.col("doc_id") % 23 != 0)

    eval_grams = (
        D.with_shingles(eval_set, "doc_id", "text", k=_DECON_K)
        .select(D.hash60(F.col("shingle"), "decon").alias("g"))
        .distinct()
    )
    corpus_grams = D.with_shingles(corpus, "doc_id", "text", k=_DECON_K).select(
        "doc_id", D.hash60(F.col("shingle"), "decon").alias("g")
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
        .filter(F.col("n_hits") >= _DECON_MIN_HITS)
        .orderBy("doc_id")
    )


_EVAL_CTE = "SELECT doc_id, text FROM documents WHERE doc_id % 23 = 0"
_CORP_CTE = "SELECT doc_id, text FROM documents WHERE doc_id % 23 <> 0"
_G60 = D.hash60_sql("shingle", "decon")
Q192_SQL = f"""
WITH eg AS (SELECT DISTINCT {_G60} AS g
            FROM ({D.shingles_sql(f'({_EVAL_CTE})', 'doc_id', 'text', k=_DECON_K)})),
cg AS (SELECT doc_id, {_G60} AS g
       FROM ({D.shingles_sql(f'({_CORP_CTE})', 'doc_id', 'text', k=_DECON_K)}))
SELECT cg.doc_id, CAST(COUNT(DISTINCT cg.g) AS BIGINT) AS n_hits
FROM cg JOIN eg ON cg.g = eg.g
GROUP BY cg.doc_id
HAVING COUNT(DISTINCT cg.g) >= {_DECON_MIN_HITS}
ORDER BY cg.doc_id
"""


# --- q193: HyperLogLog distinct cardinality --------------------------------
def q193_hll_cardinality(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    bucket, rho = K.hll_register_cols(F.col("k"))
    registers = (
        li.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = K.hll_estimate(registers)
    exact = li.agg(F.count_distinct("k").alias("exact_distinct"))
    return exact.crossJoin(est).select(
        "exact_distinct",
        "hll_estimate",
        # relative error as a single IEEE division of two exactly-known
        # doubles — bit-stable cross-engine
        (
            (F.col("hll_estimate") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


_HB, _HR = K.hll_register_sql("k")
Q193_SQL = f"""
WITH keys AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
regs AS (SELECT {_HB} AS bucket, MAX({_HR}) AS rho FROM keys GROUP BY 1),
est AS ({K.hll_estimate_sql('SELECT bucket, rho FROM regs')}),
ex AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS exact_distinct FROM keys)
SELECT exact_distinct, hll_estimate,
       (hll_estimate - CAST(exact_distinct AS DOUBLE))
       / CAST(exact_distinct AS DOUBLE) AS rel_err
FROM ex, est
"""


# --- q194: count-min sketch heavy hitters ----------------------------------
_CM_TOPK = 20


def q194_cm_heavy_hitters(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    sketch = K.cm_sketch(tokens, "token")

    exact_top = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("token"))
        .limit(_CM_TOPK)
    )
    probed = exact_top
    ests = []
    for r in range(K.CM_DEPTH):
        sk = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
        )
        probed = probed.join(
            F.broadcast(sk), K.cm_bucket(F.col("token"), r) == F.col(f"b{r}")
        )
        ests.append(F.col(f"c{r}"))
    return probed.select(
        "token",
        "true_cnt",
        F.least(*ests).alias("cm_est"),
        (F.least(*ests) - F.col("true_cnt")).alias("overcount"),
    ).orderBy(F.col("true_cnt").desc(), F.col("token"))


_CM_TOKENS_CTE = (
    "SELECT UNNEST(str_split(TRIM(text), ' ')) AS token FROM documents"
)
_CM_MINS = ", ".join(
    f"(SELECT cnt FROM sk WHERE row = {r} AND bucket = {K.cm_bucket_sql('token', r)})"
    for r in range(K.CM_DEPTH)
)
Q194_SQL = f"""
WITH sk AS ({K.cm_sketch_sql(_CM_TOKENS_CTE, 'token')}),
top AS (SELECT token, COUNT(*) AS true_cnt FROM ({_CM_TOKENS_CTE}) t
        GROUP BY token ORDER BY true_cnt DESC, token LIMIT {_CM_TOPK})
SELECT token, true_cnt,
       LEAST({_CM_MINS}) AS cm_est,
       LEAST({_CM_MINS}) - true_cnt AS overcount
FROM top
ORDER BY true_cnt DESC, token
"""


# --- q195: Bloom-filter semi-join pruning ----------------------------------
def q195_bloom_prune(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    build = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").cast("string").alias("k"))
        .distinct()
    )
    words = K.bloom_build(build, "k")
    probes = c.select(
        "c_mktsegment", F.col("c_custkey").cast("string").alias("k")
    )
    probed = K.bloom_probe(probes, "k", words)
    member = build.select(F.col("k"), F.lit(1).alias("is_member"))
    return (
        probed.join(F.broadcast(member), "k", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0))).cast("long").alias("n_true"),
            F.sum(
                F.when(F.col("bloom_pass") == 1, 1 - F.coalesce(F.col("is_member"), F.lit(0)))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
        )
        .orderBy("c_mktsegment")
    )


_BUILD_CTE = (
    "SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders"
    " WHERE o_orderpriority = '1-URGENT'"
)
_PROBE_CTE = "SELECT c_mktsegment, CAST(c_custkey AS VARCHAR) AS k FROM customer"
Q195_SQL = f"""
WITH bp AS ({K.bloom_probe_sql(_PROBE_CTE, 'k', K.bloom_build_sql(_BUILD_CTE, 'k'))}),
m AS (SELECT k, 1 AS is_member FROM ({_BUILD_CTE}))
SELECT c_mktsegment,
       COUNT(*) AS n_probes,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(COALESCE(is_member, 0)) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN bloom_pass = 1 THEN 1 - COALESCE(is_member, 0)
                     ELSE 0 END) AS BIGINT) AS n_false_pos
FROM bp LEFT JOIN m ON bp.k = m.k
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- q196: ANALYZE-style column statistics ---------------------------------
_STAT_NUM = ("l_quantity", "l_extendedprice")
_STAT_STR = ("l_returnflag",)
_STAT_TS = ("l_shipdate",)


def q196_column_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    aggs, arms = [], []
    for col in _STAT_NUM + _STAT_STR + _STAT_TS:
        aggs += [
            F.count(F.when(F.col(col).isNull(), 1)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__ndv"),
        ]
        if col in _STAT_NUM:
            aggs += [
                F.min(col).alias(f"{col}__min_d"),
                F.max(col).alias(f"{col}__max_d"),
            ]
            arms.append(
                f"('{col}', {col}__nulls, {col}__ndv, {col}__min_d,"
                f" {col}__max_d, CAST(NULL AS STRING), CAST(NULL AS STRING),"
                f" CAST(NULL AS DOUBLE))"
            )
        else:
            s = (
                f"date_format({col}, 'yyyy-MM-dd')"
                if col in _STAT_TS
                else col
            )
            aggs += [
                F.expr(f"min({s})").alias(f"{col}__min_s"),
                F.expr(f"max({s})").alias(f"{col}__max_s"),
                F.expr(
                    f"CAST(sum(length(CAST({col} AS STRING))) AS DOUBLE)"
                    f" / CAST(count({col}) AS DOUBLE)"
                ).alias(f"{col}__avg_len"),
            ]
            arms.append(
                f"('{col}', {col}__nulls, {col}__ndv, CAST(NULL AS DOUBLE),"
                f" CAST(NULL AS DOUBLE), {col}__min_s, {col}__max_s,"
                f" {col}__avg_len)"
            )
    one = li.agg(*aggs)
    stack = (
        f"stack({len(arms)}, "
        + ", ".join(a[1:-1] for a in arms)
        + ") AS (col_name, n_nulls, ndv, min_d, max_d, min_s, max_s, avg_len)"
    )
    return one.select(F.expr(stack)).orderBy("col_name")


def _q196_arm(col: str) -> str:
    base = (
        f"SELECT '{col}' AS col_name,"
        f" CAST(COUNT(CASE WHEN {col} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,"
        f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,"
    )
    if col in _STAT_NUM:
        return base + (
            f" MIN({col}) AS min_d, MAX({col}) AS max_d,"
            f" CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s,"
            f" CAST(NULL AS DOUBLE) AS avg_len FROM lineitem"
        )
    s = f"strftime({col}, '%Y-%m-%d')" if col in _STAT_TS else col
    return base + (
        f" CAST(NULL AS DOUBLE) AS min_d, CAST(NULL AS DOUBLE) AS max_d,"
        f" MIN({s}) AS min_s, MAX({s}) AS max_s,"
        f" CAST(SUM(length(CAST({col} AS VARCHAR))) AS DOUBLE)"
        f" / CAST(COUNT({col}) AS DOUBLE) AS avg_len FROM lineitem"
    )


Q196_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_q196_arm(c) for c in _STAT_NUM + _STAT_STR + _STAT_TS)
    + ") ORDER BY col_name"
)


# --- q197: dedup representative selection ----------------------------------
def q197_dedup_keep_best(spark, sf_dir):
    from tiledb_mariadb_spark.suite.pipeline_ops import _corpus60  # noqa: PLC0415

    corpus = _corpus60(spark, sf_dir)
    sh = D.with_shingles(corpus, "doc_id", "text", k=3)
    sigs = D.minhash_signatures(sh, "doc_id", num_hashes=8)
    edges = D.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, rows_per_band=2)
    nodes = corpus.select(F.col("doc_id").alias("node"))
    labels = P.connected_components(edges, nodes)

    quality = corpus.select(
        F.col("doc_id").alias("node"),
        (F.length("text") + F.col("doc_id") % 7).cast("long").alias("quality"),
    )
    ranked = labels.join(quality, "node").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(
                F.col("quality").desc(), F.col("node")
            )
        ),
    )
    return (
        ranked.groupBy("cluster")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("node"))).alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.max("quality").alias("best_quality"),
        )
        .orderBy("cluster")
    )


def _q197_sql() -> str:
    from tiledb_mariadb_spark.suite.pipeline_ops import (  # noqa: PLC0415
        _CORPUS60_SQL,
        _EDGES_CTE,
    )

    cc = P.connected_components_sql(
        _EDGES_CTE, f"SELECT doc_id AS node FROM ({_CORPUS60_SQL})"
    )
    return f"""
WITH labels AS ({cc}),
quality AS (SELECT doc_id AS node,
                   CAST(length(text) + doc_id % 7 AS BIGINT) AS quality
            FROM ({_CORPUS60_SQL})),
ranked AS (SELECT labels.node, cluster, quality,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                                     ORDER BY quality DESC, labels.node) AS rn
           FROM labels JOIN quality ON labels.node = quality.node)
SELECT cluster, CAST(MIN(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS keep_id,
       COUNT(*) AS n_members, MAX(quality) AS best_quality
FROM ranked GROUP BY cluster ORDER BY cluster
"""


# --- q325: SoftDeDup — duplicate-aware sampling WEIGHTS (round 6) -------------
# Hard dedup throws near-duplicates away; soft dedup keeps them but
# DOWNWEIGHTS each cluster so its total sampling mass is one document's
# (the published soft-dedup recipe for LLM corpora: duplicates carry
# signal, but shouldn't be over-represented in the token budget).
# Pipeline: shingles → minhash → LSH clusters (the q197 machinery) →
# w = 1/|cluster| in exact parts-per-million (integer DIV, both engines
# identical) → per-cluster token mass before/after reweighting.
def q325_soft_dedup(spark, sf_dir):
    from tiledb_mariadb_spark.functions.text import token_count  # noqa: PLC0415
    from tiledb_mariadb_spark.suite.pipeline_ops import _corpus60  # noqa: PLC0415

    corpus = _corpus60(spark, sf_dir)
    sh = D.with_shingles(corpus, "doc_id", "text", k=3)
    sigs = D.minhash_signatures(sh, "doc_id", num_hashes=8)
    edges = D.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=8, rows_per_band=2
    )
    nodes = corpus.select(F.col("doc_id").alias("node"))
    labels = P.connected_components(edges, nodes)
    docs = labels.join(
        corpus.select(
            F.col("doc_id").alias("node"),
            token_count(F.col("text")).cast("long").alias("tokens"),
        ),
        "node",
    )
    sized = docs.withColumn(
        "n_members", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    ).withColumn(
        # exact integer ppm weight: 1e6 DIV |cluster| (identical on
        # both engines for positive operands)
        "w_ppm", F.expr("CAST(1000000 DIV n_members AS BIGINT)")
    )
    return (
        sized.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("tokens").alias("raw_tokens"),
            F.sum(F.col("tokens") * F.col("w_ppm")).alias(
                "weighted_tokens_ppm"
            ),
        )
        .orderBy("cluster")
    )


def _q325_sql() -> str:
    from tiledb_mariadb_spark.functions.text import token_count_sql  # noqa: PLC0415
    from tiledb_mariadb_spark.suite.pipeline_ops import (  # noqa: PLC0415
        _CORPUS60_SQL,
        _EDGES_CTE,
    )

    cc = P.connected_components_sql(
        _EDGES_CTE, f"SELECT doc_id AS node FROM ({_CORPUS60_SQL})"
    )
    tok = token_count_sql("text")
    return f"""
WITH labels AS ({cc}),
docs AS (SELECT labels.node, cluster,
                CAST({tok} AS BIGINT) AS tokens
         FROM labels JOIN ({_CORPUS60_SQL}) c ON labels.node = c.doc_id),
sized AS (SELECT *,
                 COUNT(*) OVER (PARTITION BY cluster) AS n_members
          FROM docs)
SELECT cluster, COUNT(*) AS n_members,
       CAST(SUM(tokens) AS BIGINT) AS raw_tokens,
       CAST(SUM(tokens * (1000000 // n_members)) AS BIGINT)
         AS weighted_tokens_ppm
FROM sized GROUP BY cluster ORDER BY cluster
"""


SPECS = [
    QuerySpec(
        "q192_decontaminate",
        q192_decontaminate,
        Q192_SQL,
        "eval-set n-gram decontamination via broadcast semi-join",
    ),
    QuerySpec(
        "q193_hll_cardinality",
        q193_hll_cardinality,
        Q193_SQL,
        "HyperLogLog cardinality sketch vs exact COUNT(DISTINCT)",
    ),
    QuerySpec(
        "q194_cm_heavy_hitters",
        q194_cm_heavy_hitters,
        Q194_SQL,
        "count-min sketch point estimates for exact top-20 tokens",
    ),
    QuerySpec(
        "q195_bloom_prune",
        q195_bloom_prune,
        Q195_SQL,
        "Bloom-filter semi-join pruning with false-positive audit",
    ),
    QuerySpec(
        "q196_column_stats",
        q196_column_stats,
        Q196_SQL,
        "ANALYZE-style per-column stats in one scan (stack unpivot)",
    ),
    QuerySpec(
        "q197_dedup_keep_best",
        q197_dedup_keep_best,
        _q197_sql(),
        "near-dup cluster representative selection (keep best quality)",
    ),
    QuerySpec(
        "q325_soft_dedup",
        q325_soft_dedup,
        _q325_sql(),
        "SoftDeDup: duplicate-aware sampling weights — LSH clusters "
        "downweighted to unit mass (exact ppm), token budget "
        "before/after reweighting",
    ),
]
