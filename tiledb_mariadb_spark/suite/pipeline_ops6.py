"""Corpus-pipeline operators, sixth batch: market-basket co-occurrence,
chi-squared distribution-drift monitoring, and vocabulary encoding.

* q228 — **co-purchase pair counts**: parts bought together in the same
  order, with deterministic top-pairs output.  The scale shape mirrors
  q159's in-bucket pair generation: items gather per order (one shuffle,
  group size = order line count, bounded by the schema), the quadratic
  pair expansion happens INSIDE each bounded group via array lambdas,
  and only (a, b) pair rows hit the counting shuffle — never an
  unbounded self-join of the fact table against itself.
* q229 — **chi-squared drift monitor**: does the language mix of the
  second half of the corpus differ from the first?  Per-language χ²
  contribution from the 2-way contingency table.  All counts exact
  int64; each contribution is a FIXED chain of IEEE ops per row (no
  float SUM across engines), so both engines agree bitwise.
* q230 — **vocabulary encoding**: map each document's words to integer
  vocab ids (top-N corpus words by frequency, deterministic tiebreak),
  OOV→0, preserving word order — the tokenizer-to-ids step before
  training.  Vocab is corpus-derived (one aggregate), broadcast back;
  the document pass is map-side except the per-doc reassembly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q228: co-purchase pair counts -----------------------------------------
_COP_MIN = 2


def q228_copurchase(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) ->"
                " transform(slice(items, i + 2, size(items)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= _COP_MIN)
        .orderBy(F.col("n_orders").desc(), "a", "b")
    )


Q228_SQL = f"""
SELECT x.l_partkey AS a, y.l_partkey AS b,
       CAST(COUNT(DISTINCT x.l_orderkey) AS BIGINT) AS n_orders
FROM lineitem x JOIN lineitem y
  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= {_COP_MIN}
ORDER BY n_orders DESC, a, b
"""


# --- q229: chi-squared language-mix drift ----------------------------------


def q229_chi2_drift(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    half = F.broadcast(d.agg(F.expr("max(doc_id) DIV 2").alias("mid")))
    counts = (
        d.crossJoin(half)
        .groupBy("lang")
        .agg(
            F.sum((F.col("doc_id") <= F.col("mid")).cast("long")).alias("o1"),
            F.sum((F.col("doc_id") > F.col("mid")).cast("long")).alias("o2"),
        )
    )
    # expected e1 = rowtot*t1/n; contribution = (o-e)^2/e per cell, with
    # everything derived from exact int64 (o*n - rowtot*tcol stays well
    # inside int64 at oracle scale) and a FIXED two-term sum per lang.
    # Totals come from an unpartitioned window over the aggregated
    # |langs|-row matrix — a totals crossJoin would re-plan the whole
    # groupBy pipeline as a second subtree (was 12 exchanges).
    return (
        counts.withColumn("t1", F.expr("SUM(o1) OVER ()"))
        .withColumn("t2", F.expr("SUM(o2) OVER ()"))
        .withColumn("n", F.expr("t1 + t2"))
        .withColumn("rt", F.col("o1") + F.col("o2"))
        .withColumn("num1", F.expr("o1 * n - rt * t1"))
        .withColumn("num2", F.expr("o2 * n - rt * t2"))
        .select(
            "lang",
            F.col("o1").cast("long").alias("first_half"),
            F.col("o2").cast("long").alias("second_half"),
            F.expr(
                "(CAST(num1 AS DOUBLE) * CAST(num1 AS DOUBLE))"
                " / (CAST(rt AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(n AS DOUBLE))"
                " + (CAST(num2 AS DOUBLE) * CAST(num2 AS DOUBLE))"
                " / (CAST(rt AS DOUBLE) * CAST(t2 AS DOUBLE) * CAST(n AS DOUBLE))"
            ).alias("chi2"),
        )
        .orderBy("lang")
    )


Q229_SQL = """
WITH half AS (SELECT CAST(MAX(doc_id) // 2 AS BIGINT) AS mid FROM documents),
counts AS (
  SELECT lang,
         CAST(SUM(CASE WHEN doc_id <= mid THEN 1 ELSE 0 END) AS BIGINT) AS o1,
         CAST(SUM(CASE WHEN doc_id > mid THEN 1 ELSE 0 END) AS BIGINT) AS o2
  FROM documents, half GROUP BY lang),
tot AS (SELECT CAST(SUM(o1) AS BIGINT) AS t1, CAST(SUM(o2) AS BIGINT) AS t2,
               CAST(SUM(o1) + SUM(o2) AS BIGINT) AS n FROM counts),
cells AS (
  SELECT lang, o1, o2, o1 + o2 AS rt,
         o1 * n - (o1 + o2) * t1 AS num1,
         o2 * n - (o1 + o2) * t2 AS num2,
         t1, t2, n
  FROM counts, tot)
SELECT lang, o1 AS first_half, o2 AS second_half,
       (CAST(num1 AS DOUBLE) * CAST(num1 AS DOUBLE))
         / (CAST(rt AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(n AS DOUBLE))
       + (CAST(num2 AS DOUBLE) * CAST(num2 AS DOUBLE))
         / (CAST(rt AS DOUBLE) * CAST(t2 AS DOUBLE) * CAST(n AS DOUBLE))
         AS chi2
FROM cells ORDER BY lang
"""


# --- q230: vocabulary encoding ---------------------------------------------
_VOCAB_N = 30
_VOCAB_DOCS = 80


def q230_vocab_encode(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).filter(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(_VOCAB_N)
    )
    w = Window.orderBy(F.col("freq").desc(), "word")
    vocab_ids = vocab.withColumn("vid", F.row_number().over(w)).select(
        "word", "vid"
    )
    encoded = (
        words.filter(F.col("doc_id") < _VOCAB_DOCS)
        .join(F.broadcast(vocab_ids), "word", "left")
        .withColumn("vid", F.coalesce("vid", F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "vid"))
                    ),
                    lambda s: s["vid"].cast("string"),
                ),
                ",",
            ).alias("ids"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum((F.col("vid") == 0).cast("long")).alias("n_oov"),
        )
        .orderBy("doc_id")
    )
    return encoded


Q230_SQL = f"""
WITH words AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(1, len(w) + 1)) AS u(i)
  WHERE w[i] <> ''),
vocab AS (
  SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS vid
  FROM words GROUP BY word
  ORDER BY COUNT(*) DESC, word LIMIT {_VOCAB_N}),
enc AS (
  SELECT doc_id, pos, COALESCE(vid, 0) AS vid
  FROM words LEFT JOIN vocab USING (word)
  WHERE doc_id < {_VOCAB_DOCS})
SELECT doc_id,
       string_agg(CAST(vid AS VARCHAR), ',' ORDER BY pos) AS ids,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN vid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


# --- q231: binary payload chunking -----------------------------------------
# Multimodal-column plumbing fully JVM-side: the document body as an
# opaque BINARY payload, sliced into fixed-size chunks with ordinals and
# per-chunk md5 — the blob-partitioning step before feature extraction
# (no decode, no Python).  The oracle chunks the VARCHAR twin: documents
# are ASCII, so byte slices and char slices coincide and md5(BLOB) ==
# md5(VARCHAR) over identical bytes (DuckDB has no blob substring).
_CHUNK = 64
_CHUNK_DOCS = 100


def q231_binary_chunks(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CHUNK_DOCS)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return (
        d.select(
            "doc_id",
            "payload",
            F.explode(
                F.expr(f"sequence(0, (octet_length(payload) - 1) DIV {_CHUNK})")
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"substring(payload, chunk_idx * {_CHUNK} + 1, {_CHUNK})")
            .alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr("octet_length(chunk)").cast("long").alias("chunk_bytes"),
            F.md5("chunk").alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


Q231_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_CHUNK_DOCS}),
ex AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         substring(text, CAST(i * {_CHUNK} + 1 AS INT), {_CHUNK}) AS chunk
  FROM d, UNNEST(range(0, (length(text) - 1) // {_CHUNK} + 1)) AS u(i))
SELECT doc_id, chunk_idx,
       CAST(length(chunk) AS BIGINT) AS chunk_bytes,
       md5(chunk) AS chunk_md5
FROM ex ORDER BY doc_id, chunk_idx
"""


# --- q232: vector L2 normalization -----------------------------------------
# Per-vector norm + normalized components, exact int64 sum-of-squares →
# one sqrt (IEEE correctly-rounded, cross-engine safe) → per-component
# division.  Map-only; the embedding hygiene step before cosine ANN.
_NORM_VECS = 50


def q232_vector_normalize(spark, sf_dir):
    from tiledb_mariadb_spark.functions.similarity import (  # noqa: PLC0415
        SCALE,
        norm2_int_expr,
    )

    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _NORM_VECS)
    staged = e.select(
        "vec_id",
        "embedding",
        F.expr(norm2_int_expr("embedding")).alias("ss_int"),
    )
    return staged.select(
        "vec_id",
        F.expr(f"sqrt(CAST(ss_int AS DOUBLE)) / {SCALE}D").alias("l2_norm"),
        F.expr(
            f"CAST(element_at(embedding, 1) AS DOUBLE)"
            f" / (sqrt(CAST(ss_int AS DOUBLE)) / {SCALE}D)"
        ).alias("first_component_unit"),
    ).orderBy("vec_id")


def _q232_sql() -> str:
    from tiledb_mariadb_spark.functions.similarity import SCALE, _scaled_int_sql

    ss = (
        f"(SELECT CAST(SUM({_scaled_int_sql('x')} * {_scaled_int_sql('x')})"
        f" AS BIGINT) FROM UNNEST(embedding) AS t(x))"
    )
    return f"""
WITH staged AS (
  SELECT vec_id, embedding, {ss} AS ss_int
  FROM embeddings WHERE vec_id < {_NORM_VECS})
SELECT vec_id,
       sqrt(CAST(ss_int AS DOUBLE)) / {SCALE} AS l2_norm,
       CAST(embedding[1] AS DOUBLE)
         / (sqrt(CAST(ss_int AS DOUBLE)) / {SCALE}) AS first_component_unit
FROM staged ORDER BY vec_id
"""


SPECS = [
    QuerySpec(
        "q228_copurchase",
        q228_copurchase,
        Q228_SQL,
        "co-purchase pair counts via bounded in-basket pair generation",
    ),
    QuerySpec(
        "q229_chi2_drift",
        q229_chi2_drift,
        Q229_SQL,
        "chi-squared language-mix drift between corpus halves",
    ),
    QuerySpec(
        "q230_vocab_encode",
        q230_vocab_encode,
        Q230_SQL,
        "vocabulary encoding: corpus top-N vocab, OOV=0, order-preserving",
    ),
    QuerySpec(
        "q231_binary_chunks",
        q231_binary_chunks,
        Q231_SQL,
        "binary payload chunking with per-chunk md5, fully JVM-side",
    ),
    QuerySpec(
        "q232_vector_normalize",
        q232_vector_normalize,
        _q232_sql(),
        "vector L2 normalization from exact int64 sum-of-squares",
    ),
]
