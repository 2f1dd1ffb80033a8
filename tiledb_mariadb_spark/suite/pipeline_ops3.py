"""Corpus-pipeline operators, third batch: exact duplicate-span detection,
deterministic lexical ranking, hybrid (lexical + vector) retrieval fusion,
and epoch-seeded training shuffle.

* q183 — **exact duplicate-span detection**: the distributed re-expression
  of suffix-array ExactSubstr dedup (Lee et al. 2022): fingerprint every
  k-token window, keep fingerprints seen in >= 2 distinct docs, merge
  per-doc runs of duplicated window starts into maximal spans
  (gaps-and-islands).  ``functions/dedup.py::dup_span_report``.
* q184 — **lexical top-k retrieval**: exact whole-word tf · integer idf
  ((N·1e6) DIV df — ln is not cross-engine-stable), map-side scoring with
  a single broadcast stats row, TakeOrdered top-k.
  ``functions/ranking.py::lexical_scores``.
* q185 — **hybrid retrieval (RRF)**: reciprocal-rank fusion of the q184
  lexical ranking with an exact integer inner-product vector ranking over
  ``embeddings`` (doc_id = vec_id at every sf).  Fusion runs on the two
  bounded candidate lists, never the corpus.
* q186 — **epoch shuffle**: deterministic training-order assignment —
  md5-keyed global order, shard = key % n, per-shard position.  The
  standard "shuffle once, read sequentially per worker" prep for a 100 TB
  corpus: one hash pass, one shuffle on shard, per-shard sort.

The reference has no retrieval/training tier (it stores arrays); these are
driver-added training-data scope like the rest of pipeline_ops*.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import ranking as R
from tiledb_mariadb_spark.functions import similarity as S
from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q183: exact duplicate-span detection ----------------------------------
_SPAN_K = 8


def q183_dup_spans(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return D.dup_span_report(d, "doc_id", "text", k=_SPAN_K)


Q183_SQL = D.dup_span_report_sql("documents", "doc_id", "text", k=_SPAN_K)


# --- q184: lexical top-k retrieval -----------------------------------------
_TERMS = ("table", "query", "spark")
_TOPK = 20


def q184_lexical_topk(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = R.lexical_scores(d, "doc_id", "text", _TERMS)
    return R.top_ranks(scored, "doc_id", "score", _TOPK).select(
        "doc_id", "score", F.col("rank").alias("rnk")
    )


Q184_SQL = f"""
WITH lex AS ({R.lexical_scores_sql('documents', 'doc_id', 'text', _TERMS)})
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM (SELECT * FROM lex ORDER BY score DESC, doc_id LIMIT {_TOPK})
"""


# --- q185: hybrid retrieval — RRF of lexical + vector rankings -------------
_CAND_K = 50


def q185_hybrid_rrf(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    lex = R.lexical_scores(d, "doc_id", "text", _TERMS)
    lex_r = R.top_ranks(lex, "doc_id", "score", _CAND_K).select("doc_id", "rank")

    e = t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    vs = (
        e.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(S.dot_int_expr("embedding", "qv")).alias("score"),
        )
    )
    vec_r = R.top_ranks(vs, "doc_id", "score", _CAND_K).select("doc_id", "rank")

    fused = R.rrf_fuse(lex_r, vec_r, "doc_id")
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(_TOPK)


Q185_SQL = f"""
WITH lex AS ({R.lexical_scores_sql('documents', 'doc_id', 'text', _TERMS)}),
lt AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_a
       FROM (SELECT * FROM lex ORDER BY score DESC, doc_id LIMIT {_CAND_K})),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
vs AS (SELECT vec_id AS doc_id, {S.dot_int_sql('embedding', 'qv')} AS score
       FROM embeddings, q),
vt AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_b
       FROM (SELECT * FROM vs ORDER BY score DESC, doc_id LIMIT {_CAND_K}))
SELECT COALESCE(lt.doc_id, vt.doc_id) AS doc_id,
       CAST(COALESCE(rank_a, -1) AS BIGINT) AS rank_a,
       CAST(COALESCE(rank_b, -1) AS BIGINT) AS rank_b,
       (CASE WHEN rank_a IS NOT NULL THEN 1.0 / CAST({R.RRF_K} + rank_a AS DOUBLE) ELSE 0.0 END
        + CASE WHEN rank_b IS NOT NULL THEN 1.0 / CAST({R.RRF_K} + rank_b AS DOUBLE) ELSE 0.0 END) AS rrf
FROM lt FULL OUTER JOIN vt ON lt.doc_id = vt.doc_id
ORDER BY rrf DESC, doc_id
LIMIT {_TOPK}
"""


# --- q186: epoch-seeded deterministic training shuffle ---------------------
_EPOCH_SEED = "epoch7"
_N_SHARDS = 8


def q186_epoch_shuffle(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    keyed = d.select(
        "doc_id",
        D.hash60(F.col("doc_id").cast("string"), _EPOCH_SEED).alias("sort_key"),
    ).withColumn("shard", (F.col("sort_key") % _N_SHARDS).cast("long"))
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        "sort_key",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


_H60 = D.hash60_sql("CAST(doc_id AS VARCHAR)", _EPOCH_SEED)
Q186_SQL = f"""
WITH keyed AS (SELECT doc_id, {_H60} AS sort_key FROM documents)
SELECT doc_id, CAST(sort_key % {_N_SHARDS} AS BIGINT) AS shard, sort_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY sort_key % {_N_SHARDS}
                               ORDER BY sort_key, doc_id) AS BIGINT) AS pos_in_shard
FROM keyed
"""


SPECS = [
    QuerySpec(
        "q183_dup_spans",
        q183_dup_spans,
        Q183_SQL,
        "exact duplicate-span detection (ExactSubstr analog, k-gram islands)",
    ),
    QuerySpec(
        "q184_lexical_topk",
        q184_lexical_topk,
        Q184_SQL,
        "lexical tf-idf top-k retrieval (integer idf, broadcast stats)",
    ),
    QuerySpec(
        "q185_hybrid_rrf",
        q185_hybrid_rrf,
        Q185_SQL,
        "hybrid retrieval: reciprocal-rank fusion of lexical + vector ranks",
    ),
    QuerySpec(
        "q186_epoch_shuffle",
        q186_epoch_shuffle,
        Q186_SQL,
        "epoch-seeded deterministic training shuffle (shard + position)",
    ),
]
