"""Capstone corpus-prep DAG (v2 of q182's funnel): the end-to-end
pre-training data build as ONE declarative plan —

    quality gate → exact dedup → eval-set decontamination →
    epoch-seeded shard assignment → shard manifest

* q245 — returns the per-shard training manifest (docs, tokens, token
  checksum) the trainer consumes.  Every stage reuses the operator the
  suite verifies in isolation (q146 gate, q62 dedup, q192 decontaminate,
  q186 shuffle), so this pins their COMPOSITION: stage boundaries are
  plain DataFrames, Catalyst fuses the gate+hash into the scan, the
  decontamination side is a broadcast semi-join, and the only wide
  shuffles are the dedup groupBy and the final per-shard aggregate —
  nothing about composing the stages adds a pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import text as X
from tiledb_mariadb_spark.suite import QuerySpec, t

_N_SHARDS = 8
_SEED = "cap-epoch1"
_DECON_K = 5


def q245_corpus_build(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_set = d.filter(F.col("doc_id") % 31 == 0)
    corpus = d.filter(F.col("doc_id") % 31 != 0)

    feats = X.quality_features(F.col("text"))
    gated = corpus.filter(
        feats["n_tokens"].between(5, 500) & (feats["stop_ratio"] >= 0.01)
    )
    # uniq feeds both the decontamination shingling AND the clean-side
    # anti-join — persist so the quality gate + md5 dedup over the
    # corpus run once, not twice (plan showed 6 documents scans with
    # zero exchange reuse)
    from pyspark import StorageLevel  # noqa: PLC0415

    from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

    uniq = _P.track(gated.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
    ).persist(StorageLevel.MEMORY_AND_DISK))
    eval_grams = (
        D.with_shingles(eval_set, "doc_id", "text", k=_DECON_K)
        .select(D.hash60(F.col("shingle"), "cap-decon").alias("g"))
        .distinct()
    )
    corpus_grams = D.with_shingles(uniq, "doc_id", "text", k=_DECON_K).select(
        "doc_id", D.hash60(F.col("shingle"), "cap-decon").alias("g")
    )
    contaminated = (
        corpus_grams.join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
    )
    clean = uniq.join(contaminated, "doc_id", "left_anti")
    sharded = clean.select(
        "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
        (
            D.hash60(F.col("doc_id").cast("string"), _SEED) % _N_SHARDS
        ).cast("long").alias("shard"),
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("doc_id") * F.col("n_tokens")).alias("manifest_sum"),
        )
        .orderBy("shard")
    )


def _q245_sql() -> str:
    qf = X.quality_features_sql("text")
    shg = D.shingles_sql(
        "(SELECT doc_id, text FROM uniq)", "doc_id", "text", k=_DECON_K
    )
    eshg = D.shingles_sql(
        f"(SELECT doc_id, text FROM documents WHERE doc_id % 31 = 0)",
        "doc_id",
        "text",
        k=_DECON_K,
    )
    g = D.hash60_sql("shingle", "cap-decon")
    h60 = D.hash60_sql("CAST(doc_id AS VARCHAR)", _SEED)
    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 31 <> 0
    AND ({qf['n_tokens']} BETWEEN 5 AND 500) AND ({qf['stop_ratio']} >= 0.01)),
uniq AS (
  SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
  FROM gated GROUP BY md5(text)),
eval_grams AS (SELECT DISTINCT {g} AS g FROM ({eshg}) s),
contaminated AS (
  SELECT DISTINCT doc_id FROM ({shg}) s
  WHERE {g} IN (SELECT g FROM eval_grams)),
clean AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
sharded AS (
  SELECT doc_id,
         CAST({X.token_count_sql('text')} AS BIGINT) AS n_tokens,
         CAST({h60} % {_N_SHARDS} AS BIGINT) AS shard
  FROM clean)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id * n_tokens) AS BIGINT) AS manifest_sum
FROM sharded GROUP BY shard ORDER BY shard
"""


SPECS = [
    QuerySpec(
        "q245_corpus_build",
        q245_corpus_build,
        _q245_sql(),
        "capstone corpus build: gate → dedup → decontaminate → shard "
        "manifest as one fused plan",
    ),
]
