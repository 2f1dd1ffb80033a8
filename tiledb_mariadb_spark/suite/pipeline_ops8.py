"""Batch 8 pipeline ops: inverted-index construction and rolling
moment-based bands.

* q248 — **inverted index build**: word → posting list (sorted doc ids),
  document frequency, collection frequency — the IR index-construction
  step behind the lexical/BM25 retrieval tier (q184/q213 score queries
  online; a real deployment materializes this index).  One explode +
  one groupBy(word); posting lists are emitted as strings (driver
  canonicalizer contract), bounded to the top-vocabulary slice.
* q249 — **rolling mean/σ bands (Bollinger)**: trailing-8 window mean and
  population variance from EXACT integer window sums (Σv, Σv²) — the
  engines' own stddev-over-window accumulates floats in engine-specific
  order and cannot cross-hash; from-moments is the distributed-safe
  form, and the final IEEE chain is written identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q248: inverted index ---------------------------------------------------
_IDX_VOCAB = 40


def q248_inverted_index(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    postings = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.count_distinct("doc_id").cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return (
        postings.orderBy(F.col("cf").desc(), "word")
        .limit(_IDX_VOCAB)
        .select("word", "cf", "df", F.md5("postings").alias("postings_md5"))
    )


Q248_SQL = f"""
WITH words AS (
  SELECT doc_id, u.word FROM documents,
         UNNEST(string_split(text, ' ')) AS u(word)
  WHERE u.word <> ''),
postings AS (
  SELECT word, c.cf AS cf, COUNT(*) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM (SELECT DISTINCT doc_id, word FROM words) dw
  JOIN (SELECT word AS w2, COUNT(*) AS cf FROM words GROUP BY 1) c
    ON c.w2 = dw.word
  GROUP BY word, c.cf)
SELECT word, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
       md5(postings) AS postings_md5
FROM postings ORDER BY cf DESC, word LIMIT {_IDX_VOCAB}
"""


# --- q249: rolling mean/σ bands from exact window moments -------------------
_BB_W = 8
_BB_USERS = 30


def q249_rolling_bands(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < _BB_USERS)
        .select(
            "user_id",
            "event_id",
            F.expr("unix_timestamp(ts)").alias("sec"),
            F.expr("CAST(ROUND(value * 10000.0) AS BIGINT)").alias("v"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(-(_BB_W - 1), 0)
    )
    m = (
        e.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("sv", F.sum("v").over(w))
        .withColumn("svv", F.sum(F.col("v") * F.col("v")).over(w))
        .filter(F.col("n") == _BB_W)
    )
    return m.select(
        "user_id",
        "event_id",
        F.expr("CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)").alias("mean_scaled"),
        F.expr(
            "sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)"
            " - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
        ).alias("sigma_scaled"),
    ).orderBy("user_id", "event_id")


Q249_SQL = f"""
WITH e AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000.0) AS BIGINT) AS v
  FROM events WHERE user_id < {_BB_USERS}),
m AS (
  SELECT user_id, event_id,
    COUNT(*) OVER w AS n,
    CAST(SUM(v) OVER w AS BIGINT) AS sv,
    CAST(SUM(v * v) OVER w AS BIGINT) AS svv
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
                      ROWS BETWEEN {_BB_W - 1} PRECEDING AND CURRENT ROW))
SELECT user_id, event_id,
       CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_scaled,
       sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
             - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma_scaled
FROM m WHERE n = {_BB_W} ORDER BY user_id, event_id
"""


SPECS = [
    QuerySpec(
        "q248_inverted_index",
        q248_inverted_index,
        Q248_SQL,
        "inverted-index build: word → posting list / df / cf",
    ),
    QuerySpec(
        "q249_rolling_bands",
        q249_rolling_bands,
        Q249_SQL,
        "rolling mean/sigma bands from exact integer window moments",
    ),
]
