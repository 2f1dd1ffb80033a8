"""Lexical relevance ranking and hybrid (lexical + vector) fusion for
retrieval-style corpus queries.

Scale shape: term frequencies are map-side Column arithmetic (codegen), the
corpus-level document frequencies are ONE tiny aggregate row broadcast back
over the scan, and the final top-k is a ``TakeOrderedAndProject`` (per-
partition heads only — no global sort shuffle).  Rank fusion operates on
the two candidate lists (bounded, driver-small), never on the corpus.

Determinism: classic BM25/tf-idf needs ``ln`` — which is NOT bit-stable
across engines (see the verify recipe).  We use the integer idf
``(N * 1_000_000) DIV df`` instead: same ordering intuition (rarer term →
larger weight), exact int64 arithmetic on both engines.  Reciprocal-rank
fusion is ``1.0 / (60 + rank)`` — an int64→double conversion plus one IEEE
division, bit-identical cross-engine (RRF constant 60 per Cormack et al.).

Reference parity note: the reference engine (TileDB-MariaDB) has no
full-text ranking; this is driver-added training-/retrieval-pipeline scope
alongside the ANN operators in ``functions/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions.text import word_hits, word_hits_sql

IDF_SCALE = 1_000_000
RRF_K = 60


def _tf_col(term: str) -> str:
    return f"tf_{term}"


def with_term_frequencies(
    df: DataFrame, text_col: str, terms: tuple[str, ...]
) -> DataFrame:
    """Append one exact whole-word tf column per query term (map-side)."""
    out = df
    for term in terms:
        out = out.withColumn(_tf_col(term), word_hits(F.col(text_col), term))
    return out


def lexical_scores(
    df: DataFrame, id_col: str, text_col: str, terms: tuple[str, ...]
) -> DataFrame:
    """Integer tf·idf score per document: SUM_t tf_t · (N·1e6 DIV df_t).

    One pass computes tf columns; a single 1-row aggregate supplies N and
    the per-term document frequencies; the broadcast cross-join puts them
    back on every row without shuffling the corpus.
    """
    tf = with_term_frequencies(df, text_col, terms).select(
        id_col, *[_tf_col(x) for x in terms]
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum((F.col(_tf_col(x)) > 0).cast("long")).alias(f"df_{x}")
        for x in terms
    ]
    stats = tf.agg(*aggs)
    score: Column = F.lit(0).cast("long")
    for x in terms:
        idf = F.expr(f"(n_docs * {IDF_SCALE}) DIV greatest(df_{x}, 1)")
        score = score + F.col(_tf_col(x)) * idf
    return (
        tf.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), score.cast("long").alias("score"))
    )


def lexical_scores_sql(
    table: str, id_col: str, text_col: str, terms: tuple[str, ...]
) -> str:
    """DuckDB twin of :func:`lexical_scores` (kept adjacent; see text.py)."""
    tf_exprs = ", ".join(
        f"{word_hits_sql(text_col, x)} AS tf_{x}" for x in terms
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{x} > 0 THEN 1 ELSE 0 END) AS df_{x}" for x in terms
    )
    score = " + ".join(
        f"tf_{x} * ((n_docs * {IDF_SCALE}) // GREATEST(df_{x}, 1))"
        for x in terms
    )
    return f"""
WITH tf AS (SELECT {id_col}, {tf_exprs} FROM {table}),
st AS (SELECT COUNT(*) AS n_docs, {df_exprs} FROM tf)
SELECT {id_col}, CAST({score} AS BIGINT) AS score FROM tf, st
"""


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-style relevance with length normalization (Robertson et al.).

    Same one-broadcast-stats-row shape as :func:`lexical_scores`, plus the
    saturating tf term ``tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` that
    classic tf·idf lacks.  Deviation for cross-engine determinism: the
    ``ln``-based idf is replaced by the integer ``(N·1e6) DIV df`` (ln is
    not bit-stable across engines); every float step is a fixed chain of
    IEEE ops on exactly-converted int64 inputs, written with identical
    parenthesization in the SQL twin.  dl = whitespace token count,
    avgdl = one exact int64 ratio converted once.
    """
    tf = with_term_frequencies(df, text_col, terms).select(
        id_col,
        F.size(F.split(F.trim(F.col(text_col)), " +")).cast("long").alias("dl"),
        *[_tf_col(x) for x in terms],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ] + [
        F.sum((F.col(_tf_col(x)) > 0).cast("long")).alias(f"df_{x}")
        for x in terms
    ]
    stats = tf.agg(*aggs)
    scored = tf.crossJoin(F.broadcast(stats)).withColumn(
        "norm_len",
        F.col("dl").cast("double")
        * (F.col("n_docs").cast("double") / F.col("sum_dl").cast("double")),
    )
    score: Column = F.lit(0.0)
    for x in terms:
        idf = F.expr(
            f"CAST((n_docs * {IDF_SCALE}) DIV greatest(df_{x}, 1) AS DOUBLE)"
        )
        tf_d = F.col(_tf_col(x)).cast("double")
        sat = (tf_d * F.lit(k1 + 1.0)) / (
            tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("norm_len"))
        )
        score = score + idf * sat
    return scored.select(F.col(id_col), score.alias("bm25"))


def bm25_scores_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_scores` — identical IEEE op chain.

    Float literals use e-notation (``1.2e0``): both engines parse bare
    ``1.2`` as DECIMAL, which would change the arithmetic type.
    """
    tf_exprs = ", ".join(f"{word_hits_sql(text_col, x)} AS tf_{x}" for x in terms)
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{x} > 0 THEN 1 ELSE 0 END) AS df_{x}" for x in terms
    )
    sat = " + ".join(
        f"(CAST((n_docs * {IDF_SCALE}) // GREATEST(df_{x}, 1) AS DOUBLE) * "
        f"((CAST(tf_{x} AS DOUBLE) * {k1 + 1.0!r}e0) / "
        f"(CAST(tf_{x} AS DOUBLE) + {k1!r}e0 * "
        f"({1.0 - b!r}e0 + {b!r}e0 * norm_len))))"
        for x in terms
    )
    return f"""
WITH tf AS (SELECT {id_col},
                   CAST(len(regexp_split_to_array(TRIM({text_col}), ' +')) AS BIGINT) AS dl,
                   {tf_exprs}
            FROM {table}),
st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl, {df_exprs} FROM tf),
nl AS (SELECT tf.*, st.*,
              CAST(dl AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)) AS norm_len
       FROM tf, st)
SELECT {id_col}, {sat} AS bm25 FROM nl
"""


def top_ranks(df: DataFrame, id_col: str, score_col: str, k: int) -> DataFrame:
    """Deterministic top-k + 1-based rank.

    The limit runs first (TakeOrderedAndProject: per-partition heads, no
    sort shuffle); the row_number window then orders only the k survivors
    (driver-small single partition — bounded by k, not the corpus).
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    topk = df.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse(
    a: DataFrame, b: DataFrame, id_col: str, k_const: int = RRF_K
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) candidate lists.

    Missing-from-one-list ids contribute 0 for that list (full outer join
    over two bounded lists).  ``1.0/(k + rank)`` is bit-identical on both
    engines: exact int64 sum, correctly-rounded int→double, one division.
    """
    ra = a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    rb = b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    joined = ra.join(rb, id_col, "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(),
        F.lit(1.0) / (F.lit(k_const) + F.col("rank_a")).cast("double"),
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(),
        F.lit(1.0) / (F.lit(k_const) + F.col("rank_b")).cast("double"),
    ).otherwise(F.lit(0.0))
    return joined.select(
        F.col(id_col),
        F.coalesce(F.col("rank_a"), F.lit(-1)).cast("long").alias("rank_a"),
        F.coalesce(F.col("rank_b"), F.lit(-1)).cast("long").alias("rank_b"),
        (contrib_a + contrib_b).alias("rrf"),
    )
