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


# --- q252: multi-granularity rollup cascade ---------------------------------
# OLAP rollup trees re-aggregate coarse grains FROM finer grains (day
# from hour), never rescanning facts — legal only for distributive/
# algebraic aggregates carried as (count, sum, min, max).  The spec
# computes day-level results THROUGH the hourly rollup; the oracle
# computes them directly from raw events — equality proves the cascade
# loses nothing.  At 100 TB this is the difference between a rollup
# refresh touching 24 hourly rows per day and re-reading the fact table.


def q252_rollup_cascade(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) div 3600").alias("hour"),
        F.expr("CAST(ROUND(value * 10000.0) AS BIGINT)").alias("v"),
    )
    hourly = e.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    daily = (
        hourly.withColumn("day", F.expr("hour DIV 24"))
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sv").cast("long").alias("sv"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        "sv",
        "mn",
        "mx",
        F.expr("CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)").alias("avg_scaled"),
    ).orderBy("event_type", "day")


Q252_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 // 24 AS day,
         CAST(ROUND(value * 10000.0) AS BIGINT) AS v
  FROM events)
SELECT event_type, day, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv,
       CAST(MIN(v) AS BIGINT) AS mn, CAST(MAX(v) AS BIGINT) AS mx,
       CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_scaled
FROM e GROUP BY event_type, day ORDER BY event_type, day
"""


# --- q253: score-decile calibration table -----------------------------------
# Model-calibration report: users bucketed into deciles of a
# deterministic score, per-decile actual outcome rate (did the user
# purchase?).  Decile assignment reuses the scale-safe global ordinal
# (q212) — NTILE would be the 1-task window again.


def q253_calibration(spark, sf_dir):
    from tiledb_mariadb_spark.functions import dedup as D  # noqa: PLC0415
    from tiledb_mariadb_spark.functions.pipeline import (  # noqa: PLC0415
        stable_ordinal,
    )

    e = t(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias(
            "purchased"
        )
    )
    scored = users.withColumn(
        "score", D.hash60(F.col("user_id").cast("string"), "calib")
    )
    n_row = F.broadcast(scored.agg(F.count(F.lit(1)).alias("n")))
    ranked = stable_ordinal(scored, ["score", "user_id"])
    return (
        ranked.crossJoin(n_row)
        .withColumn("decile", F.expr("(ordinal - 1) * 10 DIV n"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("purchased").cast("long").alias("n_purchasers"),
        )
        .withColumn(
            "rate",
            F.expr(
                "CAST(n_purchasers AS DOUBLE) / CAST(n_users AS DOUBLE)"
            ),
        )
        .orderBy("decile")
    )


_CALIB_H60 = "CAST(('0x' || substr(md5('calib:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
Q253_SQL = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM events GROUP BY user_id),
scored AS (SELECT user_id, purchased, {_CALIB_H60} AS score FROM users),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score, user_id) AS ordinal,
         COUNT(*) OVER () AS n
  FROM scored)
SELECT CAST((ordinal - 1) * 10 // n AS BIGINT) AS decile,
       COUNT(*) AS n_users,
       CAST(SUM(purchased) AS BIGINT) AS n_purchasers,
       CAST(CAST(SUM(purchased) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS rate
FROM ranked GROUP BY 1 ORDER BY decile
"""


# --- q260: Poisson bootstrap confidence estimation --------------------------
# The resampling-at-scale pattern: classic bootstrap needs sampling WITH
# replacement from the full dataset per replica (a global shuffle each);
# the Poisson bootstrap approximates each replica's multiplicity with an
# independent Poisson(1) count PER ROW — map-side, all replicas in ONE
# pass (explode factor = replica count), one groupBy(replica).  Counts
# are derived from md5 fractions through the exact inverse-CDF
# thresholds, so both engines draw identical "randomness" and re-runs
# are reproducible (a retried task resamples identically — real rand()
# would silently shift the CI).
_BOOT_B = 16
# P(X<=k) for Poisson(1): e^-1 * (1, 2, 2.5, 2.6667)
_BOOT_T = (0.36787944117144233, 0.7357588823428847,
           0.9196986029286058, 0.9810118431238462)


def _poisson_w(frac_expr: str) -> str:
    return (
        f"CASE WHEN {frac_expr} < {_BOOT_T[0]!r} THEN 0"
        f" WHEN {frac_expr} < {_BOOT_T[1]!r} THEN 1"
        f" WHEN {frac_expr} < {_BOOT_T[2]!r} THEN 2"
        f" WHEN {frac_expr} < {_BOOT_T[3]!r} THEN 3 ELSE 4 END"
    )


def q260_poisson_bootstrap(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    reps = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("replica"),
    )
    frac = (
        "(CAST(conv(substring(md5(concat('boot:', CAST(replica AS STRING),"
        " ':', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " / 4294967296.0D)"
    )
    weighted = reps.withColumn("w", F.expr(_poisson_w(frac)).cast("long"))
    return (
        weighted.groupBy("replica")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).alias("wsum"),
        )
        .select(
            F.col("replica").cast("long").alias("replica"),
            F.col("n_eff").cast("long").alias("n_eff"),
            F.expr(
                "CAST(wsum AS DOUBLE) / CAST(n_eff AS DOUBLE)"
            ).alias("boot_mean_cents"),
        )
        .orderBy("replica")
    )


def _q260_sql() -> str:
    frac = (
        "(CAST(('0x' || substr(md5('boot:' || CAST(replica AS VARCHAR)"
        " || ':' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0)"
    )
    return f"""
WITH o AS (SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
reps AS (SELECT o_orderkey, cents, CAST(r AS BIGINT) AS replica
         FROM o, UNNEST(range(1, {_BOOT_B} + 1)) AS u(r)),
weighted AS (SELECT *, CAST({_poisson_w(frac)} AS BIGINT) AS w FROM reps)
SELECT replica, CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(CAST(SUM(w * cents) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS boot_mean_cents
FROM weighted GROUP BY replica ORDER BY replica
"""


SPECS = [
    QuerySpec(
        "q260_poisson_bootstrap",
        lambda spark, sf_dir: q260_poisson_bootstrap(spark, sf_dir),
        _q260_sql(),
        "Poisson bootstrap: map-side replica resampling, deterministic "
        "inverse-CDF draws",
    ),
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
    QuerySpec(
        "q252_rollup_cascade",
        q252_rollup_cascade,
        Q252_SQL,
        "day-from-hour rollup cascade equals direct aggregation "
        "(re-aggregability of the carried moments)",
    ),
    QuerySpec(
        "q253_calibration",
        q253_calibration,
        Q253_SQL,
        "score-decile calibration table via the scale-safe ordinal",
    ),
]


# --- q269: triangle counting (degree-oriented wedge join) -------------------
# Graph tier completion (alongside q200 pagerank and q140/q197 connected
# components): count triangles in the co-purchase graph.  The naive form
# is a 3-way self-join of the edge list (the oracle runs exactly that,
# oracle-scale only).  The Spark path uses the standard scalable
# algorithm: orient every edge from lower to higher (degree, id) rank —
# bounding out-degree by ~sqrt(2m) — generate wedges only between
# out-neighbors (Σ C(outdeg,2), the algorithm's work bound), and close
# them against the oriented edge list.  Each triangle is counted exactly
# once at its lowest-rank vertex.  All joins shuffle on bounded
# edge/wedge keys; nothing touches the fact table twice.
def q269_triangle_count(spark, sf_dir):
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
    # edges feeds the degree rollup, both orientation joins, the wedge
    # close AND the final count — persist so the basket explode +
    # distinct run once, not once per consumer (the q200 edges lesson;
    # without this the physical plan re-derives the edge list from
    # lineitem for every reference)
    from pyspark import StorageLevel  # noqa: PLC0415

    from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

    edges = _P.track(pairs.distinct().persist(StorageLevel.MEMORY_AND_DISK))
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    deg = _P.track(deg.persist(StorageLevel.MEMORY_AND_DISK))  # 2 broadcasts + n_nodes
    e = edges.join(
        F.broadcast(deg).withColumnRenamed("n", "a").withColumnRenamed("d", "da"),
        "a",
    ).join(
        F.broadcast(deg).withColumnRenamed("n", "b").withColumnRenamed("d", "db"),
        "b",
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # oriented is consumed three times (both wedge sides + the closing
    # edge join); persisting it caps the plan at one derivation instead
    # of three full edge re-builds
    oriented = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    oriented = _P.track(oriented.persist(StorageLevel.MEMORY_AND_DISK))
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    rank_lt = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = o1.join(
        o2, (F.col("o1.u") == F.col("o2.u")) & rank_lt
    ).select(F.col("o1.v").alias("x"), F.col("o2.v").alias("y"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    )
    return (
        closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .crossJoin(edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        .crossJoin(deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


Q269_SQL = """
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS items
  FROM lineitem GROUP BY 1),
pairs AS (
  SELECT UNNEST(flatten([[{'a': items[i], 'b': items[j]}
                          for j in range(i+1, len(items)+1)]
                         for i in range(1, len(items)+1)])) AS p
  FROM baskets),
e AS (SELECT DISTINCT p.a AS a, p.b AS b FROM pairs)
SELECT
  CAST((SELECT COUNT(DISTINCT n) FROM
        (SELECT a AS n FROM e UNION ALL SELECT b FROM e)) AS BIGINT)
    AS n_nodes,
  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
  CAST((SELECT COUNT(*) FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS BIGINT) AS n_triangles
"""

SPECS.append(
    QuerySpec(
        "q269_triangle_count", q269_triangle_count, Q269_SQL,
        "triangle counting via degree-oriented wedge join "
        "(out-degree bounded ~sqrt(2m)); oracle = naive 3-way join",
    )
)


# --- q270: embedding drift monitor (exact-integer centroid shift) -----------
# Production guardrail for an embedding pipeline: did the vector
# distribution move between two corpus slices (model re-embed, data
# shift)?  Per-dimension centroid difference, computed WITHOUT any
# division: with scaled-int sums s0/s1 and counts n0/n1, the cross-
# multiplied drift  s0*n1 − s1*n0  is exact int64 — engine-independent by
# construction.  Scale shape: posexplode + groupBy(dim) is one map-side-
# combined aggregation over (half, dim) — 128 partial rows per partition
# regardless of corpus size; no vector ever shuffles whole.
def q270_embedding_drift(spark, sf_dir):
    from tiledb_mariadb_spark.functions.similarity import _scaled_int_spark  # noqa: PLC0415

    e = t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("j", "x"),
    )
    sums = e.groupBy("half", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_scaled_int_spark("x"))).alias("s"),
    )
    h0 = sums.filter(F.col("half") == 0).select(
        "j", F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    h1 = sums.filter(F.col("half") == 1).select(
        "j", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    return (
        h0.join(h1, "j")
        .select(
            F.col("j").cast("bigint").alias("dim_idx"),
            (F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0"))
            .cast("bigint")
            .alias("drift_scaled"),
        )
        .orderBy("dim_idx")
    )


# DuckDB has no WITH ORDINALITY: carry the index inside a struct list.
Q270_SQL = """
WITH exploded AS (
  SELECT vec_id % 2 AS half,
         UNNEST(list_transform(embedding, (x, i) -> {'j': i - 1, 'x': x})) AS e
  FROM embeddings),
sums AS (
  SELECT half, e.j AS j, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(e.x AS DOUBLE) * 10000.0) AS BIGINT))
              AS BIGINT) AS s
  FROM exploded GROUP BY 1, 2)
SELECT CAST(h0.j AS BIGINT) AS dim_idx,
       CAST(h0.s * h1.n - h1.s * h0.n AS BIGINT) AS drift_scaled
FROM sums h0 JOIN sums h1 ON h0.j = h1.j AND h0.half = 0 AND h1.half = 1
ORDER BY dim_idx
"""

SPECS.append(
    QuerySpec(
        "q270_embedding_drift", q270_embedding_drift, Q270_SQL,
        "per-dimension centroid drift between corpus halves, exact int64 "
        "cross-multiplied (no division) — map-side combined, 128 partials",
    )
)


# --- q273: frequent itemset TRIPLES (bounded in-basket expansion) -----------
# Completes the market-basket family (q228 pairs): 3-item co-purchase
# counts.  The naive form is a cubic fact self-join; here the C(n,3)
# expansion happens INSIDE each order's sorted item array (n ≤ the
# schema-bounded lines-per-order, so ≤ C(7,3)=35 structs per basket) and
# only (a,b,c) rows reach the counting shuffle — the same shape that
# made q228 scale-safe, one nesting deeper.
def q273_itemset_triples(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) ->"
                " flatten(transform(slice(items, i + 2, size(items)), (y, j) ->"
                "  transform(slice(items, i + j + 3, size(items)),"
                "   z -> struct(x AS a, y AS b, z AS c))))))"
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.c")
    return (
        triples.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b", "c")
        .limit(15)
    )


Q273_SQL = """
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS items
  FROM lineitem GROUP BY 1),
triples AS (
  SELECT UNNEST(flatten(flatten(
    [[[{'a': items[i], 'b': items[j], 'c': items[k]}
       for k in range(j+1, len(items)+1)]
      for j in range(i+1, len(items)+1)]
     for i in range(1, len(items)+1)]))) AS p
  FROM baskets)
SELECT p.a AS a, p.b AS b, p.c AS c, CAST(COUNT(*) AS BIGINT) AS cnt
FROM triples GROUP BY 1, 2, 3
ORDER BY cnt DESC, a, b, c
LIMIT 15
"""

SPECS.append(
    QuerySpec(
        "q273_itemset_triples", q273_itemset_triples, Q273_SQL,
        "3-item co-purchase counts via in-basket bounded expansion "
        "(no cubic fact self-join)",
    )
)


# --- q281: token-budget corpus mixing (round 4) -----------------------------
# Data-mixture construction with PER-SOURCE budgets: deterministic
# md5-keyed shuffle within each source, admit documents until the
# source's char budget (token proxy) is exhausted.  One window cumsum —
# map-side after the per-source shuffle, no driver loop; the budget
# check is a per-row predicate on the running total, so the plan is a
# single pass at any corpus size.
_Q281_BUDGET = 200_000


def q281_token_budget_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d.select(
        "source", "doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum")
    )
    return (
        ranked.filter(F.col("cum") <= _Q281_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


Q281_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM ranked WHERE cum <= {_Q281_BUDGET}
GROUP BY source ORDER BY source
"""

SPECS.append(
    QuerySpec(
        "q281_token_budget_mix",
        q281_token_budget_mix,
        Q281_SQL,
        "per-source token-budget corpus mixing: deterministic md5 order + "
        "window cumsum admission, single pass",
    )
)


# --- q282: k-anonymity threshold release (round 4) --------------------------
# Privacy-preserving corpus statistics: (lang, source) groups smaller
# than k are coalesced into an OTHER bucket before release, so no
# published row describes fewer than k documents.  Two tiny aggregates
# (group sizes are |langs|x|sources| rows — broadcast scale at 100 TB).
_Q282_K = 5


def q282_k_anonymity(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    small = F.col("n") < _Q282_K
    return (
        g.select(
            F.when(small, F.lit("OTHER")).otherwise(F.col("lang")).alias("lang_k"),
            F.when(small, F.lit("OTHER")).otherwise(F.col("source")).alias("source_k"),
            "n",
        )
        .groupBy("lang_k", "source_k")
        .agg(F.sum("n").cast("bigint").alias("n_docs"))
        .orderBy("lang_k", "source_k")
    )


Q282_SQL = f"""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
)
SELECT CASE WHEN n < {_Q282_K} THEN 'OTHER' ELSE lang END AS lang_k,
       CASE WHEN n < {_Q282_K} THEN 'OTHER' ELSE source END AS source_k,
       CAST(SUM(n) AS BIGINT) AS n_docs
FROM g GROUP BY 1, 2 ORDER BY 1, 2
"""

SPECS.append(
    QuerySpec(
        "q282_k_anonymity",
        q282_k_anonymity,
        Q282_SQL,
        "k-anonymity threshold release: sub-k (lang, source) groups "
        "coalesce into OTHER before publication",
    )
)


# --- q287: cluster-balanced diversity sampling (round 4) --------------------
# Curation step for training mixes: partition the embedding space into
# deterministic sign-quadrant clusters (the first 4 components' signs —
# a fixed 16-cell coarse quantizer), then take an equal per-cluster
# quota by md5 order, so no dense region dominates the sample
# (cluster-balanced sampling a la SemDeDup/DSIR practice).  One window
# over the cluster partitioning — single shuffle, no driver state.
_Q287_QUOTA = 25


def q287_diversity_sample(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    bucket = sum(
        (F.element_at("embedding", j + 1) > 0).cast("int") * (1 << j)
        for j in range(4)
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    )
    ranked = e.select(
        bucket.alias("bucket"), "vec_id"
    ).withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("rn") <= _Q287_QUOTA).cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("rn") <= _Q287_QUOTA, F.col("vec_id"))
                .otherwise(F.lit(0))
            ).cast("bigint").alias("kept_id_sum"),
        )
        .orderBy("bucket")
    )


Q287_SQL = f"""
WITH b AS (
  SELECT vec_id,
         CAST(embedding[1] > 0 AS INT) * 1 + CAST(embedding[2] > 0 AS INT) * 2
       + CAST(embedding[3] > 0 AS INT) * 4 + CAST(embedding[4] > 0 AS INT) * 8
         AS bucket
  FROM embeddings
),
ranked AS (
  SELECT bucket, vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY bucket
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS rn
  FROM b
)
SELECT bucket, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN rn <= {_Q287_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rn <= {_Q287_QUOTA} THEN vec_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY bucket ORDER BY bucket
"""

SPECS.append(
    QuerySpec(
        "q287_diversity_sample",
        q287_diversity_sample,
        Q287_SQL,
        "cluster-balanced diversity sampling: sign-quadrant coarse "
        "quantizer + equal per-cluster md5-ordered quotas, one shuffle",
    )
)
