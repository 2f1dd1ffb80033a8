"""Event-analytics and iterative-graph operators: funnel conversion,
cohort retention, integer PageRank, and distributed sketch merging.

* q198 — **funnel conversion** (view -> click -> purchase): progressive
  conditional minima per user — each stage is a keyed aggregate on
  user_id, so all three stages reuse one shuffle key (co-partitioned
  joins; AQE coalesces).  The standard product-analytics query shape
  over an events table.
* q199 — **cohort retention matrix**: cohort = first-activity week,
  cell = distinct users from cohort c active in week c+k.  Weeks are
  integer day-offsets // 7 from a fixed epoch — cross-engine-stable
  (date_trunc('week') anchors differ between engines' settings).
* q200 — **integer PageRank** (3 Jacobi iterations, damping 0.85) over a
  deterministic synthetic link graph on documents.  All arithmetic is
  scaled-BIGINT with integer DIV (sum of per-edge ``score div outdeg``
  is order-independent, so the result is bit-identical cross-engine —
  float PageRank would not be).  The web-graph quality-weighting signal
  corpus pipelines attach to crawled documents.
* q201 — **HLL merge associativity**: build per-segment HLL registers,
  merge them (groupBy bucket max), and show the merged estimate equals
  the directly-built global estimate — the property that makes the
  sketch a valid partial aggregate at 1000 executors.

The reference has no iterative/event tier (driver-added scope, like
pipeline_ops*).  PageRank citation: Page et al. 1999; the integer
formulation is this repo's determinism convention (suite/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import sketches as K
from tiledb_mariadb_spark.suite import QuerySpec, t

# --- q198: funnel conversion ------------------------------------------------


def q198_funnel(spark, sf_dir):
    # ONE user_id shuffle: per-user progressive minima are derived from
    # bounded per-type event-time arrays inside the same aggregate (the
    # cascading-join form re-planned each earlier stage as a new subtree
    # — 16 exchanges plus a separate distinct-count job; this is 2).
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("t1"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == "click", F.col("ts"))
                )
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", F.col("ts"))
                )
            ).alias("purchases"),
        )
        .withColumn(
            "t2", F.expr("array_min(filter(clicks, x -> x > t1))")
        )
        .withColumn(
            "t3", F.expr("array_min(filter(purchases, x -> x > t2))")
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t1").cast("long").alias("n_view"),
        F.count("t2").cast("long").alias("n_click"),
        F.count("t3").cast("long").alias("n_purchase"),
    ).select(
        "n_users",
        "n_view",
        "n_click",
        "n_purchase",
        (
            F.col("n_click").cast("double") / F.col("n_view").cast("double")
        ).alias("view_to_click"),
        (
            F.col("n_purchase").cast("double")
            / F.col("n_click").cast("double")
        ).alias("click_to_purchase"),
    )


Q198_SQL = """
WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN t2 ON e.user_id = t2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
       (SELECT COUNT(*) FROM t1) AS n_view,
       (SELECT COUNT(*) FROM t2) AS n_click,
       (SELECT COUNT(*) FROM t3) AS n_purchase,
       CAST((SELECT COUNT(*) FROM t2) AS DOUBLE)
       / CAST((SELECT COUNT(*) FROM t1) AS DOUBLE) AS view_to_click,
       CAST((SELECT COUNT(*) FROM t3) AS DOUBLE)
       / CAST((SELECT COUNT(*) FROM t2) AS DOUBLE) AS click_to_purchase
"""


# --- q199: cohort retention matrix -----------------------------------------
_EPOCH = "2024-01-01"


def q199_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        (
            F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date"))
            / 7
        )
        .cast("long")
        .alias("week"),
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = e.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset")
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "offset")
    )


Q199_SQL = f"""
WITH w AS (SELECT user_id,
                  CAST(datediff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) // 7
                       AS BIGINT) AS week
           FROM events),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM w)
SELECT cohort_week, week - cohort_week AS "offset",
       CAST(COUNT(DISTINCT active.user_id) AS BIGINT) AS n_active
FROM active JOIN cohort ON active.user_id = cohort.user_id
GROUP BY cohort_week, week - cohort_week
ORDER BY cohort_week, "offset"
"""


# --- q200: integer PageRank over a synthetic link graph --------------------
_PR_SCALE = 1_000_000
_PR_OUT = 3  # constant out-degree by construction
_PR_ITERS = 3
_PR_TOPK = 20


def q200_pagerank(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    n_row = F.broadcast(d.agg(F.count(F.lit(1)).alias("n")))
    edges = (
        d.crossJoin(n_row)
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        ((F.col("doc_id") * 7 + j * 13) % F.col("n")).alias("d")
                        for j in range(1, _PR_OUT + 1)
                    ]
                )
            ).alias("dst"),
        )
    )
    # edges feed every iteration's join: persist so the derivation scan
    # runs once, not once per iteration (same knob rationale as
    # dedup.lsh_candidate_pairs)
    from pyspark import StorageLevel  # noqa: PLC0415

    from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

    edges = _P.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    scores = d.select(
        F.col("doc_id").alias("node"), F.lit(_PR_SCALE).cast("long").alias("score")
    )
    base = _PR_SCALE * 15 // 100
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(scores, edges.src == scores.node)
            .groupBy("dst")
            .agg(F.sum(F.expr(f"score div {_PR_OUT}")).alias("s_in"))
        )
        scores = (
            d.select(F.col("doc_id").alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("(85 * coalesce(s_in, CAST(0 AS BIGINT))) div 100")
                ).alias("score"),
            )
        )
    return scores.orderBy(F.col("score").desc(), F.col("node")).limit(_PR_TOPK)


def _q200_sql() -> str:
    base = _PR_SCALE * 15 // 100
    iters = []
    prev = "s0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"c{i} AS (SELECT dst, CAST(SUM(score // {_PR_OUT}) AS BIGINT) AS s_in"
            f" FROM edges JOIN {prev} ON edges.src = {prev}.node GROUP BY dst),\n"
            f"s{i} AS (SELECT doc_id AS node,"
            f" CAST({base} + (85 * COALESCE(s_in, 0)) // 100 AS BIGINT) AS score"
            f" FROM documents LEFT JOIN c{i} ON documents.doc_id = c{i}.dst)"
        )
        prev = f"s{i}"
    its = ",\n".join(iters)
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (SELECT doc_id AS src, (doc_id * 7 + j * 13) % n AS dst
          FROM documents, nn, UNNEST(range(1, {_PR_OUT + 1})) AS t(j)),
s0 AS (SELECT doc_id AS node, CAST({_PR_SCALE} AS BIGINT) AS score FROM documents),
{its}
SELECT node, score FROM {prev} ORDER BY score DESC, node LIMIT {_PR_TOPK}
"""


# --- q201: HLL merge associativity -----------------------------------------
def q201_hll_merge(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_custkey").cast("string").alias("k")
    )
    bucket, rho = K.hll_register_cols(F.col("k"))
    per_seg = (
        c.select("c_mktsegment", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("c_mktsegment", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = per_seg.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = (
        c.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    m = K.hll_estimate(merged).withColumnRenamed("hll_estimate", "merged_estimate")
    g = K.hll_estimate(direct).withColumnRenamed("hll_estimate", "direct_estimate")
    return m.crossJoin(g).select(
        "merged_estimate",
        "direct_estimate",
        (F.col("merged_estimate") == F.col("direct_estimate")).cast("int").alias(
            "identical"
        ),
    )


def _q201_sql() -> str:
    b, r = K.hll_register_sql("k")
    return f"""
WITH keys AS (SELECT c_mktsegment, CAST(c_custkey AS VARCHAR) AS k FROM customer),
per_seg AS (SELECT c_mktsegment, {b} AS bucket, MAX({r}) AS rho
            FROM keys GROUP BY 1, 2),
merged AS (SELECT bucket, MAX(rho) AS rho FROM per_seg GROUP BY bucket),
direct AS (SELECT {b} AS bucket, MAX({r}) AS rho FROM keys GROUP BY 1),
m AS (SELECT hll_estimate AS merged_estimate
      FROM ({K.hll_estimate_sql('SELECT bucket, rho FROM merged')})),
g AS (SELECT hll_estimate AS direct_estimate
      FROM ({K.hll_estimate_sql('SELECT bucket, rho FROM direct')}))
SELECT merged_estimate, direct_estimate,
       CAST(merged_estimate = direct_estimate AS INT) AS identical
FROM m, g
"""


SPECS = [
    QuerySpec(
        "q198_funnel",
        q198_funnel,
        Q198_SQL,
        "funnel conversion: progressive conditional minima per user",
    ),
    QuerySpec(
        "q199_retention",
        q199_retention,
        Q199_SQL,
        "weekly cohort retention matrix (integer week buckets)",
    ),
    QuerySpec(
        "q200_pagerank",
        q200_pagerank,
        _q200_sql(),
        "integer PageRank, 3 iterations over a deterministic link graph",
    ),
    QuerySpec(
        "q201_hll_merge",
        q201_hll_merge,
        _q201_sql(),
        "HLL merge associativity: merged per-segment == direct global",
    ),
]
