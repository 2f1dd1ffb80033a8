"""Batch 8: time-constrained funnels, corpus source-similarity, and the
DESCRIBE HISTORY catalog surface.

* q241 — **timed funnel**: purchases attributed only when the user's
  most recent click happened within the last hour — the time-bounded
  variant of q222 (classic attribution windows are bounded, not
  unbounded).  A RANGE frame over epoch seconds keeps the window state
  bounded by the time horizon instead of the user's full history.
* q242 — **source similarity matrix**: cosine similarity between
  per-source vocabulary histograms.  The scale shape: one (source,
  word) count aggregate, a word-keyed join between source vectors
  (bounded by shared vocabulary — never |src|² × |vocab|), exact int64
  dot products, norms via IEEE sqrt.  The corpus-drift / source-overlap
  report a mixing pipeline consults.
* q243 — **DESCRIBE HISTORY**: the version log (version, timestamp,
  rows, operation kind) as a queryable DataFrame — Delta-style table
  auditing over the reference's fragment/version model; oracle is the
  literal expected log.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiledb_mariadb_spark.suite import QuerySpec, ldf, t

# --- q241: time-bounded funnel ---------------------------------------------
_FUNNEL_HORIZON = 3600


def q241_timed_funnel(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_FUNNEL_HORIZON, 0)
    )
    tagged = e.withColumn(
        "recent_clicks",
        F.sum((F.col("event_type") == "click").cast("long")).over(w),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(
                (F.col("recent_clicks") > 0).cast("long")
            ).alias("n_click_driven"),
        )
        .orderBy("user_id")
    )


Q241_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
  FROM events),
tagged AS (
  SELECT *,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN {_FUNNEL_HORIZON} PRECEDING AND CURRENT ROW)
      AS BIGINT) AS recent_clicks
  FROM e)
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN recent_clicks > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click_driven
FROM tagged WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id
"""


# --- q242: source vocabulary similarity ------------------------------------


def q242_source_similarity(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("source", "text")
    counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = counts.select(
        F.col("source").alias("src_a"), "word", F.col("cnt").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("src_b"), "word", F.col("cnt").alias("cb")
    )
    dots = (
        a.join(b, "word")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    norms = counts.groupBy("source").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    na = norms.select(F.col("source").alias("src_a"), F.col("ss").alias("ssa"))
    nb = norms.select(F.col("source").alias("src_b"), F.col("ss").alias("ssb"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("dot").cast("long").alias("dot"),
            F.expr(
                "CAST(dot AS DOUBLE) /"
                " (sqrt(CAST(ssa AS DOUBLE)) * sqrt(CAST(ssb AS DOUBLE)))"
            ).alias("cosine"),
        )
        .orderBy("src_a", "src_b")
    )


Q242_SQL = """
WITH words AS (
  SELECT source, u.word FROM documents,
         UNNEST(string_split(text, ' ')) AS u(word)
  WHERE u.word <> ''),
counts AS (
  SELECT source, word, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
dots AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
  FROM counts a JOIN counts b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2),
norms AS (
  SELECT source, CAST(SUM(cnt * cnt) AS BIGINT) AS ss FROM counts GROUP BY 1)
SELECT src_a, src_b, dot,
       CAST(dot AS DOUBLE) /
         (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cosine
FROM dots
JOIN norms na ON na.source = src_a
JOIN norms nb ON nb.source = src_b
ORDER BY src_a, src_b
"""


# --- q243: DESCRIBE HISTORY -------------------------------------------------


def q243_describe_history(spark, sf_dir):
    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable  # noqa: PLC0415
    from tiledb_mariadb_spark.suite.surfaces import _uri  # noqa: PLC0415

    tt = TileTable.create(
        spark,
        _uri("hist_t", sf_dir),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "string")],
        overwrite=True,
    )
    tt.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    tt.write(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    tt.apply_changes(
        ldf(spark, [(1, None, "delete")], "k int, v string, __op string")
    )
    return tt.history()


Q243_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'write'),
  (CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), 'write'),
  (CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT), 'cdc')
) AS v(version, ts, rows, operation)
ORDER BY version
"""


# --- q244: SCD2 interval build from the version change feed ----------------
# Slowly-changing-dimension type 2: reconstruct each key's attribute
# validity intervals [valid_from, valid_to) from the raw write history
# (read_changes with _version) — keep only value TRANSITIONS (lag
# compare), then lead() closes each interval.  One shuffle on the key;
# the feed itself is partition-pruned fragment reads, so cost scales
# with history size, not table size.
_SCD_N = 40


def q244_scd2_intervals(spark, sf_dir):
    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable  # noqa: PLC0415
    from tiledb_mariadb_spark.suite.surfaces import _uri  # noqa: PLC0415

    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= _SCD_N)
    tt = TileTable.create(
        spark,
        _uri("scd2_part", sf_dir),
        dimensions=[Dim("p_partkey", "bigint")],
        attributes=[Attr("price_cents", "bigint")],
        overwrite=True,
    )
    base = p.select(
        "p_partkey",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    tt.write(base)
    # v2: every 2nd part repriced; v3: every 3rd repriced again, and the
    # every-4th rows rewritten UNCHANGED (must not open a new interval)
    tt.write(
        base.filter(F.col("p_partkey") % 2 == 0).withColumn(
            "price_cents", F.col("price_cents") + 100
        )
    )
    tt.write(
        base.filter(F.col("p_partkey") % 3 == 0)
        .withColumn("price_cents", F.col("price_cents") + 300)
        .unionByName(
            base.filter(
                (F.col("p_partkey") % 4 == 0) & (F.col("p_partkey") % 3 != 0)
            )
        )
    )
    from pyspark.sql.window import Window  # noqa: PLC0415

    feed = tt.read_changes(0, with_version=True)
    w = Window.partitionBy("p_partkey").orderBy("_version")
    transitions = (
        feed.withColumn("prev", F.lag("price_cents").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("price_cents")))
        .withColumn("valid_from", F.col("_version"))
        .withColumn("valid_to", F.lead("_version").over(w))
    )
    return transitions.select(
        "p_partkey",
        "price_cents",
        "valid_from",
        F.coalesce("valid_to", F.lit(-1)).cast("long").alias("valid_to"),
    ).orderBy("p_partkey", "valid_from")


Q244_SQL = f"""
WITH base AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part WHERE p_partkey <= {_SCD_N}),
writes AS (
  SELECT 1 AS ver, p_partkey, price_cents FROM base
  UNION ALL
  SELECT 2, p_partkey, price_cents + 100 FROM base WHERE p_partkey % 2 = 0
  UNION ALL
  SELECT 3, p_partkey, price_cents + 300 FROM base WHERE p_partkey % 3 = 0
  UNION ALL
  SELECT 3, p_partkey, price_cents FROM base
   WHERE p_partkey % 4 = 0 AND p_partkey % 3 <> 0),
tr AS (
  SELECT *,
    LAG(price_cents) OVER (PARTITION BY p_partkey ORDER BY ver) AS prev
  FROM writes),
keep AS (SELECT * FROM tr WHERE prev IS NULL OR prev <> price_cents)
SELECT p_partkey, price_cents, CAST(ver AS BIGINT) AS valid_from,
       CAST(COALESCE(LEAD(ver) OVER (PARTITION BY p_partkey ORDER BY ver), -1)
            AS BIGINT) AS valid_to
FROM keep ORDER BY p_partkey, valid_from
"""


SPECS = [
    QuerySpec(
        "q241_timed_funnel",
        q241_timed_funnel,
        Q241_SQL,
        "time-bounded click→purchase funnel via RANGE-frame window",
    ),
    QuerySpec(
        "q242_source_similarity",
        q242_source_similarity,
        Q242_SQL,
        "source vocabulary cosine-similarity matrix (word-keyed join)",
    ),
    QuerySpec(
        "q243_describe_history",
        q243_describe_history,
        Q243_SQL,
        "DESCRIBE HISTORY: version log as a queryable surface",
    ),
    QuerySpec(
        "q244_scd2_intervals",
        q244_scd2_intervals,
        Q244_SQL,
        "SCD2 validity intervals from the version change feed "
        "(transition-only, unchanged rewrites open no interval)",
    ),
    QuerySpec(
        "q247_khop_reachability",
        lambda spark, sf_dir: q247_khop_reachability(spark, sf_dir),
        None,  # replaced below
    ),
]


# --- q257: year-over-year growth report -------------------------------------
# The standard reporting shape: yearly revenue per nation with absolute
# and relative growth vs the prior year (lag over the tiny aggregated
# series — the window is bounded by nations × years, never the fact
# table).  Relative growth is one exact int64 difference divided once.


def q257_yoy_growth(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    yearly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("rev_cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return (
        yearly.withColumn("prev", F.lag("rev_cents").over(w))
        .select(
            "n_name",
            F.col("yr").cast("long").alias("yr"),
            "rev_cents",
            F.coalesce("prev", F.lit(-1)).cast("long").alias("prev_cents"),
            F.expr(
                "CASE WHEN prev IS NULL THEN NULL ELSE"
                " CAST(rev_cents - prev AS DOUBLE) / CAST(prev AS DOUBLE)"
                " END"
            ).alias("growth"),
        )
        .orderBy("n_name", "yr")
    )


Q257_SQL = """
WITH yearly AS (
  SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, yr),
lagged AS (
  SELECT *, LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY yr) AS prev
  FROM yearly)
SELECT n_name, yr, rev_cents,
       CAST(COALESCE(prev, -1) AS BIGINT) AS prev_cents,
       CASE WHEN prev IS NULL THEN NULL ELSE
         CAST(rev_cents - prev AS DOUBLE) / CAST(prev AS DOUBLE) END AS growth
FROM lagged ORDER BY n_name, yr
"""


# --- q247: k-hop reachability ----------------------------------------------
# Bounded-depth BFS over the deterministic document link graph (same
# derivation as q221/q200): frontier ⋈ edges per hop, distinct on the
# visited set — k joins, each shuffling only the frontier.  The
# unbounded version is connected components (q140); bounded k-hop is the
# "blast radius" / neighborhood-expansion query graph stores run.
_KHOP_OUT = 4
_KHOP_K = 3
_KHOP_SRC = 0


def q247_khop_reachability(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    n_row = F.broadcast(d.agg(F.count(F.lit(1)).alias("n")))
    edges = (
        d.crossJoin(n_row)
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        ((F.col("doc_id") * 7 + j * 13) % F.col("n"))
                        for j in range(1, _KHOP_OUT + 1)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    from pyspark import StorageLevel  # noqa: PLC0415

    from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

    edges = _P.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    visited = ldf(spark,
        [(_KHOP_SRC, 0)], "node bigint, hop int"
    )
    frontier = visited.select("node")
    for hop in range(1, _KHOP_K + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return (
        visited.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .orderBy("hop")
    )


Q247_SQL = f"""
WITH RECURSIVE nn AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS src, (doc_id * 7 + j * 13) % n AS dst
  FROM documents, nn, UNNEST(range(1, {_KHOP_OUT} + 1)) AS t(j)),
edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
bfs(node, hop) AS (
  SELECT CAST({_KHOP_SRC} AS BIGINT), 0
  UNION
  SELECT e.dst, b.hop + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.hop < {_KHOP_K}),
first_seen AS (SELECT node, MIN(hop) AS hop FROM bfs GROUP BY node)
SELECT hop, COUNT(*) AS n_nodes,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(MAX(node) AS BIGINT) AS max_node
FROM first_seen GROUP BY hop ORDER BY hop
"""

SPECS[-1] = QuerySpec(
    "q247_khop_reachability",
    q247_khop_reachability,
    Q247_SQL,
    "bounded-depth BFS neighborhood expansion (frontier joins, "
    "first-seen hop)",
)
SPECS.append(
    QuerySpec(
        "q257_yoy_growth",
        q257_yoy_growth,
        Q257_SQL,
        "year-over-year growth per nation (lag over the bounded rollup)",
    )
)
