"""Corpus-preparation pipeline conformance (q135–q141): deterministic
train/test splitting, stratified sampling, PII redaction, context-window
packing (sequential + greedy), near-dup clustering (connected components),
and heavy-hitter n-gram corpus stats.

These extend the reference surface (TileDB-MariaDB stops at SQL —
``mysql-test/mytile/t/*.test``) with the post-ingest operators a 100 TB
pretraining pipeline needs; every decision is a deterministic function of
the data (md5-derived fractions, not ``rand()``) so the DuckDB oracle
reproduces results bit-for-bit and stage retries are idempotent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import pipeline as P
from tiledb_mariadb_spark.functions import text as X
from tiledb_mariadb_spark.suite import QuerySpec, t


# --- q135: deterministic train/test split ----------------------------------
def q135_train_test_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    split = P.train_test_split(d, "doc_id", test_frac=0.1)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("char_sum"),
        )
    )


Q135_SQL = f"""
SELECT {P.split_case_sql('doc_id', 0.1)} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS char_sum
FROM documents
GROUP BY 1
"""


# --- q136: stratified sampling ---------------------------------------------
_FRACTIONS = {"en": 0.5, "de": 1.0, "zh": 0.25}


def q136_stratified_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return P.stratified_sample(d, "doc_id", "lang", _FRACTIONS).select(
        "doc_id", "lang"
    )


Q136_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {P.hash_fraction_sql("CAST(doc_id AS VARCHAR)", 'strat')}
      < {P.stratified_rate_sql('lang', _FRACTIONS)}
"""


# --- q137: PII redaction ----------------------------------------------------
# The corpus has no real PII, so both engines graft identical synthetic
# emails/phones (derived from doc_id) onto a text prefix, then the operator
# must find and redact exactly those plus anything already present.
def q137_pii_redaction(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    body = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.com t "),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    counts = P.pii_counts(body)
    return d.select(
        "doc_id",
        P.redact_pii(body).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
    )


_BODY_SQL = (
    "(substr(text, 1, 40) || ' u' || CAST(doc_id AS VARCHAR) || '@ex.com t '"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)
_PII_COUNTS = P.pii_counts_sql(_BODY_SQL)
Q137_SQL = f"""
SELECT doc_id,
       {P.redact_pii_sql(_BODY_SQL)} AS redacted,
       {_PII_COUNTS['n_emails']} AS n_emails,
       {_PII_COUNTS['n_phones']} AS n_phones
FROM documents
"""


# --- q138: sequential context-window packing -------------------------------
def q138_pack_sequential(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )
    return P.pack_sequential(d, "doc_id", "n_tokens", window=512)


Q138_SQL = P.pack_sequential_sql(
    "documents", "doc_id", X.token_count_sql("text"), window=512
)


# --- q139: greedy no-straddle packing (applyInPandas per shard) ------------
def q139_pack_greedy(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", X.token_count(F.col("text")).alias("n_tokens"))
    )
    return P.pack_greedy(d, "doc_id", "n_tokens", window=512, num_shards=8)


# Oracle: the greedy recurrence is genuinely sequential per shard, which a
# recursive CTE walks row-by-row (rn = prev rn + 1) — all shards advance in
# parallel per recursion round, depth = rows-per-shard (oracle scale only;
# the Spark operator is the parallel path).
Q139_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT CAST(doc_id % 8 AS BIGINT) AS shard, doc_id,
         CAST({X.token_count_sql('text')} AS BIGINT) AS toks,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id < 400
),
state(shard, rn, doc_id, toks, bin, used) AS (
  SELECT shard, rn, doc_id, toks, CAST(0 AS BIGINT), toks FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.toks,
         CASE WHEN s.used > 0 AND s.used + d.toks > 512
              THEN s.bin + 1 ELSE s.bin END,
         CASE WHEN s.used > 0 AND s.used + d.toks > 512
              THEN d.toks ELSE s.used + d.toks END
  FROM docs d JOIN state s ON d.shard = s.shard AND d.rn = s.rn + 1
)
SELECT shard, doc_id, toks AS n_tokens, bin FROM state
"""


# --- q140: near-dup clustering (connected components over LSH edges) -------
def _corpus60(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    copies = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return d.unionByName(copies)


_CORPUS60_SQL = """
SELECT doc_id, text FROM documents WHERE doc_id < 60
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 60
"""


def q140_dedup_clusters(spark, sf_dir):
    corpus = _corpus60(spark, sf_dir)
    sh = D.with_shingles(corpus, "doc_id", "text", k=3)
    sigs = D.minhash_signatures(sh, "doc_id", num_hashes=8)
    edges = D.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, rows_per_band=2)
    nodes = corpus.select(F.col("doc_id").alias("node"))
    return P.connected_components(edges, nodes)


_EDGES_CTE = D.lsh_pairs_sql(
    D.minhash_sql(
        D.shingles_sql(f"({_CORPUS60_SQL})", "doc_id", "text", k=3),
        "doc_id",
        num_hashes=8,
    ),
    num_hashes=8,
    rows_per_band=2,
)
Q140_SQL = P.connected_components_sql(
    _EDGES_CTE, f"SELECT doc_id AS node FROM ({_CORPUS60_SQL})"
)


# --- q141: heavy-hitter n-gram corpus stats --------------------------------
def q141_topk_ngrams(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    sh = D.with_shingles(d, "doc_id", "text", k=3)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("shingle"))
        .limit(20)
    )


_SHINGLES_300 = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id < 300)", "doc_id", "text", k=3
)
Q141_SQL = f"""
SELECT shingle, CAST(COUNT(*) AS BIGINT) AS cnt
FROM ({_SHINGLES_300})
GROUP BY shingle
ORDER BY cnt DESC, shingle
LIMIT 20
"""


# --- q144: intra-document repetition ratio ---------------------------------
# Quality signal: fraction of a document's word-3-grams that are repeats
# (1 - distinct/total).  High ratio = boilerplate/spam; corpus pipelines
# gate on it before training.  Both aggregates are PER-document and every
# shingle of a document lives in its own row, so this never needs the
# explode + groupBy shape: build the shingle array in place and take
# size / size(array_distinct) — a pure map-side projection, ZERO shuffle
# (the explode version moved the whole shingled corpus, ~10x the text
# bytes, through an exchange; at 100 TB that is the difference between a
# scan-rate job and a shuffle-bound one).  tests/test_plans.py pins the
# no-Exchange plan.
def q144_repetition_ratio(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    k = 3
    # Stage ws, then arr, as their own projection columns: a split or
    # transform referenced from inside a later lambda body is re-evaluated
    # PER ELEMENT (no CSE across lambdas — see the verify recipe), which
    # made this scan O(tokens^2) per doc before staging.
    staged = d.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("ws")
    ).select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(ws) - {k - 1}),"
            f" i -> concat_ws(' ', slice(ws, i, {k})))"
        ).alias("arr"),
    )
    return staged.select(
        "doc_id",
        F.size(F.col("arr")).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(F.col("arr"))).cast("long").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_ngrams",
        "n_distinct",
        (
            F.lit(1.0) - F.col("n_distinct") / F.col("n_ngrams").cast("double")
        ).alias("rep_ratio"),
    )


_SHINGLES_ALL = D.shingles_sql("documents", "doc_id", "text", k=3)
Q144_SQL = f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct,
       (1.0 - COUNT(DISTINCT shingle) / CAST(COUNT(*) AS DOUBLE)) AS rep_ratio
FROM ({_SHINGLES_ALL})
GROUP BY doc_id
"""


# --- q145: per-source corpus report ----------------------------------------
# The "corpus dashboard" aggregate a data-curation team runs after every
# ingest: volume, token mass, language spread, and exact-dup rate per
# source.  One hash shuffle on the (low-cardinality) source key; the
# md5-distinct rides the same shuffle.
def q145_corpus_report(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("char_sum"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(X.token_count(F.col("text"))).cast("long").alias("tok_sum"),
        F.countDistinct(F.md5(F.col("text"))).cast("long").alias("n_unique_texts"),
    )


Q145_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS char_sum,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM({X.token_count_sql('text')}) AS BIGINT) AS tok_sum,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
FROM documents
GROUP BY source
"""


# --- q146: composite quality gate ------------------------------------------
# Pre-training document gate: length band + stopword-density floor, with
# per-check booleans kept so rejected docs are auditable.  Pure map —
# no shuffle; the checks reuse the q60-verified feature expressions.
def q146_quality_gate(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    feats = X.quality_features(F.col("text"))
    pass_len = feats["n_tokens"].between(5, 500)
    pass_stop = feats["stop_ratio"] >= 0.01
    return d.select(
        "doc_id",
        "lang",
        pass_len.alias("pass_len"),
        pass_stop.alias("pass_stop"),
        (pass_len & pass_stop).alias("keep"),
    )


_QF146 = X.quality_features_sql("text")
Q146_SQL = f"""
SELECT doc_id, lang,
       ({_QF146['n_tokens']} BETWEEN 5 AND 500) AS pass_len,
       ({_QF146['stop_ratio']} >= 0.01) AS pass_stop,
       (({_QF146['n_tokens']} BETWEEN 5 AND 500)
        AND ({_QF146['stop_ratio']} >= 0.01)) AS keep
FROM documents
"""


# --- q147: per-user training-sequence construction -------------------------
# Behavioral-sequence shape: each user's event types in (ts, event_id)
# order, truncated to a max context length.  collect_list is made
# deterministic by sorting (ts, event_id, type) structs inside the group
# — one shuffle on user_id, order-insensitive upstream.
def q147_train_sequences(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.expr(
            "array_join(slice(transform(array_sort(collect_list("
            "struct(ts, event_id, event_type))), x -> x.event_type), 1, 50), ',')"
        ).alias("seq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.least(F.count(F.lit(1)), F.lit(50)).cast("long").alias("seq_len"),
    )


Q147_SQL = """
SELECT user_id,
       array_to_string(list_slice(
         list(event_type ORDER BY ts, event_id), 1, 50), ',') AS seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(LEAST(COUNT(*), 50) AS BIGINT) AS seq_len
FROM events
GROUP BY user_id
"""


# --- q149: benchmark decontamination ---------------------------------------
# Find training documents that share ≥ MIN_HITS distinct word-3-grams
# with any benchmark document — the standard pre-training decontamination
# sweep.  The benchmark side is tiny (it's an eval set), so its distinct
# shingles BROADCAST to the corpus scan: the overlap join is map-side,
# and the only shuffle is the per-(train,bench) overlap count on doc-id
# pairs.  At 100 TB the corpus side streams through unchanged.
_MIN_HITS = 3


def q149_decontamination(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") < 20)
    train = d.filter(F.col("doc_id") >= 20)
    bsh = (
        D.with_shingles(bench, "doc_id", "text", k=3)
        .select(F.col("doc_id").alias("bench_id"), "shingle")
        .distinct()
    )
    tsh = D.with_shingles(train, "doc_id", "text", k=3).select(
        F.col("doc_id").alias("train_id"), "shingle"
    ).distinct()
    hits = (
        tsh.join(F.broadcast(bsh), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_HITS)
    )
    return hits


_TRAIN_SH = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id >= 20)", "doc_id", "text", k=3
)
_BENCH_SH = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id < 20)", "doc_id", "text", k=3
)
Q149_SQL = f"""
WITH tsh AS (SELECT DISTINCT doc_id AS train_id, shingle FROM ({_TRAIN_SH})),
bsh AS (SELECT DISTINCT doc_id AS bench_id, shingle FROM ({_BENCH_SH}))
SELECT train_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tsh JOIN bsh USING (shingle)
GROUP BY train_id, bench_id
HAVING COUNT(*) >= {_MIN_HITS}
"""


# --- q150: funnel analysis (ordered event progression) ---------------------
# Per-user view → click → purchase progression where each step must
# strictly follow the previous one in event time.  Three filtered min
# aggregates chained by user_id joins — each is one keyed shuffle and the
# later stages shrink (only users who completed the previous step),
# which is exactly how this runs over a 100 TB event log.
def q150_funnel(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    us = F.unix_micros
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            us("t_view").alias("t_view_us"),
            us("t_click").alias("t_click_us"),
            us("t_purchase").alias("t_purchase_us"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).cast("long").alias("depth"),
        )
    )


Q150_SQL = """
WITH v AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
  GROUP BY e.user_id)
SELECT user_id,
       epoch_us(t_view) AS t_view_us,
       epoch_us(t_click) AS t_click_us,
       epoch_us(t_purchase) AS t_purchase_us,
       CAST(1 + CAST(t_click IS NOT NULL AS INTEGER)
              + CAST(t_purchase IS NOT NULL AS INTEGER) AS BIGINT) AS depth
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


# --- q151: cohort retention ------------------------------------------------
# Users grouped by first-seen week; how many are active k weeks later.
# Week index is integer epoch arithmetic (not date_trunc) so the bucket
# boundaries are engine-independent by construction.
_WEEK_US = 7 * 86_400 * 1_000_000


def q151_cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    wk = (F.unix_micros(F.col("ts")) / _WEEK_US).cast("long")
    activity = e.select("user_id", wk.alias("week_idx")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


Q151_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US} AS week_idx
  FROM events),
cohorts AS (
  SELECT user_id, MIN(week_idx) AS cohort_week FROM activity GROUP BY user_id)
SELECT cohort_week, (week_idx - cohort_week) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM activity JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


# --- q152: aggregates over multi-value attributes ---------------------------
# The reference CANNOT aggregate multi-valued attributes (README.md Known
# Issues: "Aggregates on multi-valued attributes are not supported") —
# Spark's higher-order functions make it a per-row fold feeding a normal
# partial+final aggregate, so this engine supports it as a superset.
# Exact int-scaled arithmetic keeps the float sum oracle-reproducible.
def q152_multivalue_agg(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    # CAST to DOUBLE before scaling on BOTH engines: float32*decimal
    # promotes differently (Spark→double, DuckDB→float) and a rounding
    # tie then lands on different sides.  float→double is exact, double
    # multiply is one IEEE op, so the rounded products are identical.
    elem_sum = F.expr(
        "aggregate(embedding, CAST(0 AS BIGINT),"
        " (acc, x) -> acc + CAST(ROUND(CAST(x AS DOUBLE) * 10000.0D) AS BIGINT))"
    )
    return (
        e.select("label", elem_sum.alias("s"), F.size("embedding").alias("n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("n").cast("long").alias("n_elements"),
            (F.sum("s").cast("double") / F.lit(10000.0)).alias("elem_sum"),
            (F.max("s").cast("double") / F.lit(10000.0)).alias("max_vec_sum"),
        )
    )


Q152_SQL = """
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(len(embedding)) AS BIGINT) AS n_elements,
       (CAST(SUM(s) AS DOUBLE) / 10000.0) AS elem_sum,
       (CAST(MAX(s) AS DOUBLE) / 10000.0) AS max_vec_sum
FROM (
  SELECT label, embedding,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)))
           AS BIGINT) AS s
  FROM embeddings)
GROUP BY label
"""


# --- q154: text normalization → canonical fingerprint ----------------------
# Normalize-then-hash is what makes exact dedup robust to case/whitespace
# noise; the normalized fingerprint must match the oracle byte-for-byte.
def q154_normalize_text(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    norm = X.normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        F.md5(norm.cast("binary")).alias("norm_fp"),
    )


Q154_SQL = f"""
SELECT doc_id,
       CAST(LENGTH({X.normalize_text_sql('text')}) AS BIGINT) AS norm_len,
       md5({X.normalize_text_sql('text')}) AS norm_fp
FROM documents
"""


# --- q155: n-gram containment (partial-duplication / quotation) ------------
# Containment = |A∩B| / min(|A|,|B|) catches a small doc quoted inside a
# big one, which symmetric Jaccard misses.  Same candidate-confined shape
# as the q66 verify stage.
def q155_containment(spark, sf_dir):
    corpus = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).select(
        "doc_id", "text"
    )
    from pyspark import StorageLevel  # noqa: PLC0415

    # three consumers (pair join both sides + per-doc counts): persist so
    # the shingle pipeline runs once, not once per subtree
    sh = (
        D.with_shingles(corpus, "doc_id", "text", k=3)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("inter") / F.least("na", "nb").cast("double")).alias(
                "containment"
            ),
        )
    )


_SH30 = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id < 30)", "doc_id", "text", k=3
)
Q155_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SH30})),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id)
SELECT a, b, CAST(inter AS BIGINT) AS inter,
       (inter / CAST(LEAST(ca.n, cb.n) AS DOUBLE)) AS containment
FROM inter
JOIN counts ca ON ca.doc_id = a
JOIN counts cb ON cb.doc_id = b
"""


# --- q156: skew-salted aggregation + join (driver-verified) -----------------
# The salting operators (operators/skew.py) spread a hot key over
# (key, salt) reducers; results must equal the plain shapes exactly.
# l_returnflag is 3 keys over 600k rows at sf0.1 — the canonical
# all-keys-hot aggregation.
def q156_salted_agg(spark, sf_dir):
    from tiledb_mariadb_spark.operators.skew import salted_agg_count, salted_join

    li = t(spark, sf_dir, "lineitem")
    counts = salted_agg_count(li, "l_returnflag", n_salts=8).withColumnRenamed(
        "n", "n_rows"
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(
        cust.withColumnRenamed("c_nationkey", "n_nationkey"), nat,
        on=["n_nationkey"], n_salts=4,
    )
    per_nation = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return counts.crossJoin(
        per_nation.agg(
            F.count(F.lit(1)).cast("long").alias("n_nations_with_customers"),
            F.sum("n_customers").cast("long").alias("n_cust_total"),
        )
    ).select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_rows"),
        "n_nations_with_customers",
        "n_cust_total",
    )


Q156_SQL = """
WITH counts AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_returnflag),
pern AS (
  SELECT n_name, COUNT(*) AS n_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations_with_customers,
         CAST(SUM(n_customers) AS BIGINT) AS n_cust_total
  FROM pern)
SELECT l_returnflag, n_rows, n_nations_with_customers, n_cust_total
FROM counts CROSS JOIN tot
"""


# --- q157: bucketed co-located join (driver-verified) ----------------------
# Both sides bucketed on the join key at write time → the recurring join
# runs exchange-free (the 100 TB shuffle eliminator; zero-exchange plan
# asserted in tests/test_bucketing.py).  The spec verifies the RESULTS
# equal a plain join via the oracle.
def q157_bucketed_join(spark, sf_dir):
    from tiledb_mariadb_spark.operators.bucketing import (  # noqa: PLC0415
        bucket_table,
        joined_bucketed,
    )
    from tiledb_mariadb_spark.suite.scratch import sql_tag  # noqa: PLC0415

    # bucket_table's overwrite clears stale registrations AND orphaned
    # warehouse dirs, so repeat driver runs (fresh session, same disk)
    # are idempotent; the PID suffix keeps concurrent processes disjoint.
    tag = sql_tag(sf_dir)
    cn, on = f"q157_cust_{tag}", f"q157_ord_{tag}"
    bucket_table(
        t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        cn, ["c_custkey"], num_buckets=8,
    )
    bucket_table(
        t(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("c_custkey"), "o_totalprice"
        ),
        on, ["c_custkey"], num_buckets=8,
    )
    from tiledb_mariadb_spark.suite import dsum  # noqa: PLC0415

    joined = joined_bucketed(spark, cn, on, ["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("price_sum"),
    )


from tiledb_mariadb_spark.suite import dsum_sql  # noqa: E402

Q157_SQL = f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dsum_sql('o_totalprice')} AS price_sum
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# --- q158: corpus mixing (importance reweighting) ---------------------------
_MIX = {"zh": 2.5, "de": 1.0, "en": 0.5}


def q158_corpus_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return P.mix_corpus(d, "doc_id", "lang", _MIX).select(
        "doc_id", "lang", F.col("copy_idx").cast("long").alias("copy_idx")
    )


_RATE = P.mix_rate_sql("lang", _MIX)
_FRAC = P.hash_fraction_sql("CAST(doc_id AS VARCHAR)", "mix")
Q158_SQL = f"""
SELECT doc_id, lang, CAST(i.i AS BIGINT) AS copy_idx
FROM (
  SELECT doc_id, lang,
         CAST(FLOOR({_RATE}) AS BIGINT)
           + CAST(({_FRAC} < {_RATE} - FLOOR({_RATE})) AS BIGINT) AS n
  FROM documents),
  UNNEST(range(1, n + 1)) AS i(i)
WHERE n > 0
"""


# --- q142: approx sketches alongside exact (the 100 TB alternative) -------
# HLL / quantile-sketch internals differ between engines, so the spec
# hash-compares the EXACT values plus engine-local *error-bound* booleans:
# each engine checks its own sketch against its own exact answer.  Both
# sketches are deterministic per engine, so the booleans are stable.
def q142_approx_sketches(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("l_partkey").cast("long").alias("n_approx"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "med_exact"
        ),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("med_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            < 0.05
        ).alias("distinct_err_ok"),
        F.col("med_exact").cast("double").alias("med_exact"),
        (
            F.abs(F.col("med_approx") - F.col("med_exact")).cast("double") < 1.0
        ).alias("median_err_ok"),
    )


Q142_SQL = """
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       (abs(n_approx - n_exact) / CAST(n_exact AS DOUBLE) < 0.05) AS distinct_err_ok,
       CAST(med_exact AS DOUBLE) AS med_exact,
       (CAST(abs(med_approx - med_exact) AS DOUBLE) < 1.0) AS median_err_ok
FROM (
  SELECT COUNT(DISTINCT l_partkey) AS n_exact,
         approx_count_distinct(l_partkey) AS n_approx,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_exact,
         approx_quantile(l_quantity, 0.5) AS med_approx
  FROM lineitem
)
"""


SPECS = [
    QuerySpec(
        "q135_train_test_split", q135_train_test_split, Q135_SQL,
        "deterministic hash-keyed train/test split",
    ),
    QuerySpec(
        "q136_stratified_sample", q136_stratified_sample, Q136_SQL,
        "stratified sampling by lang (deterministic)",
    ),
    QuerySpec(
        "q137_pii_redaction", q137_pii_redaction, Q137_SQL,
        "PII redaction + counts (regexp chain)",
    ),
    QuerySpec(
        "q138_pack_sequential", q138_pack_sequential, Q138_SQL,
        "concat-then-chunk context-window packing",
    ),
    QuerySpec(
        "q139_pack_greedy", q139_pack_greedy, Q139_SQL,
        "greedy no-straddle bin packing (applyInPandas/shard)",
    ),
    QuerySpec(
        "q140_dedup_clusters", q140_dedup_clusters, Q140_SQL,
        "near-dup clustering: connected components over LSH edges",
    ),
    QuerySpec(
        "q141_topk_ngrams", q141_topk_ngrams, Q141_SQL,
        "top-k n-gram heavy hitters",
    ),
    QuerySpec(
        "q142_approx_sketches", q142_approx_sketches, Q142_SQL,
        "approx_count_distinct / approx_percentile vs exact (error-bounded)",
    ),
    QuerySpec(
        "q144_repetition_ratio", q144_repetition_ratio, Q144_SQL,
        "intra-document n-gram repetition ratio (quality gate)",
    ),
    QuerySpec(
        "q145_corpus_report", q145_corpus_report, Q145_SQL,
        "per-source corpus report (volume/tokens/langs/dup rate)",
    ),
    QuerySpec(
        "q146_quality_gate", q146_quality_gate, Q146_SQL,
        "composite quality gate with auditable per-check booleans",
    ),
    QuerySpec(
        "q147_train_sequences", q147_train_sequences, Q147_SQL,
        "per-user ordered event sequences, truncated to max length",
    ),
    QuerySpec(
        "q149_decontamination", q149_decontamination, Q149_SQL,
        "benchmark decontamination: shared distinct n-grams ≥ threshold",
    ),
    QuerySpec(
        "q150_funnel", q150_funnel, Q150_SQL,
        "funnel analysis: ordered view→click→purchase progression",
    ),
    QuerySpec(
        "q151_cohort_retention", q151_cohort_retention, Q151_SQL,
        "cohort retention by first-seen week (integer week buckets)",
    ),
    QuerySpec(
        "q152_multivalue_agg", q152_multivalue_agg, Q152_SQL,
        "aggregates over multi-value attributes (reference cannot)",
    ),
    QuerySpec(
        "q154_normalize_text", q154_normalize_text, Q154_SQL,
        "text normalization → canonical fingerprint",
    ),
    QuerySpec(
        "q155_containment", q155_containment, Q155_SQL,
        "n-gram containment (partial-dup / quotation detection)",
    ),
    QuerySpec(
        "q156_salted_agg", q156_salted_agg, Q156_SQL,
        "skew-salted aggregation + join equal the plain shapes",
    ),
    QuerySpec(
        "q157_bucketed_join", q157_bucketed_join, Q157_SQL,
        "bucketed co-located join (exchange-free) equals plain join",
    ),
    QuerySpec(
        "q158_corpus_mix", q158_corpus_mix, Q158_SQL,
        "deterministic corpus mixing (fractional repetition weights)",
    ),
]
