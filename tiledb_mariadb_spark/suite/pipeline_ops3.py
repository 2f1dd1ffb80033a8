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


# --- q187: Luhn-validated card-number detection ----------------------------
# The corpus has no real PII (and no digits at all), so both engines graft
# a deterministic 16-digit candidate derived from doc_id — roughly 1 in 10
# passes the Luhn checksum — and the operator must (a) find the candidate,
# (b) validate it with the fully-unrolled integer Luhn expression, and
# (c) redact ONLY valid numbers (checksum validation is what separates a
# card-number scrubber from a "mask every long number" heuristic).
def q187_luhn_pii(spark, sf_dir):
    from tiledb_mariadb_spark.functions import pipeline as P  # noqa: PLC0415

    d = t(spark, sf_dir, "documents")
    body = F.concat(
        F.substring(F.col("text"), 1, 30),
        F.lit(" card "),
        F.lpad((F.col("doc_id") * 7919 % 100000000).cast("string"), 8, "4"),
        F.lpad((F.col("doc_id") * 104729 % 100000000).cast("string"), 8, "1"),
    )
    staged = d.select(
        "doc_id",
        body.alias("body"),
        F.regexp_extract(body, P.CCN_RE, 0).alias("ccn"),
    )
    valid = F.expr(P.luhn_valid_expr("ccn"))
    return staged.select(
        "doc_id",
        "ccn",
        valid.cast("int").alias("luhn_valid"),
        F.when(valid, F.expr("replace(body, ccn, '<CCN>')"))
        .otherwise(F.col("body"))
        .alias("redacted"),
    )


def _q187_sql() -> str:
    from tiledb_mariadb_spark.functions import pipeline as P  # noqa: PLC0415

    body = (
        "(substr(text, 1, 30) || ' card '"
        " || lpad(CAST(doc_id * 7919 % 100000000 AS VARCHAR), 8, '4')"
        " || lpad(CAST(doc_id * 104729 % 100000000 AS VARCHAR), 8, '1'))"
    )
    valid = P.luhn_valid_sql("ccn")
    return f"""
WITH staged AS (
  SELECT doc_id, {body} AS body,
         COALESCE(regexp_extract({body}, '{P.CCN_RE}'), '') AS ccn
  FROM documents)
SELECT doc_id, ccn, CAST({valid} AS INT) AS luhn_valid,
       CASE WHEN {valid} THEN REPLACE(body, ccn, '<CCN>') ELSE body END AS redacted
FROM staged
"""


# --- q188: corpus-frequency rarity score -----------------------------------
# Per-document "how unusual is this text": the mean corpus frequency of
# the document's word-3-grams.  Boilerplate scores high (its shingles are
# everywhere), novel text scores low — the cheap distributional
# complement to the intra-doc repetition gate (q144).  ONE shuffle: the
# global shingle frequency comes from a count window over the shingle
# partition (not groupBy + join-back — same trick as q183), then the
# per-doc aggregate rides the doc key.
def q188_rarity_score(spark, sf_dir):
    from pyspark.sql.window import Window  # noqa: PLC0415

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    sh = D.with_shingles(d, "doc_id", "text", k=3)
    freq = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("freq", freq)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("freq").cast("long").alias("freq_sum"),
        )
        .select(
            "doc_id",
            "n_grams",
            "freq_sum",
            (F.col("freq_sum") / F.col("n_grams").cast("double")).alias(
                "mean_freq"
            ),
        )
    )


_SH_ALL = D.shingles_sql("documents", "doc_id", "text", k=3)
Q188_SQL = f"""
WITH sh AS ({_SH_ALL}),
fr AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS freq FROM sh)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(freq) AS BIGINT) AS freq_sum,
       (SUM(freq) / CAST(COUNT(*) AS DOUBLE)) AS mean_freq
FROM fr GROUP BY doc_id
"""


# --- q189: BPE-style vocab induction (iterative merges) --------------------
# Three unrolled rounds of byte-pair-encoding-style merge learning over
# the word stream: count adjacent-token pairs, adopt the most frequent
# (deterministic count-desc/pair-asc tiebreak), rewrite the corpus with
# the merged token, repeat.  Fully declarative — the per-round argmax is
# a broadcast 1-row join, the rewrite is a map-side replace; no driver
# collect.  Three rounds keeps the recomputed lineage cheap; a real vocab
# run would localCheckpoint each round (like q140's label propagation).
# NB replace() is non-overlapping left-to-right in BOTH engines, so
# immediately-adjacent repeats of the best pair merge identically.
_BPE_ROUNDS = 3


def q189_bpe_merges(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    c = d.select("doc_id", F.col("text").alias("c"))
    outs = []
    for r in range(_BPE_ROUNDS):
        sh = D.with_shingles(
            c.select("doc_id", F.col("c").alias("text")), "doc_id", "text", k=2
        )
        best = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "shingle")
            .limit(1)
            .select(F.col("shingle").alias("pair"), "n")
        )
        outs.append(
            best.select(
                F.lit(r + 1).cast("long").alias("round"),
                "pair",
                F.col("n").cast("long").alias("n"),
            )
        )
        c = c.crossJoin(F.broadcast(best)).select(
            "doc_id",
            F.expr(
                "trim(replace(concat(' ', c, ' '), concat(' ', pair, ' '),"
                " concat(' ', replace(pair, ' ', '_'), ' ')))"
            ).alias("c"),
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionAll(nxt)
    return out


def _q189_sql() -> str:
    parts = ["c0 AS (SELECT doc_id, text AS c FROM documents)"]
    for r in range(_BPE_ROUNDS):
        sh = D.shingles_sql(
            f"(SELECT doc_id, c AS text FROM c{r})", "doc_id", "text", k=2
        )
        parts.append(
            f"p{r} AS (SELECT shingle AS pair, COUNT(*) AS n FROM ({sh})"
            " GROUP BY 1)"
        )
        parts.append(f"b{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1)")
        parts.append(
            f"c{r + 1} AS (SELECT doc_id, TRIM(REPLACE(' ' || c || ' ',"
            f" ' ' || (SELECT pair FROM b{r}) || ' ',"
            f" ' ' || REPLACE((SELECT pair FROM b{r}), ' ', '_') || ' ')) AS c"
            f" FROM c{r})"
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round, pair, CAST(n AS BIGINT) AS n FROM b{r}"
        for r in range(_BPE_ROUNDS)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


# --- q190: product-quantization ANN (PQ codes + ADC + exact re-rank) -------
# 64x memory compression: each 64-dim float32 embedding becomes ONE
# BIGINT of 8 packed 4-bit codes (functions/pq.py — Jegou et al. 2011).
# Codebooks are pretrained on the fixed reference sample and inlined as
# scaled-int literals.  Two-phase production shape: (1) integer ADC
# scoring over the CODES ONLY ranks the whole corpus and takes a
# 100-candidate shortlist (map-only codegen + TakeOrderedAndProject — at
# scale this phase touches 4 bytes/vector, not 256); (2) the shortlist is
# re-ranked by the exact scaled-int dot product (full vectors read for
# 100 rows only).  Shortlist-100 recovers the exact top-10 completely on
# the reference sample (recall pinned in tests/test_ranking.py).
_PQ_SHORTLIST = 100


def q190_pq_ann(spark, sf_dir):
    from tiledb_mariadb_spark.functions import pq as Q  # noqa: PLC0415

    books = Q.train_codebooks()
    qs = Q.query_scaled()
    lut = Q.adc_lut(books, qs)
    e = t(spark, sf_dir, "embeddings")
    staged = e.select(
        "vec_id", F.expr(Q.scaled_vec_spark("embedding")).alias("sv")
    )
    dcols = staged.select(
        "vec_id",
        "sv",
        *[
            F.expr(Q.dist_array_spark("sv", j, books)).alias(f"dl{j}")
            for j in range(Q.M)
        ],
    )
    packed = dcols.select(
        "vec_id",
        "sv",
        F.expr(
            Q.packed_expr(
                [Q.code_from_dists_spark(f"dl{j}") for j in range(Q.M)]
            )
        ).alias("pq_code"),
    )
    scored = packed.select(
        "vec_id",
        "sv",
        "pq_code",
        F.expr(Q.adc_score_spark("pq_code", lut)).alias("adc_score"),
    )
    shortlist = scored.orderBy(F.col("adc_score").desc(), "vec_id").limit(
        _PQ_SHORTLIST
    )
    qarr = ", ".join(f"{v}L" for v in qs)
    exact = (
        f"aggregate(zip_with(sv, array({qarr}), (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        shortlist.select(
            "vec_id", "pq_code", "adc_score", F.expr(exact).alias("dot")
        )
        .orderBy(F.col("dot").desc(), "vec_id")
        .limit(10)
    )


def _q190_sql() -> str:
    from tiledb_mariadb_spark.functions import pq as Q  # noqa: PLC0415

    books = Q.train_codebooks()
    qs = Q.query_scaled()
    lut = Q.adc_lut(books, qs)
    dls = ", ".join(
        f"{Q.dist_array_sql('sv', j, books)} AS dl{j}" for j in range(Q.M)
    )
    packed = Q.packed_expr(
        [Q.code_from_dists_sql(f"dl{j}") for j in range(Q.M)]
    )
    qarr = ", ".join(str(v) for v in qs)
    exact = (
        f"CAST(list_sum(list_transform(sv, (x, i) -> x * ([{qarr}])[i]))"
        " AS BIGINT)"
    )
    return f"""
WITH s AS (SELECT vec_id, {Q.scaled_vec_sql('embedding')} AS sv FROM embeddings),
d AS (SELECT vec_id, sv, {dls} FROM s),
p AS (SELECT vec_id, sv, {packed} AS pq_code FROM d),
sc AS (SELECT vec_id, sv, pq_code, {Q.adc_score_sql('pq_code', lut)} AS adc_score FROM p),
sl AS (SELECT * FROM sc ORDER BY adc_score DESC, vec_id LIMIT {_PQ_SHORTLIST})
SELECT vec_id, pq_code, adc_score, {exact} AS dot
FROM sl
ORDER BY dot DESC, vec_id
LIMIT 10
"""


# --- q191: IVF+PQ — coarse lists + residual codes + per-list ADC -----------
# FAISS-style IVFPQ (Jegou et al. 2011 §IV) as one declarative plan: a
# pretrained coarse quantizer assigns each vector to one of 8 inverted
# lists; the vector stores only the packed 4-bit PQ code of its RESIDUAL
# from the list centroid.  Search probes the nprobe=4 lists nearest the
# query (driver-side int math on the tiny centroid table — at scale the
# lists are stored partitions, so the IN-filter below is partition
# pruning, exactly like functions/ivf.py), scores the probed ~half of
# the corpus with a per-list ADC lookup table, and exact-re-ranks the
# 100-candidate shortlist.  Integer end-to-end.
def q191_ivfpq(spark, sf_dir):
    from tiledb_mariadb_spark.functions import pq as Q  # noqa: PLC0415

    coarse = Q.train_coarse()
    books = Q.train_residual_codebooks()
    qs = Q.query_scaled()
    probed = Q.probe_lists_py(qs, coarse)
    luts = {
        lid: Q.adc_lut(
            books, tuple(q - c for q, c in zip(qs, coarse[lid]))
        )
        for lid in probed
    }
    e = t(spark, sf_dir, "embeddings")
    staged = e.select(
        "vec_id", F.expr(Q.scaled_vec_spark("embedding")).alias("sv")
    )
    cd = staged.select(
        "vec_id", "sv", F.expr(Q.coarse_dists_spark("sv", coarse)).alias("cd")
    )
    assigned = cd.select(
        "vec_id",
        "sv",
        F.expr("(array_position(cd, array_min(cd)) - 1)").alias("list_id"),
    )
    pruned = assigned.filter(F.col("list_id").isin(probed))
    res = pruned.select(
        "vec_id",
        "list_id",
        "sv",
        F.expr(Q.residual_spark("sv", "list_id", coarse)).alias("rv"),
    )
    dcols = res.select(
        "vec_id",
        "list_id",
        "sv",
        *[
            F.expr(Q.dist_array_spark("rv", j, books)).alias(f"dl{j}")
            for j in range(Q.M)
        ],
    )
    packed = dcols.select(
        "vec_id",
        "list_id",
        "sv",
        F.expr(
            Q.packed_expr(
                [Q.code_from_dists_spark(f"dl{j}") for j in range(Q.M)]
            )
        ).alias("pq_code"),
    )
    case = (
        "CASE list_id "
        + " ".join(
            f"WHEN {lid} THEN {Q.adc_score_spark('pq_code', luts[lid])}"
            for lid in probed
        )
        + " ELSE CAST(0 AS BIGINT) END"
    )
    scored = packed.select(
        "vec_id", "list_id", "sv", "pq_code", F.expr(case).alias("adc_score")
    )
    shortlist = scored.orderBy(F.col("adc_score").desc(), "vec_id").limit(
        _PQ_SHORTLIST
    )
    qarr = ", ".join(f"{v}L" for v in qs)
    exact = (
        f"aggregate(zip_with(sv, array({qarr}), (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        shortlist.select(
            "vec_id", "list_id", "pq_code", "adc_score",
            F.expr(exact).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), "vec_id")
        .limit(10)
    )


def _q191_sql() -> str:
    from tiledb_mariadb_spark.functions import pq as Q  # noqa: PLC0415

    coarse = Q.train_coarse()
    books = Q.train_residual_codebooks()
    qs = Q.query_scaled()
    probed = Q.probe_lists_py(qs, coarse)
    luts = {
        lid: Q.adc_lut(
            books, tuple(q - c for q, c in zip(qs, coarse[lid]))
        )
        for lid in probed
    }
    dls = ", ".join(
        f"{Q.dist_array_sql('rv', j, books)} AS dl{j}" for j in range(Q.M)
    )
    packed = Q.packed_expr(
        [Q.code_from_dists_sql(f"dl{j}") for j in range(Q.M)]
    )
    case = (
        "CASE list_id "
        + " ".join(
            f"WHEN {lid} THEN {Q.adc_score_sql('pq_code', luts[lid])}"
            for lid in probed
        )
        + " ELSE CAST(0 AS BIGINT) END"
    )
    qarr = ", ".join(str(v) for v in qs)
    exact = (
        f"CAST(list_sum(list_transform(sv, (x, i) -> x * ([{qarr}])[i]))"
        " AS BIGINT)"
    )
    in_list = ", ".join(str(lid) for lid in probed)
    return f"""
WITH s AS (SELECT vec_id, {Q.scaled_vec_sql('embedding')} AS sv FROM embeddings),
a AS (SELECT vec_id, sv, {Q.coarse_dists_sql('sv', coarse)} AS cd FROM s),
l AS (SELECT vec_id, sv, (list_position(cd, list_min(cd)) - 1) AS list_id FROM a),
f AS (SELECT * FROM l WHERE list_id IN ({in_list})),
r AS (SELECT vec_id, list_id, sv, {Q.residual_sql('sv', 'list_id', coarse)} AS rv FROM f),
d AS (SELECT vec_id, list_id, sv, {dls} FROM r),
p AS (SELECT vec_id, list_id, sv, {packed} AS pq_code FROM d),
sc AS (SELECT vec_id, list_id, sv, pq_code, {case} AS adc_score FROM p),
sl AS (SELECT * FROM sc ORDER BY adc_score DESC, vec_id LIMIT {_PQ_SHORTLIST})
SELECT vec_id, CAST(list_id AS BIGINT) AS list_id, pq_code, adc_score, {exact} AS dot
FROM sl
ORDER BY dot DESC, vec_id
LIMIT 10
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
    QuerySpec(
        "q187_luhn_pii",
        q187_luhn_pii,
        _q187_sql(),
        "Luhn-validated card-number detection and selective redaction",
    ),
    QuerySpec(
        "q188_rarity_score",
        q188_rarity_score,
        Q188_SQL,
        "corpus-frequency rarity score (mean 3-gram frequency per doc)",
    ),
    QuerySpec(
        "q189_bpe_merges",
        q189_bpe_merges,
        _q189_sql(),
        "BPE-style vocab induction: 3 declarative merge rounds",
    ),
    QuerySpec(
        "q190_pq_ann",
        q190_pq_ann,
        _q190_sql(),
        "product-quantization ANN: packed 4-bit codes + integer ADC top-k",
    ),
    QuerySpec(
        "q191_ivfpq",
        q191_ivfpq,
        _q191_sql(),
        "IVF+PQ: coarse list pruning + residual codes + per-list ADC",
    ),
]
