"""Training-data pipeline operators over the ``documents`` table:
text analysis, fingerprinting, exact dedup, MinHash+LSH near-dup,
n-gram Jaccard, SimHash, multimodal binary plumbing.

The corpus has no natural duplicates, so dedup queries build a corpus with
*injected* copies (doc_id + 1_000_000) — the operator must then find
exactly those pairs (plus any true near-dups), which the oracle reproduces.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import text as X
from tiledb_mariadb_spark.functions.multimodal import extract_features
from tiledb_mariadb_spark.suite import QuerySpec, t


# --- q60: token counting + quality scoring ---------------------------------
def q60_text_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    feats = X.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stop_hits"].alias("stop_hits"),
        feats["stop_ratio"].alias("stop_ratio"),
    )


_QF = X.quality_features_sql("text")
Q60_SQL = f"""
SELECT doc_id,
       {_QF['n_chars']} AS n_chars,
       {_QF['n_tokens']} AS n_tokens,
       {_QF['mean_token_len']} AS mean_token_len,
       {_QF['stop_hits']} AS stop_hits,
       {_QF['stop_ratio']} AS stop_ratio
FROM documents
"""


# --- q61: language-ID heuristic -------------------------------------------
def q61_lang_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    scores = X.lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        X.lang_id(F.col("text")).alias("pred_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
    )


_LS = X.lang_scores_sql("text")
Q61_SQL = f"""
SELECT doc_id, lang,
       {X.lang_id_sql('text')} AS pred_lang,
       {', '.join(f"{_LS[lang]} AS score_{lang}" for lang in sorted(_LS))}
FROM documents
"""


# --- q62: exact dedup over a corpus with injected copies -------------------
def _corpus(spark, sf_dir, limit: int = 100):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < limit).select(
        "doc_id", "text"
    )
    copies = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return d.unionByName(copies)


_CORPUS_SQL = """
SELECT doc_id, text FROM documents WHERE doc_id < 100
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 100
"""


def q62_dedup_exact(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    return D.exact_dedup_groups(corpus, "doc_id", "text").select(
        "text_hash", "n_copies", "keep_id"
    )


Q62_SQL = f"""
SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
FROM ({_CORPUS_SQL})
GROUP BY md5(text)
"""


# --- q63: document fingerprinting ------------------------------------------
def q63_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        X.md5_hex(F.substring(F.col("text"), 1, 64)).alias("fp_prefix"),
    )


Q63_SQL = """
SELECT doc_id, md5(TRIM(text)) AS fp, md5(substr(text, 1, 64)) AS fp_prefix
FROM documents
"""


# --- q64: MinHash signatures ----------------------------------------------
# In-row formulation: the signature is an array_min over the in-place
# shingle array — zero shuffle (the explode+groupBy path moved every
# shingle hash through an exchange; bit-identical, pinned in
# tests/test_pipeline_fns.py).
def q64_minhash(spark, sf_dir):
    corpus = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    return D.with_minhash_inline(corpus, "text", ["doc_id"], k=3, num_hashes=8)


_SHINGLES_100 = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id < 100)", "doc_id", "text", k=3
)
Q64_SQL = D.minhash_sql(_SHINGLES_100, "doc_id", num_hashes=8)


# --- q65: LSH banding → near-dup candidate pairs ---------------------------
def q65_lsh_pairs(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    sigs = D.with_minhash_inline(corpus, "text", ["doc_id"], k=3, num_hashes=8)
    return D.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, rows_per_band=2)


_SHINGLES_DUP = D.shingles_sql(f"({_CORPUS_SQL})", "doc_id", "text", k=3)
Q65_SQL = D.lsh_pairs_sql(
    D.minhash_sql(_SHINGLES_DUP, "doc_id", num_hashes=8),
    num_hashes=8,
    rows_per_band=2,
)


# --- q66: exact n-gram Jaccard verification --------------------------------
def q66_ngram_jaccard(spark, sf_dir):
    corpus = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).select(
        "doc_id", "text"
    )
    sh = D.with_shingles(corpus, "doc_id", "text", k=3).distinct()
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
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("un"),
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )


_SHINGLES_30 = D.shingles_sql(
    "(SELECT doc_id, text FROM documents WHERE doc_id < 30)", "doc_id", "text", k=3
)
Q66_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_30})),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id)
SELECT a, b, inter,
       (ca.n + cb.n - inter) AS un,
       (inter / (ca.n + cb.n - inter)) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = a
JOIN counts cb ON cb.doc_id = b
"""


# --- q67: SimHash ----------------------------------------------------------
def q67_simhash(spark, sf_dir):
    corpus = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    tokens = corpus.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    return D.simhash16(tokens, "doc_id")


Q67_SQL = D.simhash16_sql(
    "SELECT doc_id, UNNEST(str_split(TRIM(text), ' ')) AS token "
    "FROM documents WHERE doc_id < 200",
    "doc_id",
)


# --- q70: multimodal binary plumbing (stubbed decode via mapInPandas) ------
def q70_multimodal(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    with_blob = d.withColumn("blob", F.col("text").cast("binary"))
    return extract_features(with_blob, "doc_id", "blob")


Q70_SQL = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS byte_len,
       CAST(ASCII(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       md5(text) AS blob_md5
FROM documents
"""


# --- q75: BPE-ish tokenization (regexp pre-tokenizer, JVM-side) -------------
def q75_bpe_tokens(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        X.token_count(F.col("text")).alias("n_ws_tokens"),
    )


Q75_SQL = f"""
SELECT doc_id,
       {X.bpe_token_count_sql('text')} AS n_bpe_tokens,
       {X.token_count_sql('text')} AS n_ws_tokens
FROM documents
"""


# --- q73: frame sampling (one-to-many mapInPandas) -------------------------
def q73_frame_sample(spark, sf_dir):
    from tiledb_mariadb_spark.functions.multimodal import sample_frames  # noqa: PLC0415

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return sample_frames(d, "doc_id", "text", frame_size=64, every_n=4)


Q73_SQL = """
SELECT doc_id, fi AS frame_idx,
       CAST(LENGTH(substr(text, CAST(fi*64+1 AS BIGINT), 64)) AS BIGINT) AS frame_chars,
       md5(substr(text, CAST(fi*64+1 AS BIGINT), 64)) AS frame_md5
FROM documents, UNNEST(range(0, CAST(CEIL(LENGTH(text)/64.0) AS BIGINT))) AS u(fi)
WHERE fi % 4 = 0 AND doc_id < 200
"""


# --- q74: resize→pooled features feeding cosine search ----------------------
# decode/resize is the stubbed tier (no codecs in container); the pooled
# features are EXACT per-stripe int64 byte sums, so the cosine (int dot /
# sqrt·sqrt, one IEEE division) is bit-identical to a DuckDB oracle that
# recomputes the same sums from hex(encode(text)) — HASH-verified.
def q74_resize_cosine(spark, sf_dir):
    from tiledb_mariadb_spark.functions.multimodal import resize_features_int  # noqa: PLC0415
    from tiledb_mariadb_spark.functions.similarity import qdot_expr  # noqa: PLC0415

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .withColumn("blob", F.col("text").cast("binary"))
    )
    feats = resize_features_int(d, "doc_id", "blob", dim=8)
    query = feats.filter(F.col("doc_id") == 0).select(F.col("features").alias("qv"))
    cos = (
        f"({qdot_expr('features', 'qv')} / greatest("
        f"SQRT({qdot_expr('features', 'features')})"
        f" * SQRT({qdot_expr('qv', 'qv')}), 1e-30d))"
    )
    return (
        feats.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(F.col("doc_id"), F.expr(cos).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(5)
    )


# stride = ceil(bytes/8); byte b of the blob is hex chars 2b+1..2b+2.
_Q74_STRIDE = "CAST(CEIL(n / 8.0) AS BIGINT)"
Q74_SQL = f"""
WITH d AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents WHERE doc_id < 500),
feats AS (
  SELECT doc_id,
    [COALESCE(CAST(list_sum(
        [CAST(('0x' || substr(hx, CAST(2*b+1 AS BIGINT), 2)) AS BIGINT)
         FOR b IN range(s * {_Q74_STRIDE}, LEAST((s+1) * {_Q74_STRIDE}, n))]
      ) AS BIGINT), 0)
     FOR s IN range(0, 8)] AS fv
  FROM d),
q AS (SELECT fv AS qv FROM feats WHERE doc_id = 0),
scored AS (
  SELECT f.doc_id,
         (CAST(list_sum(list_transform(f.fv, (x, i) -> x * f.qv_[i])) AS BIGINT)
          / GREATEST(
              SQRT(CAST(list_sum(list_transform(f.fv, (x, i) -> x * f.fv[i])) AS BIGINT))
              * SQRT(CAST(list_sum(list_transform(f.qv_, (x, i) -> x * f.qv_[i])) AS BIGINT)),
              1e-30)) AS cos
  FROM (SELECT feats.doc_id, feats.fv, q.qv AS qv_ FROM feats, q) f
  WHERE f.doc_id <> 0)
SELECT doc_id, cos FROM scored ORDER BY cos DESC, doc_id LIMIT 5
"""


SPECS = [
    QuerySpec("q60_text_stats", q60_text_stats, Q60_SQL, "token count + quality"),
    QuerySpec("q75_bpe_tokens", q75_bpe_tokens, Q75_SQL, "BPE-ish pre-tokenizer"),
    QuerySpec(
        "q73_frame_sample", q73_frame_sample, Q73_SQL, "frame sampling (1-to-many)"
    ),
    QuerySpec("q61_lang_id", q61_lang_id, Q61_SQL, "language-ID heuristic"),
    QuerySpec("q62_dedup_exact", q62_dedup_exact, Q62_SQL, "exact dedup"),
    QuerySpec("q63_fingerprint", q63_fingerprint, Q63_SQL, "fingerprinting"),
    QuerySpec("q64_minhash", q64_minhash, Q64_SQL, "MinHash signatures"),
    QuerySpec("q65_lsh_pairs", q65_lsh_pairs, Q65_SQL, "LSH candidate pairs"),
    QuerySpec("q66_ngram_jaccard", q66_ngram_jaccard, Q66_SQL, "n-gram Jaccard"),
    QuerySpec("q67_simhash", q67_simhash, Q67_SQL, "SimHash"),
    QuerySpec("q70_multimodal", q70_multimodal, Q70_SQL, "multimodal mapInPandas"),
    QuerySpec(
        "q74_resize_cosine", q74_resize_cosine, Q74_SQL,
        "resize-stub int features → cosine top-k (hash oracle via hex bytes)",
    ),
]


# --- q291: perceptual-hash (dHash) near-dup over opaque blobs ---------------
# The multimodal member of the near-dup family (token-space: q180 SimHash;
# embedding-space: q159/q290): treat each document's bytes as an opaque
# media blob (the q70/q74 convention — no image libs in this container,
# so the "decode" is the deterministic bytes-as-pixels stub), compute a
# 64-bit difference hash (dHash: bit_i = byte_i > byte_{i+1} over the
# first 65 bytes, the classic 8x9->64-bit gradient fingerprint), and find
# near-dups by Hamming distance.  The 64 bits live as FOUR 16-bit band
# ints (never a single 64-bit value: bit 63 would overflow BIGINT
# arithmetic differently per engine) — which is also exactly the
# pigeonhole index: hamming<=6 over 4 bands forces at least one exact
# band match, so candidates come from a band equi-join (bounded by bucket
# population, never all-pairs) and the exact popcount verify runs only on
# candidates.  Corpus salted with tail-mutated copies (doc_id+100000) so
# true near-dups (hamming<=2) exist at every sf.  All arithmetic is
# integer-exact; both engines hash-match bit-for-bit.
_Q291_HAM = 6  # Spark-side exprs live in functions/multimodal.py now


def q291_phash_neardup(spark, sf_dir):
    # Library operators (functions/multimodal.py): with_dhash_bands
    # fingerprints the blob, phash_neardup_pairs does the pigeonhole
    # band join + exact popcount verify.
    from tiledb_mariadb_spark.functions.multimodal import (  # noqa: PLC0415
        phash_neardup_pairs,
        with_dhash_bands,
    )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("concat(substring(text, 1, length(text) - 1), '~')").alias("text"),
    )
    corpus = d.unionByName(copies).withColumn(
        "blob", F.col("text").cast("binary")
    )
    hashed = with_dhash_bands(corpus, "blob").select("doc_id", "bands")
    return phash_neardup_pairs(hashed, "doc_id", max_hamming=_Q291_HAM).orderBy(
        "a", "b"
    )


Q291_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, length(text) - 1) || '~'
  FROM documents WHERE doc_id % 9 = 0),
hx AS (SELECT doc_id, hex(encode(text)) AS hx FROM corpus),
by_ AS (
  SELECT doc_id,
    [CASE WHEN 2*i+2 <= length(hx)
          THEN CAST(('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2)) AS BIGINT)
          ELSE 0 END FOR i IN range(0, 65)] AS bs
  FROM hx),
hashed AS (
  SELECT doc_id,
    [CAST(COALESCE(list_sum(
       [CASE WHEN bs[CAST(16*k+i+1 AS BIGINT)] > bs[CAST(16*k+i+2 AS BIGINT)]
             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END FOR i IN range(0, 16)]
     ), 0) AS BIGINT) FOR k IN range(0, 4)] AS bands
  FROM by_),
banded AS (
  SELECT doc_id, bands, CAST(k AS BIGINT) AS k, bands[CAST(k + 1 AS BIGINT)] AS bv
  FROM hashed, UNNEST(range(0, 4)) AS u(k)),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
    CAST(list_sum(list_transform(a.bands,
         (x, i) -> bit_count(xor(x, b.bands[i])))) AS BIGINT) AS hamming
  FROM banded a JOIN banded b
    ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT ida AS a, idb AS b, hamming FROM cand
WHERE hamming <= {_Q291_HAM}
ORDER BY a, b
"""

SPECS.append(
    QuerySpec(
        "q291_phash_neardup",
        q291_phash_neardup,
        Q291_SQL,
        "dHash perceptual near-dup: 16-bit pigeonhole bands + popcount verify",
    )
)
