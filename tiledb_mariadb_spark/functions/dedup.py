"""Deduplication operators for training-data pipelines: exact (hash),
MinHash + LSH banding (near-dup candidate pairs), word-n-gram Jaccard
verification, and SimHash.

Scale design (the point of these ops is 100 TB corpora):
- exact dedup = one hash-shuffle on a 16-byte digest (groupBy md5);
- MinHash: shingling + hashing is embarrassingly parallel, signatures are
  one groupBy(doc) shuffle; LSH banding shuffles (band, band-hash) buckets
  so candidate generation never compares all pairs — the all-pairs join is
  confined to within-bucket, and a final Jaccard verify runs only on
  candidates.  Every hash is an md5-derived integer so the DuckDB oracle
  can reproduce it bit-for-bit (no engine-private hash functions).
- SimHash: one pass per token + groupBy(doc) bit-vote.

All expressions are JVM Columns — no Python in the hot path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions.text import md5_hex

# --- deterministic 60-bit / 32-bit hashes (md5-derived, oracle-reproducible)


def hash60(col: Column, seed: str) -> Column:
    """First 15 hex digits of md5('<seed>:'||s) as a non-negative BIGINT."""
    return F.conv(
        F.substring(md5_hex(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def hash60_sql(expr: str, seed: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 15)) AS BIGINT)"
    )


# --- exact dedup -----------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; emit (text_hash, n_copies, keep_id)."""
    return (
        df.withColumn("text_hash", md5_hex(F.col(text_col)))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


# --- shingling -------------------------------------------------------------


def with_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Explode word-``k``-gram shingles: (id, shingle), duplicates kept.

    The split token array is staged as its own projection column first:
    referenced from inside the transform lambda it would be re-evaluated
    PER ELEMENT (no CSE across lambdas; see the verify recipe), turning
    the scan O(tokens^2) per doc."""
    staged = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__ws")
    )
    return staged.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__ws) - {k - 1}),"
                f" i -> concat_ws(' ', slice(__ws, i, {k})))"
            )
        ).alias("shingle"),
    )


def shingles_sql(table_expr: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB twin of :func:`with_shingles` (1-based inclusive list slices)."""
    return f"""
SELECT {id_col}, array_to_string(ws[i.i:i.i+{k - 1}], ' ') AS shingle
FROM (SELECT {id_col}, str_split(TRIM({text_col}), ' ') AS ws FROM {table_expr}),
     UNNEST(range(1, len(ws) - {k - 2})) AS i(i)
"""


# --- MinHash signatures ----------------------------------------------------


# Universal-hash MinHash (Broder '97 §4 / MMDS ch.3.3): ONE md5 per shingle
# occurrence, then num_hashes cheap integer permutations
# g_j(h) = (A_j·h + B_j) mod p over the Mersenne prime p = 2^31-1.
# The 8-md5-per-shingle formulation cost 8x the hashing of the scan — at
# corpus scale md5 throughput IS the minhash bottleneck.  A_j/B_j are
# md5-derived module constants inlined as literals into both engines'
# expressions, so signatures stay bit-identical cross-engine.
_MINHASH_P = (1 << 31) - 1


def _minhash_consts(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib  # noqa: PLC0415

    out = []
    for j in range(num_hashes):
        a = int(hashlib.md5(f"mha:{j}".encode()).hexdigest()[:8], 16)
        b = int(hashlib.md5(f"mhb:{j}".encode()).hexdigest()[:8], 16)
        out.append((a % (_MINHASH_P - 1) + 1, b % _MINHASH_P))
    return out


def minhash_signatures(
    shingled: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """Per-doc signature: min over shingles of g_j(h31(shingle)), one
    column ``mh<j>`` per permutation; h31 = hash60(shingle,'mh') mod p
    computed once per shingle."""
    h31 = (hash60(F.col("shingle"), "mh") % F.lit(_MINHASH_P)).alias("__h31")
    hashed = shingled.select(F.col(id_col), h31)
    aggs = [
        F.min(
            (F.lit(a) * F.col("__h31") + F.lit(b)) % F.lit(_MINHASH_P)
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(_minhash_consts(num_hashes))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def with_minhash_inline(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    k: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature computed IN-ROW from the text column: the shingle
    array is hashed in place and each ``mh<j>`` is an array_min over the
    permuted hashes — no explode, no groupBy, ZERO shuffle.  Bit-identical
    to :func:`minhash_signatures` over :func:`with_shingles` (min over the
    same multiset; tests pin the identity).  Because it is aggregation-free
    it is also the STREAMING-legal formulation: a readStream of documents
    can compute signatures map-side and stream-static join the corpus band
    index in append mode.

    The expensive hashed-shingle array is staged as its OWN projection
    (``__hs``) and the per-permutation mins read from that column:
    putting the full expression into each mh<j> would evaluate the
    md5-per-shingle transform 8 times (Spark cannot CSE across lambda
    functions within one projection; CollapseProject keeps the staged
    form because the producer is non-cheap and multiply-referenced,
    SPARK-36718).  Returns ``id_cols + mh0..mh<n-1>``."""
    words = f"split(trim({text_col}), ' ')"
    sh = (
        f"transform(sequence(1, size({words}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({words}, i, {k})))"
    )
    h31 = (
        f"(CAST(conv(substring(md5(concat('mh:', s)), 1, 15), 16, 10)"
        f" AS BIGINT) % {_MINHASH_P})"
    )
    staged = df.withColumn("__hs", F.expr(f"transform({sh}, s -> {h31})"))
    sigs = [
        F.expr(
            f"array_min(transform(__hs, h -> ({a} * h + {b}) % {_MINHASH_P}))"
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(_minhash_consts(num_hashes))
    ]
    return staged.select(*id_cols, *sigs)


def minhash_sql(shingle_cte: str, id_col: str, num_hashes: int = 8) -> str:
    h31 = f"({hash60_sql('shingle', 'mh')} % {_MINHASH_P})"
    cols = ", ".join(
        f"MIN(({a} * h31 + {b}) % {_MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(_minhash_consts(num_hashes))
    )
    return (
        f"SELECT {id_col}, {cols} FROM"
        f" (SELECT {id_col}, {h31} AS h31 FROM ({shingle_cte}))"
        f" GROUP BY {id_col}"
    )


def lsh_params(
    threshold: float, max_hashes: int = 64
) -> tuple[int, int, int]:
    """Pick (num_hashes, bands, rows_per_band) for a target Jaccard
    threshold: the banding S-curve crosses 1/2 at t* ≈ (1/b)^(1/r), so
    choose the b·r ≤ max_hashes grid point whose t* lands closest to the
    requested threshold (ties → more hashes = sharper curve).  The knob
    users actually have ("catch pairs above 0.8") translated into the
    knobs the operator takes — standard MMDS §3.4 analysis, no data pass.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for r in range(1, 17):
        for b in range(1, max_hashes + 1):
            if b * r > max_hashes:
                break
            t_star = (1.0 / b) ** (1.0 / r)
            key = (abs(t_star - threshold), -(b * r))
            if best is None or key < best[0]:
                best = (key, (b * r, b, r))
    return best[1]


# --- LSH banding → candidate pairs ----------------------------------------


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    storage_level: Optional[str] = "MEMORY_AND_DISK",
    checkpoint: bool = False,
) -> DataFrame:
    """Band the signature (r rows per band), bucket-join within bands,
    emit distinct candidate pairs (a < b).  The only all-pairs expansion
    happens inside a (band, hash...) bucket.

    Banding is a single explode (not a per-band union, which would plan
    the signature subtree once per band).  The banded frame is consumed
    twice by the self-join, so it is persisted at ``storage_level``
    (MEMORY_AND_DISK default: spills instead of evicting at corpus
    scale; pass None to disable).  At 100 TB pass ``checkpoint=True``
    instead — a lineage-truncating materialization to the checkpoint dir
    survives executor loss where a cache eviction would recompute the
    whole shingle pipeline twice."""
    num_bands = num_hashes // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.col(f"mh{b * rows_per_band}").alias("h0"),
                F.col(f"mh{b * rows_per_band + 1}").alias("h1"),
            )
            for b in range(num_bands)
        ]
    )
    bands = signatures.select(
        F.col(id_col).alias("doc"), F.explode(band_structs).alias("bs")
    ).select("doc", "bs.band", "bs.h0", "bs.h1")
    if checkpoint:
        bands = bands.checkpoint(eager=False)
    elif storage_level is not None:
        from pyspark import StorageLevel  # noqa: PLC0415

        from tiledb_mariadb_spark import persists as _P  # noqa: PLC0415

        bands = _P.track(bands.persist(getattr(StorageLevel, storage_level)))
    left = bands.select("band", "h0", "h1", F.col("doc").alias("a"))
    right = bands.select("band", "h0", "h1", F.col("doc").alias("b"))
    return (
        left.join(right, ["band", "h0", "h1"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_pairs_sql(
    signature_cte: str, num_hashes: int = 8, rows_per_band: int = 2
) -> str:
    num_bands = num_hashes // rows_per_band
    parts = []
    for b in range(num_bands):
        h0 = f"mh{b * rows_per_band}"
        h1 = f"mh{b * rows_per_band + 1}"
        parts.append(
            f"SELECT doc_id AS doc, {b} AS band, {h0} AS h0, {h1} AS h1 FROM sigs"
        )
    bands_sql = " UNION ALL ".join(parts)
    return f"""
WITH sigs AS ({signature_cte}),
bands AS ({bands_sql})
SELECT DISTINCT l.doc AS a, r.doc AS b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.h0 = r.h0 AND l.h1 = r.h1
WHERE l.doc < r.doc
"""


def band_explode(
    sigs: DataFrame,
    id_col: str,
    out: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode a signature frame into (id, band, h0, h1) band rows — one
    explode, shared by the pair/probe joins and the streaming probe."""
    num_bands = num_hashes // rows_per_band
    structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.col(f"mh{b * rows_per_band}").alias("h0"),
                F.col(f"mh{b * rows_per_band + 1}").alias("h1"),
            )
            for b in range(num_bands)
        ]
    )
    return sigs.select(
        F.col(id_col).alias(out), F.explode(structs).alias("bs")
    ).select(out, "bs.band", "bs.h0", "bs.h1")


def lsh_probe_pairs(
    index_sigs: DataFrame,
    probe_sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Incremental dedup: band a NEW batch's signatures and join them
    against an existing corpus index's bands — (probe, index) candidate
    pairs only, never index×index.  This is the production shape for
    rolling ingest (mytile has no analog; LSH incremental probing per
    Broder '97 / Leskovec MMDS ch.3): the corpus is banded ONCE (here
    inline; at scale a stored TileTable partitioned by (band, h0, h1)
    so each probe bucket is partition-pruned), and per-ingest cost
    scales with the batch, not the corpus.  The probe side is orders of
    magnitude smaller — broadcast it so the corpus index never
    shuffles."""
    idx = band_explode(index_sigs, id_col, "index_id", num_hashes, rows_per_band)
    probe = band_explode(probe_sigs, id_col, "probe_id", num_hashes, rows_per_band)
    return (
        idx.join(F.broadcast(probe), ["band", "h0", "h1"])
        .select("probe_id", "index_id")
        .distinct()
    )


def lsh_probe_pairs_sql(
    index_cte: str,
    probe_cte: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> str:
    """DuckDB twin of :func:`lsh_probe_pairs`."""
    num_bands = num_hashes // rows_per_band

    def bands(src: str, out: str) -> str:
        parts = [
            f"SELECT doc_id AS {out}, {b} AS band,"
            f" mh{b * rows_per_band} AS h0, mh{b * rows_per_band + 1} AS h1"
            f" FROM {src}"
            for b in range(num_bands)
        ]
        return " UNION ALL ".join(parts)

    return f"""
WITH isigs AS ({index_cte}), psigs AS ({probe_cte}),
ibands AS ({bands('isigs', 'index_id')}),
pbands AS ({bands('psigs', 'probe_id')})
SELECT DISTINCT probe_id, index_id
FROM ibands JOIN pbands USING (band, h0, h1)
"""


def write_lsh_index(
    sigs: DataFrame,
    id_col: str,
    path: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> None:
    """Persist the corpus band index: hive-partitioned by ``band`` (a
    handful of directories — h0/h1 are 2^31-valued and cannot be
    partition keys) and RANGE-clustered on (h0, h1) within each band so
    every file's footer min/max spans a narrow hash range — a probe's
    h0 equality prunes to ~one row group per band partition.  The same
    layout idea as the IVF list partitions and the TileTable dimension
    clustering."""
    bands = band_explode(sigs, id_col, "index_id", num_hashes, rows_per_band)
    (
        bands.repartitionByRange(int(num_hashes // rows_per_band), "band", "h0")
        .sortWithinPartitions("band", "h0", "h1")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(path)
    )


def probe_lsh_index(
    spark,
    path: str,
    probe_sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Join a (small) probe batch against the STORED band index: the
    probe bands broadcast, the index never shuffles, and each task
    row-group-skips on the clustered (h0, h1) ranges.  Returns distinct
    (probe_id, index_id) candidate pairs — per-ingest cost scales with
    the batch."""
    idx = spark.read.parquet(path)
    pbands = band_explode(probe_sigs, id_col, "probe_id", num_hashes, rows_per_band)
    return (
        idx.join(F.broadcast(pbands), ["band", "h0", "h1"])
        .select("probe_id", "index_id")
        .distinct()
    )


# --- prefix-filtered set-similarity join (PPJoin-style) --------------------


def setsim_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 3,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering
    (Chaudhuri/Ganti/Kaushik ICDE'06; Xiao et al. PPJoin WWW'08): unlike
    LSH banding this has NO false negatives.  Tokens are ordered by
    ascending global frequency; a pair with Jaccard ≥ t must share at
    least one token among each side's first ``sz - ceil(t·sz) + 1``
    rarest tokens, so candidate generation joins only on RARE tokens —
    the frequent-token hot keys that would skew a naive token join are
    excluded by construction.  The threshold is a rational t = num/den
    and every comparison stays in int64 (``den·inter ≥ num·union``), so
    both engines agree exactly.

    Shuffle census at corpus scale: one groupBy(token) for frequencies,
    one doc-keyed window for prefix ranks, one join keyed on rare tokens,
    one groupBy(pair) for the verify — all on bounded keys."""
    from pyspark.sql import Window  # noqa: PLC0415

    tn, td = threshold_num, threshold_den
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), " "))).alias(
            "tok"
        ),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    ranked = (
        toks.join(freq, "tok")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("tf", "tok")
            ),
        )
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    # prefix length sz - ceil(t*sz) + 1 with ceil(t*sz) = (tn*sz + td-1) DIV td
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz") - F.expr(f"({tn} * sz + {td - 1}) DIV {td}") + 1
    )
    cands = (
        prefix.select(F.col("doc").alias("a"), "tok")
        .join(prefix.select(F.col("doc").alias("b"), "tok"), "tok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    ta = toks.select(F.col("doc").alias("a"), "tok")
    tb = toks.select(F.col("doc").alias("b"), "tok")
    inter = (
        cands.join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    na = sizes.select(F.col("doc").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn("un", (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.lit(td) * F.col("inter") >= F.lit(tn) * F.col("un"))
        .select(
            "a",
            "b",
            "inter",
            F.col("un").cast("long").alias("un"),
            (F.col("inter") / F.col("un").cast("double")).alias("jaccard"),
        )
    )


# --- SimHash ---------------------------------------------------------------


def simhash16(tokens: DataFrame, id_col: str, token_col: str = "token") -> DataFrame:
    """16-bit SimHash: per-token 60-bit hash votes ±1 on each of 16 bits;
    the sign of each bit-sum forms the fingerprint."""
    h = hash60(F.col(token_col), "simhash")
    votes = [
        F.sum(
            F.when(F.expr(f"__h >> {j} & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    per_doc = tokens.withColumn("__h", h).groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for j in range(16):
        sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(0)
    return per_doc.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    sims: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Hamming-radius near-dup join over 16-bit SimHash fingerprints:
    split into 4 bands of 4 bits — any pair within Hamming distance ≤ 3
    agrees on at least one whole band (pigeonhole), so candidates come
    from 4 tiny equi-joins instead of all-pairs; the exact
    bit_count(XOR) verify runs on candidates only.  Same
    bounded-candidate architecture as MinHash banding, but for the
    bit-vector family (Manku/Jain/Sarma WWW'07 web-dedup shape)."""
    bands = sims.select(
        F.col(id_col).alias("doc"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {4 * b}) & 15").alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bs"),
    ).select("doc", "simhash", "bs.band", "bs.bv")
    left = bands.select(
        "band", "bv", F.col("doc").alias("a"), F.col("simhash").alias("sa")
    )
    right = bands.select(
        "band", "bv", F.col("doc").alias("b"), F.col("simhash").alias("sb")
    )
    return (
        left.join(right, ["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.expr("bit_count(sa ^ sb)").alias("hd"))
        .distinct()
        .filter(F.col("hd") <= max_hamming)
    )


def simhash_neardup_sql(simhash_cte: str, id_col: str, max_hamming: int = 3) -> str:
    """DuckDB twin of :func:`simhash_neardup_pairs`."""
    bands = " UNION ALL ".join(
        f"SELECT {id_col} AS doc, simhash, {b} AS band,"
        f" (simhash >> {4 * b}) & 15 AS bv FROM sims"
        for b in range(4)
    )
    return f"""
WITH sims AS ({simhash_cte}),
bands AS ({bands})
SELECT DISTINCT l.doc AS a, r.doc AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hd
FROM bands l JOIN bands r ON l.band = r.band AND l.bv = r.bv
WHERE l.doc < r.doc AND bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
"""


def simhash16_sql(token_cte: str, id_col: str) -> str:
    h = hash60_sql("token", "simhash")
    votes = ", ".join(
        f"CAST(SUM(CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v{j}"
        for j in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
    )
    return f"""
WITH toks AS ({token_cte}),
votes AS (SELECT {id_col}, {votes} FROM toks GROUP BY {id_col})
SELECT {id_col}, CAST({bits} AS BIGINT) AS simhash FROM votes
"""


# --- exact duplicate-span detection ----------------------------------------
# Distributed analog of the suffix-array "exact substring" dedup of Lee et
# al. 2022 (Deduplicating Training Data Makes Language Models Better,
# §ExactSubstr), re-expressed for Spark: instead of one global suffix
# array, every k-token window is fingerprinted (md5), windows whose
# fingerprint occurs in >= 2 DISTINCT documents are "duplicated", and
# per-document runs of consecutive duplicated window starts are merged
# into maximal spans with a gaps-and-islands window.  A duplicated run of
# r consecutive windows == a shared substring of r + k - 1 tokens, so
# max_span_tokens reports the longest cross-document repeated substring
# per doc (>= k tokens).
#
# Scale shape: window generation is map-side (one explode — rows scale
# with corpus token count, exactly like shingling); ONE shuffle groups the
# 16-byte digests to find cross-doc fingerprints; the dup set joins back
# on the digest (AQE can broadcast it when dup density is low); the
# islands window repartitions by doc.  No all-pairs stage anywhere.


def dup_span_report(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-doc report of cross-document duplicated spans (>= ``k`` tokens):
    (id, n_dup_windows, n_spans, max_span_tokens).  Docs with no
    cross-doc duplicated window are absent."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("ws")
    )
    wins = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN size(ws) >= {k} THEN sequence(1, size(ws) - {k - 1})"
                " ELSE array() END"
            )
        ).alias("pos"),
        F.col("ws"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        md5_hex(F.expr(f"concat_ws(' ', slice(ws, pos, {k}))")).alias("wh"),
    )
    # cross-doc test as ONE window over the fingerprint instead of a
    # groupBy + join-back: min(id) != max(id) over the wh partition is
    # exactly countDistinct(id) >= 2, and it shuffles the window table
    # once, not twice.
    wf = Window.partitionBy("wh")
    marked = (
        wins.withColumn("min_id", F.min(id_col).over(wf))
        .withColumn("max_id", F.max(id_col).over(wf))
        .filter(F.col("min_id") != F.col("max_id"))
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return spans.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_dup_windows"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        (F.max("cnt") + F.lit(k - 1)).cast("long").alias("max_span_tokens"),
    )


def dup_span_report_sql(
    table: str, id_col: str, text_col: str, k: int = 8
) -> str:
    """DuckDB twin of :func:`dup_span_report` (1-based inclusive slices;
    ``range`` end-exclusive empties out short docs like the CASE guard)."""
    return f"""
WITH toks AS (SELECT {id_col}, str_split(TRIM({text_col}), ' ') AS ws FROM {table}),
wins AS (SELECT {id_col}, i.i AS pos,
                md5(array_to_string(ws[i.i:i.i+{k - 1}], ' ')) AS wh
         FROM toks, UNNEST(range(1, len(ws) - {k - 2})) AS i(i)),
dups AS (SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT {id_col}) >= 2),
marked AS (SELECT w.{id_col}, w.pos FROM wins w JOIN dups USING (wh)),
isl AS (SELECT {id_col}, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY pos) AS island
        FROM marked),
spans AS (SELECT {id_col}, island, COUNT(*) AS cnt FROM isl GROUP BY {id_col}, island)
SELECT {id_col}, CAST(SUM(cnt) AS BIGINT) AS n_dup_windows,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(cnt) + {k - 1} AS BIGINT) AS max_span_tokens
FROM spans GROUP BY {id_col}
"""
