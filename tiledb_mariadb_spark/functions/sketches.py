"""Mergeable sketch operators: HyperLogLog, count-min, Bloom filter.

At 100 TB, exact answers to "how many distinct", "how often does X
occur", and "is X in the set" all cost a full shuffle on the key.  The
classic streaming sketches answer them with bounded state that merges
associatively — which is exactly a Spark partial aggregate: each task
builds its partition's sketch map-side, and the merge is a tiny
fixed-size reduction (64 registers / d×w counters / m bits) instead of a
data-sized shuffle.  The reference exposes only exact aggregates
(mytile/mytile.cc aggregate pushdown); these are the driver-added scale
tier on top.

Cross-engine determinism: every hash is the md5-derived
:func:`~tiledb_mariadb_spark.functions.dedup.hash60`, register widths
are powers of two so the indicator sums are exact BIGINT arithmetic, and
the only float ops are a literal product and one final IEEE division —
bit-identical on Spark and DuckDB by construction (see
``suite/__init__.py`` determinism conventions).

All three sketches are expressed as *declarative plans* (groupBy over a
hash expression), not UDAFs: Catalyst gives map-side partial aggregation
for free, so the shuffle carries at most ``m`` rows per partition —
constant, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tiledb_mariadb_spark.functions.dedup import hash60, hash60_sql

# --- HyperLogLog (Flajolet et al. 2007) ------------------------------------
#
# m = 64 registers (b = 6).  hash60 gives 60 uniform bits; the low 6 pick
# the register, the high 54 feed the rank (position of the leftmost
# 1-bit).  rho in [1, 55]; an empty register is 0 (contributes 2^0 = 1 to
# the indicator sum, per the paper).  The indicator sum is computed as an
# exact integer S = sum(2^(55 - M_j)): max 64 * 2^55 = 2^61 < 2^63.
# Estimate E = alpha_64 * m^2 / sum(2^-M) = alpha_64 * 4096 * 2^55 / S.

HLL_M = 64
_TWO55 = 1 << 55  # 36028797018963968
# alpha_m = 0.7213 / (1 + 1.079/m) for m >= 64 (paper, fig. 3)
_ALPHA64 = 0.7213 / (1 + 1.079 / 64)
# 'e0' suffix: parses as DOUBLE directly in DuckDB — a bare decimal
# literal would go through DECIMAL(18,17) and risk a double-rounding
# mismatch vs Python's float repr
_ALPHA64_LIT = repr(_ALPHA64) + "e0"


def hll_register_cols(key: Column, seed: str = "hll") -> tuple[Column, Column]:
    """(bucket, rho) for one key: register index and leading-zero rank.

    ``length(bin(w))`` is ``floor(log2(w)) + 1`` for w >= 1 (both engines
    render binary without leading zeros), so the rank of the leftmost
    1-bit inside the 54-bit window is ``55 - length(bin(w))``; w = 0 maps
    to the max rank 55.
    """
    h = hash60(key, seed)
    bucket = (h % F.lit(HLL_M)).cast("long")
    # shiftright, not `/`: h is up to 2^60 and double division would lose
    # the low bits past the 53-bit mantissa
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(w))
    ).cast("long")
    return bucket, rho


def hll_register_sql(key_expr: str, seed: str = "hll") -> tuple[str, str]:
    h = hash60_sql(key_expr, seed)
    bucket = f"CAST(({h}) % {HLL_M} AS BIGINT)"
    w = f"CAST(({h}) // {HLL_M} AS BIGINT)"
    rho = f"CAST(CASE WHEN {w} = 0 THEN 55 ELSE 55 - length(bin({w})) END AS BIGINT)"
    return bucket, rho


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Registers ``(bucket, rho)`` -> one row ``(hll_estimate DOUBLE)``.

    ``registers`` must contain exactly one row per occupied bucket with
    the max rho; missing buckets count as rho = 0.  The empty-bucket
    completion is an exact integer: S = S_occupied + (64 - n_occupied) * 2^55.
    """
    agg = registers.agg(
        # expr, not F.shiftleft: the Python helper requires a literal int
        # shift amount
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho AS INT))")).alias(
            "s_occ"
        ),
        F.count(F.lit(1)).alias("n_occ"),
    )
    s = F.col("s_occ") + (F.lit(HLL_M) - F.col("n_occ")) * F.lit(_TWO55)
    est = (
        (F.lit(_ALPHA64) * F.lit(float(HLL_M * HLL_M)))
        * F.lit(float(_TWO55))
        / s.cast("double")
    )
    return agg.select(est.alias("hll_estimate"))


def hll_estimate_sql(registers_cte: str) -> str:
    """DuckDB twin of :func:`hll_estimate` (identical parenthesization)."""
    return f"""
SELECT ((CAST({_ALPHA64_LIT} AS DOUBLE) * {float(HLL_M * HLL_M)!r})
        * {float(_TWO55)!r})
       / CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - rho AS INT))
              + (64 - COUNT(*)) * {_TWO55} AS DOUBLE) AS hll_estimate
FROM ({registers_cte})
"""


# --- count-min sketch (Cormode & Muthukrishnan 2005) -----------------------

CM_DEPTH = 3
CM_WIDTH = 256


def cm_bucket(key: Column, row: int) -> Column:
    return (hash60(key, f"cm{row}") % F.lit(CM_WIDTH)).cast("long")


def cm_bucket_sql(key_expr: str, row: int) -> str:
    return f"CAST(({hash60_sql(key_expr, f'cm{row}')}) % {CM_WIDTH} AS BIGINT)"


def cm_sketch(items: DataFrame, key_col: str) -> DataFrame:
    """One pass over ``items`` -> sketch table ``(row, bucket, cnt)``.

    d×w = 768 counters: the shuffle after the map-side partial agg
    carries at most 768 rows per partition regardless of input size.
    """
    rows = F.array(
        *[
            F.struct(F.lit(r).cast("long").alias("row"), cm_bucket(F.col(key_col), r).alias("bucket"))
            for r in range(CM_DEPTH)
        ]
    )
    return (
        items.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_sketch_sql(items_cte: str, key_expr: str) -> str:
    arms = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS row, {cm_bucket_sql(key_expr, r)} AS bucket"
        f" FROM items"
        for r in range(CM_DEPTH)
    )
    return f"""
WITH items AS ({items_cte}),
rb AS ({arms})
SELECT row, bucket, COUNT(*) AS cnt FROM rb GROUP BY row, bucket
"""


# --- Bloom filter ----------------------------------------------------------
#
# m = 65536 bits packed 63 per BIGINT word (bit 63 stays clear: BIGINT <<
# of 63 differs across engines' overflow behavior), k = 3 hash functions.
# Build = one groupBy(word) bit_or — at most 1041 rows out of any input.
# The probe is k broadcast joins against that word table: the classic
# "ship the filter to the data" semi-join reduction that runtime row-group
# pruning applies at 100 TB.

BLOOM_BITS = 65536
BLOOM_K = 3
_WORD_BITS = 63


def bloom_bit(key: Column, j: int) -> Column:
    return (hash60(key, f"bloom{j}") % F.lit(BLOOM_BITS)).cast("long")


def bloom_bit_sql(key_expr: str, j: int) -> str:
    return f"CAST(({hash60_sql(key_expr, f'bloom{j}')}) % {BLOOM_BITS} AS BIGINT)"


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Distinct build keys -> word table ``(word, bits)``."""
    positions = F.array(*[bloom_bit(F.col(key_col), j) for j in range(BLOOM_K)])
    return (
        keys.select(F.explode(positions).alias("bit"))
        .select(
            (F.col("bit") / _WORD_BITS).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(bit % {_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_build_sql(keys_cte: str, key_expr: str) -> str:
    arms = " UNION ALL ".join(
        f"SELECT {bloom_bit_sql(key_expr, j)} AS bit FROM keys" for j in range(BLOOM_K)
    )
    return f"""
WITH keys AS ({keys_cte}),
pos AS ({arms})
SELECT CAST(bit // {_WORD_BITS} AS BIGINT) AS word,
       bit_or(CAST(1 AS BIGINT) << CAST(bit % {_WORD_BITS} AS INT)) AS bits
FROM pos GROUP BY 1
"""


def bloom_probe(probes: DataFrame, key_col: str, words: DataFrame) -> DataFrame:
    """Add ``bloom_pass`` (1/0): all k bits set.

    The word table is at most ``BLOOM_BITS/63 + 1`` rows (~8 KB) by
    construction, so it collects to a DENSE driver-side array (missing
    words = 0, exactly the old join's ``coalesce(bits, 0)``) and the
    probe becomes one map-side projection over an array LITERAL riding
    the task closure — the §3.2 "ship the filter to the data" shape
    with ZERO joins, broadcasts, or persists (round 10; previously one
    persist + k broadcast left joins = k extra jobs per probe).  Bit
    values, hash functions, and word packing are unchanged, so
    ``bloom_pass`` is bit-identical to the join form (pinned by
    tests/test_sketches.py and the q195 oracle)."""
    n_words = BLOOM_BITS // _WORD_BITS + 1
    dense = [0] * n_words
    for r in words.collect():
        dense[int(r["word"])] = int(r["bits"])
    arr = F.lit(dense)
    out = probes.select(
        "*", *[bloom_bit(F.col(key_col), j).alias(f"__b{j}") for j in range(BLOOM_K)]
    )
    passed = None
    for j in range(BLOOM_K):
        word = (F.col(f"__b{j}") / _WORD_BITS).cast("long")
        out = out.withColumn(
            f"__w{j}", F.element_at(arr, (word + 1).cast("int"))
        )
        hit = F.expr(
            f"(shiftright(__w{j},"
            f" CAST(__b{j} % {_WORD_BITS} AS INT)) % 2) = 1"
        )
        passed = hit if passed is None else (passed & hit)
    return out.withColumn("bloom_pass", passed.cast("int")).drop(
        *[c for j in range(BLOOM_K) for c in (f"__b{j}", f"__w{j}")]
    )


def bloom_probe_sql(probes_cte: str, key_expr: str, words_cte: str) -> str:
    """DuckDB twin: scalar subqueries against the (tiny) word table."""
    hits = []
    for j in range(BLOOM_K):
        bit = bloom_bit_sql(key_expr, j)
        hits.append(
            f"((COALESCE((SELECT bits FROM words WHERE word = ({bit}) // {_WORD_BITS}),"
            f" CAST(0 AS BIGINT)) >> CAST(({bit}) % {_WORD_BITS} AS INT)) % 2 = 1)"
        )
    cond = " AND ".join(hits)
    return f"""
WITH words AS ({words_cte}),
probes AS ({probes_cte})
SELECT probes.*, CAST({cond} AS INT) AS bloom_pass FROM probes
"""
