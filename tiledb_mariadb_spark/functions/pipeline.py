"""Corpus-preparation operators for large-scale training-data pipelines:
deterministic train/test splitting, stratified sampling, PII redaction,
context-window document packing, and near-dup *clustering* (connected
components over candidate-pair edges).

These extend the reference's query surface (TileDB-MariaDB has no corpus
tooling; its tests stop at SQL — ``mysql-test/mytile/t/*.test``) with the
operations a 100 TB pretraining pipeline runs after ingest.  Design rules
match the rest of the engine:

- every decision is a *deterministic function of the data* (md5-derived
  fractions, not ``rand()``) so the DuckDB oracle reproduces results
  bit-for-bit and re-runs are idempotent — at 100 TB you cannot afford a
  sample that changes when a stage retries;
- everything JVM-side Column expressions except the one genuinely
  sequential operator (greedy bin packing), which is Arrow-batched
  ``applyInPandas`` per shard — the sanctioned Python boundary;
- no all-pairs, no driver-side materialization of corpus-sized data.
  Connected components is the one iterative operator: O(log n) rounds of
  a min-label join, each a single shuffle on the edge key, with
  ``localCheckpoint`` per round to truncate lineage (at corpus scale a
  10-round lineage would otherwise replay the LSH pipeline 10×).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- deterministic uniform fraction (md5-derived, oracle-reproducible) -----

TWO32 = "4294967296.0"  # 2^32 as an exact double


def hash_fraction(col: Column, seed: str) -> Column:
    """Uniform [0,1) fraction from md5('<seed>:'||s): first 8 hex digits as
    a 32-bit int, divided by 2^32.  int→double is exact below 2^53 and the
    division is a single IEEE op — bit-identical in DuckDB."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(4294967296.0)


def hash_fraction_sql(expr: str, seed: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 8)) AS BIGINT) / {TWO32})"
    )


def hash_fraction_spark_sql(expr: str, seed: str) -> str:
    """Spark-SQL-dialect twin of :func:`hash_fraction` (for SQL macros)."""
    return (
        f"(CAST(conv(substring(md5(CAST(concat('{seed}:', {expr}) AS BINARY)),"
        f" 1, 8), 16, 10) AS BIGINT) / {TWO32})"
    )


# --- train/test split ------------------------------------------------------


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1, seed: str = "split"
) -> DataFrame:
    """Deterministic split: a row lands in 'test' iff its hash fraction is
    below ``test_frac``.  Keyed on a stable column (id or content hash) so
    membership survives re-runs and re-partitioning; no shuffle — a pure
    map over the scan."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    frac = hash_fraction(F.col(key_col).cast("string"), seed)
    return df.withColumn(
        "split", F.when(frac < test_frac, F.lit("test")).otherwise(F.lit("train"))
    )


def split_case_sql(key_expr: str, test_frac: float, seed: str = "split") -> str:
    frac = hash_fraction_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return f"(CASE WHEN {frac} < {test_frac!r} THEN 'test' ELSE 'train' END)"


# --- stratified sampling ---------------------------------------------------


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the row's
    deterministic hash fraction.  One map-side filter — no shuffle, no
    ``sampleBy`` (whose Bernoulli draws are seed+partitioning dependent)."""
    bad = {v: p for v, p in fractions.items() if not 0.0 <= p <= 1.0}
    if bad or not 0.0 <= default_frac <= 1.0:
        raise ValueError(f"fractions must be in [0, 1]: {bad or default_frac}")
    frac = hash_fraction(F.col(key_col).cast("string"), seed)
    rate = F.lit(default_frac)
    for value, p in sorted(fractions.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(p)).otherwise(rate)
    return df.filter(frac < rate)


def stratified_rate_sql(
    stratum_expr: str, fractions: dict[str, float], default_frac: float = 0.0
) -> str:
    whens = " ".join(
        f"WHEN {stratum_expr} = '{v}' THEN {p!r}" for v, p in sorted(fractions.items())
    )
    return f"(CASE {whens} ELSE {default_frac!r} END)"


# --- corpus mixing (importance reweighting) --------------------------------


def mix_corpus(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic data mixing: each row appears ``floor(w)`` times plus
    one more with probability ``frac(w)`` decided by its hash fraction —
    the standard up/down-sampling that sets per-source epochs in a
    pretraining mix (w=2.5 → 2 or 3 copies; w=0.5 → keep half).

    ``copy_idx`` (1-based) distinguishes repetitions downstream (e.g. for
    shuffling copies into different shards).  Map-side only: a when-chain
    rate, one hash, one ``sequence`` explode — no shuffle, rerun-stable.
    """
    bad = {v: w for v, w in weights.items() if w < 0}
    if bad or default_weight < 0:
        raise ValueError(f"weights must be >= 0: {bad or default_weight}")
    rate = F.lit(float(default_weight))
    for value, w in sorted(weights.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(w))).otherwise(rate)
    base = F.floor(rate).cast("long")
    frac = rate - F.floor(rate)
    extra = (
        hash_fraction(F.col(key_col).cast("string"), seed) < frac
    ).cast("long")
    return (
        df.withColumn("__n", base + extra)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.expr("sequence(1, __n)")))
        .drop("__n")
    )


def mix_rate_sql(
    stratum_expr: str, weights: dict[str, float], default_weight: float = 1.0
) -> str:
    whens = " ".join(
        f"WHEN {stratum_expr} = '{v}' THEN {float(w)!r}"
        for v, w in sorted(weights.items())
    )
    return f"(CASE {whens} ELSE {float(default_weight)!r} END)"


# --- PII redaction ---------------------------------------------------------

# Dialect-portable patterns: character classes + bounded quantifiers only
# (no lookaround, no shorthand that differs between Java regex and RE2).
EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii(col: Column) -> Column:
    """Replace emails then phone numbers with typed placeholder tokens.
    Pure ``regexp_replace`` chain — stays in whole-stage codegen."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def redact_pii_sql(expr: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag to replace all occurrences
    # (Spark replaces all by default).
    out = f"regexp_replace({expr}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return f"regexp_replace({out}, '{PHONE_RE}', '<PHONE>', 'g')"


def pii_counts(col: Column) -> dict[str, Column]:
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        "n_emails": f"CAST(len(regexp_extract_all({expr}, '{EMAIL_RE}')) AS BIGINT)",
        "n_phones": f"CAST(len(regexp_extract_all({expr}, '{PHONE_RE}')) AS BIGINT)",
    }


# --- context-window packing ------------------------------------------------


def pack_sequential(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    window: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Concat-then-chunk packing: documents are laid out in ``order_col``
    order as one token stream and cut every ``window`` tokens.  A doc's
    bin is the window its first token falls in; ``bin_offset`` is its
    position within that window (docs may straddle a boundary — the
    standard pretraining layout where a boundary mid-document is allowed).

    A naive ``Window.orderBy(order_col)`` cumsum funnels the whole corpus
    through ONE partition.  This is the distributed two-pass prefix sum
    instead: range-partition on ``order_col``, cumsum *within* each
    partition (parallel), then add each partition's exact global offset —
    the per-partition totals are one tiny row per partition, broadcast
    back.  Results are identical to the global window for any partition
    count (offsets are exact), so ``num_partitions`` is purely a
    parallelism knob."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    from pyspark.sql import Window  # noqa: PLC0415

    part = (
        df.select(F.col(order_col), F.col(tokens_col).cast("long").alias("__tok"))
        .repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = F.coalesce(F.sum("__tok").over(w), F.lit(0))
    # range partitions are assigned in key order, so cumulating totals by
    # __pid (a #partitions-row frame — single-partition window is fine
    # THERE) yields each partition's global token offset.
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("__pid")
        .agg(F.sum("__tok").alias("__t"))
        .select("__pid", F.coalesce(F.sum("__t").over(woff), F.lit(0)).alias("__off"))
    )
    start = (local + F.col("__off")).cast("long")
    return part.join(F.broadcast(offsets), "__pid").select(
        F.col(order_col),
        F.col("__tok").alias(tokens_col),
        F.floor(start / window).cast("long").alias("bin"),
        (start % window).cast("long").alias("bin_offset"),
    )


def pack_sequential_sql(
    table_expr: str, order_col: str, tokens_expr: str, window: int
) -> str:
    start = (
        f"CAST(COALESCE(SUM(toks) OVER (ORDER BY {order_col}"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    )
    return f"""
SELECT {order_col}, toks AS n_tokens,
       CAST(FLOOR({start} / {window}) AS BIGINT) AS bin,
       CAST({start} % {window} AS BIGINT) AS bin_offset
FROM (SELECT {order_col}, CAST({tokens_expr} AS BIGINT) AS toks FROM {table_expr})
"""


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    window: int,
    num_shards: int = 8,
) -> DataFrame:
    """Greedy no-straddle packing: within a shard, walk docs in id order
    and open a new bin whenever the next doc would overflow ``window``
    (docs longer than the window get a bin of their own).  Genuinely
    sequential per shard → Arrow-batched ``applyInPandas`` per shard,
    shards processed in parallel.  Bin ids are (shard, local_bin) so two
    shards never collide — at corpus scale shards ≈ partitions and the
    operator is one groupBy shuffle."""
    if window <= 0 or num_shards <= 0:
        raise ValueError(f"window/num_shards must be positive: {window}/{num_shards}")
    import pandas as pd  # noqa: PLC0415

    schema = f"shard long, {id_col} long, {tokens_col} long, bin long"

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, used, cur = [], 0, 0
        for n in pdf[tokens_col]:
            if used > 0 and used + n > window:
                cur, used = cur + 1, 0
            bins.append(cur)
            used += n
        pdf["bin"] = bins
        return pdf[["shard", id_col, tokens_col, "bin"]]

    sharded = df.select(
        (F.col(id_col) % num_shards).alias("shard"),
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return sharded.groupBy("shard").applyInPandas(pack, schema=schema)


# --- scale-safe global row numbering ---------------------------------------


def stable_ordinal(
    df: DataFrame,
    order_cols: list[str],
    descending: tuple[bool, ...] | None = None,
    n_parts: int | None = None,
    alias: str = "ordinal",
) -> DataFrame:
    """Contiguous 1-based global ordinals in total order, without the
    single-partition collapse.

    ``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
    entire input through ONE task — the classic 100 TB scale-killer.
    Two-phase form instead:

    1. range-repartition on the order key + sort within partitions (ONE
       parallel sort shuffle — the same cost class as any global sort),
       persisted so both passes below read the identical materialized
       partitioning (without the pin, AQE coalescing / boundary
       resampling may partition the two jobs differently — observed as
       phantom ordinals at sf0.01);
    2. ``monotonically_increasing_id`` encodes (partition id << 33) +
       the row's within-partition position — deterministic over the
       sorted cache; per-partition row counts (one tiny agg, ≤ n_parts
       rows after partial aggregation) become driver-side prefix
       offsets;
    3. ordinal = offset[pid] + within-partition position + 1 — pure
       map-side arithmetic, no window, no second data shuffle.

    ``order_cols`` must be a total order (append a unique tiebreaker):
    range partitioning co-locates boundary keys deterministically and
    the within-partition sort fixes row order, so ordinals are stable.
    The persist is MEMORY_AND_DISK; call ``.unpersist()`` on the result
    when the downstream plan has materialized if memory is tight.
    """
    from pyspark import StorageLevel  # noqa: PLC0415

    desc = descending or tuple(False for _ in order_cols)
    cols = [
        F.col(c).desc() if d else F.col(c).asc()
        for c, d in zip(order_cols, desc)
    ]
    n = n_parts or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with_mid = parted.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftright("__mid", 33)
    sizes = (
        with_mid.groupBy(pid.alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    offsets, run = {}, 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = run
        run += row["__n"]
    off_map = F.create_map(
        *[F.lit(int(v)) for kv in sorted(offsets.items()) for v in kv]
    )
    pos_in_part = F.col("__mid") - F.shiftleft(pid, 33)
    return with_mid.withColumn(
        alias,
        (off_map[pid] + pos_in_part + 1).cast("long"),
    ).drop("__mid")


# --- connected components (near-dup clustering) ----------------------------


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Min-label propagation over undirected edges ``(a, b)``: every node's
    label converges to the smallest node id in its component — the
    canonical "keep the first, drop the rest" dedup decision.

    Each round: label[n] ← min(label[n], min over neighbors' labels) —
    one join on the edge list + one groupBy, both shuffling on node id.
    Converges in O(diameter) ≤ O(log n) rounds for near-dup clusters
    (which are small and dense); a checkpoint after each round truncates
    lineage so round k does not replay rounds 1..k-1.  Terminates early
    when a round changes no label (count of improved labels == 0 — a
    cheap driver-side scalar per round).

    ``reliable_checkpoint=False`` uses ``localCheckpoint`` (executor-local
    blocks — fast, but lost with an executor).  At corpus scale pass
    ``True`` to write rounds to the configured checkpoint dir instead:
    an executor loss then re-reads the last round rather than replaying
    the whole LSH pipeline (same trade documented on
    ``dedup.lsh_candidate_pairs``).
    """

    def _ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    sym = _ckpt(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col("node"), F.col("node").alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        improved = _ckpt(
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "new_label"
                ),
                F.col("label"),
            )
        )
        n_changed = improved.filter(F.col("new_label") < F.col("label")).count()
        labels = improved.select("node", F.col("new_label").alias("label"))
        if n_changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster"))


def connected_components_sql(edges_cte: str, nodes_cte: str) -> str:
    """DuckDB oracle: recursive transitive reachability, then MIN per node.
    Exponential-ish on big graphs — oracle-scale only; the Spark operator
    is the scale path."""
    return f"""
WITH RECURSIVE
pairs AS ({edges_cte}),
nodes AS ({nodes_cte}),
sym AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.node = s.dst
)
SELECT node, CAST(MIN(r) AS BIGINT) AS cluster FROM reach GROUP BY node
"""


# --- Luhn-validated card-number detection ----------------------------------

CCN_RE = "[0-9]{16}"


def _luhn_sum(digit) -> str:
    """Shared Luhn-sum term generator over a 16-char digit string.

    For even-length numbers the doubled digits sit at odd 1-based
    positions; a doubled value v contributes its digit sum (v - 9 when
    v > 9, i.e. when the digit > 4).  All integer arithmetic — both
    dialects agree exactly.  ``digit(i)`` renders digit i as an INT
    expression in the target dialect.
    """
    terms = []
    for i in range(1, 17):
        d = digit(i)
        if i % 2 == 1:
            terms.append(f"(2 * {d} - (CASE WHEN {d} > 4 THEN 9 ELSE 0 END))")
        else:
            terms.append(d)
    return " + ".join(terms)


def luhn_valid_expr(col_name: str) -> str:
    """Spark SQL: TRUE iff ``col_name`` (a CHEAP column reference — stage
    the candidate first) is a 16-digit string passing the Luhn checksum
    (ISO/IEC 7812), the standard card-number validity test used to cut
    false positives in PII scrubbing.  Fully unrolled integer expression:
    codegen-inline, no UDF, no loop."""
    total = _luhn_sum(lambda i: f"CAST(substring({col_name}, {i}, 1) AS INT)")
    return f"(length({col_name}) = 16 AND ({total}) % 10 = 0)"


def luhn_valid_sql(col_name: str) -> str:
    """DuckDB twin of :func:`luhn_valid_expr`."""
    total = _luhn_sum(lambda i: f"CAST(substr({col_name}, {i}, 1) AS INT)")
    return f"(length({col_name}) = 16 AND ({total}) % 10 = 0)"


def table_checksum(df, cols=None):
    """Order-insensitive distributed table checksum — the CHECKSUM TABLE
    analog (MariaDB surface above the reference handler; also the
    pt-table-checksum replica-comparison primitive).

    Canonicalization is separator-free by construction: every column
    value maps to its fixed-width md5 hex (NULL -> literal 'N', which no
    32-hex token can collide with), the concatenation is hashed again,
    truncated to int64, and SUMmed.  The sum is commutative/associative,
    so the aggregate is map-side combined and two tables compare with one
    number each regardless of partitioning or row order.

    Returns a 1-row DataFrame (n_rows BIGINT, checksum BIGINT).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    use = cols or df.columns
    tokens = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N")) for c in use
    ]
    staged = df.select(F.concat(*tokens).alias("__row"))
    # accumulate in DECIMAL(38,0) (exact at any row count) and reduce
    # modulo a < 2^63 prime — ANSI int64 SUM overflows past ~10^4 rows of
    # 60-bit hashes, and the modular residue compares just as well
    return staged.select(
        F.expr(
            "CAST(conv(substr(md5(__row), 1, 15), 16, 10) AS DECIMAL(38,0))"
        ).alias("__h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum("__h") % F.lit(9223372036854775783).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("checksum"),
    )


def table_checksum_sql(rel: str, cols: list) -> str:
    """DuckDB oracle twin of :func:`table_checksum` (same tokenization)."""
    tokens = " || ".join(
        f"COALESCE(md5(CAST({c} AS VARCHAR)), 'N')" for c in cols
    )
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CAST(('0x' || substr(md5({tokens}), 1, 15)) AS BIGINT))"
        f" % 9223372036854775783 AS BIGINT) AS checksum FROM ({rel})"
    )
