"""Conformance-query registry.

Every operator claimed in SURVEY.md §2 is declared here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) an equivalent ANSI-SQL oracle string DuckDB runs on
the same parquet tables.  The driver hash-compares both at sf0.01 — this is
the engine's correctness gate, mirroring the reference's golden-file mtr
suite (SURVEY.md §5) with DuckDB as the golden producer.

Determinism conventions (both engines MUST produce bit-identical values):

- float aggregates are accumulated as *scaled BIGINT sums*
  (``SUM(CAST(ROUND(x * 10^k) AS BIGINT)) / 10^k``): per-row scaling of
  k-decimal data lands ~1e-7 from an integer (never near a rounding tie),
  int64 summation is exact and order-independent, int64→double conversion
  is correctly rounded on both engines, and the final division is a single
  IEEE op.  (Plain double sums differ by accumulation order; DECIMAL sums
  are exact but DuckDB's int128→double cast double-rounds and its decimal
  rescale truncates where Spark rounds HALF_UP — all observed.)
- computed integer columns are cast to BIGINT on both sides (DuckDB's
  ``SUM(INTEGER)``/``SUM(BIGINT)`` is HUGEINT, ``EXTRACT`` is BIGINT;
  Spark's are long/int);
- per-row float arithmetic is written with identical parenthesization
  (IEEE ops on identical inputs are bit-identical);
- double→BIGINT casts go through FLOOR (Spark truncates, DuckDB rounds);
- any LIMIT/top-k is preceded by a *total* order (unique-key tiebreak), as
  the driver's hash is order-insensitive but row-set-sensitive.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from tiledb_mariadb_spark.session import tune_for_oracle
from tiledb_mariadb_spark.sources.registry import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


# Decimal type wide enough for any sf0.1 sum (≤ ~6e11 with 10 frac digits).
DEC = "decimal(28,10)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_oracle(spark)
    return load_table(spark, sf_dir, name)


def dsum(col, k: int = 2):
    """Deterministic double-valued SUM via scaled-BIGINT accumulation.

    ``k`` must cover the decimal digits of ``col`` (2 for raw prices/qty,
    6 for price*discount products).  See module docstring.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    scale = 10.0**k
    return F.sum(F.round(col * scale).cast("long")) / F.lit(scale)


def dsum_sql(expr: str, k: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum` (bit-identical by construction).

    The accumulated BIGINT is cast to DOUBLE *before* the division: Spark
    parses the ``100.0`` literal as DECIMAL(4,1), and BIGINT / DECIMAL would
    yield DECIMAL there (driver-confirmed q43 mismatch in round 1) while
    DuckDB yields DOUBLE.  DOUBLE / literal is DOUBLE on both engines, and
    int64→double conversion plus one IEEE division is bit-identical.
    """
    scale = repr(10.0**k)
    return (
        f"(CAST(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {scale})"
    )


def all_specs() -> dict[str, QuerySpec]:
    """Assemble the full registry from the category modules."""
    from tiledb_mariadb_spark.suite import (  # noqa: PLC0415
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        core,
        functions_surface,
        functions_surface2,
        functions_surface3,
        functions_surface4,
        functions_surface5,
        functions_surface6,
        functions_surface7,
        functions_surface8,
        joins,
        llm_ops,
        pipeline_ops,
        pipeline_ops2,
        pipeline_ops3,
        pipeline_ops4,
        pipeline_ops5,
        pipeline_ops6,
        pipeline_ops7,
        pipeline_ops8,
        similarity,
        spatial_ops,
        streaming_ops,
        subqueries,
        surfaces,
        surfaces2,
        surfaces3,
        tpch_extra,
        windows,
    )

    collected: dict[str, QuerySpec] = {}
    for mod in (
        joins,
        subqueries,
        windows,
        surfaces,
        llm_ops,
        pipeline_ops,
        pipeline_ops2,
        pipeline_ops3,
        pipeline_ops4,
        pipeline_ops5,
        pipeline_ops6,
        pipeline_ops7,
        pipeline_ops8,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        similarity,
        streaming_ops,
        spatial_ops,
        tpch_extra,
        surfaces2,
        surfaces3,
        functions_surface8,
        functions_surface7,
        functions_surface6,
        functions_surface5,
        functions_surface4,
        functions_surface3,
        functions_surface2,
        functions_surface,
        analytics,
        core,
    ):
        for s in mod.SPECS:
            if s.name in collected:
                raise ValueError(f"duplicate query name {s.name}")
            collected[s.name] = s

    # ORDER MATTERS: the driver hash-verifies only the FIRST 50 entries per
    # round.  Round 1 covered core/analytics/functions_surface* prefixes;
    # round 2 joins/subqueries/windows/surfaces/llm_ops; round 3
    # pipeline_ops(2)/similarity/spatial + the r1 reds + q77/q90/q164;
    # round 4 the native tier/tpch_extra/streaming/NULL-semantics window.
    # ROUND 5 (this window) rotates the next 50 never-driver-verified
    # specs to the front, leading with ALL round-4 additions (q279-q301 —
    # newest, least-driver-tested code: the Python Data Source, native
    # consolidation/deletes/count/metadata/evolution/hilbert/dense/
    # estimate tier, SemDeDup/dHash/funnel dedup), then the late round-3
    # graph/drift/IVF specs and the pipeline_ops3-5 remainder.
    # ROUND-6 remainder (60; q165/q167/q168/q133b/q134 + 5 spill to r7):
    # LEAD with the round-5 additions (newest, never driver-verified):
    # q308_native_encryption, q309_native_enum_write,
    # q310_native_stats_sql, q311_native_spatial, q312_secure_corpus,
    # then
    # q302_native_attr_stats,
    # q303_native_enum, q304_native_bio_scan, q305_native_vector_store,
    # q306_soma_matrix, q307_native_v19_stats,
    # q231, q232, q245, q248, q249, q252, q253,
    # q260, q198-q201, q202-q209, q218-q227, q235-q239,
    # q241-q244, q247, q257, q210_sentence_split,
    # q160/q161/q165/q167/q168, q133b_natural_join, q134_values_inline.
    # Fully EXPLICIT so later spec additions to these modules cannot
    # silently displace the driver's sampling window.
    front = [
        # round-4 native storage tier + Python Data Source (23)
        "q301_native_deletes", "q279_stream_native_sink",
        "q280_matryoshka_ann", "q281_token_budget_mix", "q282_k_anonymity",
        "q283_native_datetimes", "q284_python_datasource",
        "q285_datasource_stream", "q286_native_consolidation",
        "q287_diversity_sample", "q288_multirange_in",
        "q289_datasource_time_travel", "q290_semdedup",
        "q291_phash_neardup", "q292_native_count", "q293_native_metadata",
        "q294_native_evolution", "q295_native_hilbert",
        "q296_native_dense_partial", "q297_datasource_stacked",
        "q298_native_lifecycle", "q299_native_estimate",
        "q300_dedup_funnel",
        # late round-3 graph / drift / IVF additions (4)
        "q271_ivf_delete", "q269_triangle_count", "q270_embedding_drift",
        "q273_itemset_triples",
        # pipeline_ops3-5 remainder (15)
        "q183_dup_spans", "q184_lexical_topk", "q185_hybrid_rrf",
        "q186_epoch_shuffle", "q187_luhn_pii", "q188_rarity_score",
        "q189_bpe_merges", "q190_pq_ann", "q191_ivfpq",
        "q192_decontaminate", "q193_hll_cardinality",
        "q194_cm_heavy_hitters", "q195_bloom_prune", "q196_column_stats",
        "q197_dedup_keep_best",
        # scale-safe ordinal / ranking / analytics (5)
        "q212_global_ordinal", "q213_bm25_topk", "q214_regr_moments",
        "q215_bitwise_scalars", "q216_skyline",
        # co-purchase / drift / vocab (3) — q231/q232 slip to r6
        "q228_copurchase", "q229_chi2_drift", "q230_vocab_encode",
    ]
    assert len(front) == 50, f"round-5 front window is {len(front)}, want 50"
    missing = [n for n in front if n not in collected]
    assert not missing, f"front window names not registered: {missing}"

    specs: dict[str, QuerySpec] = {n: collected[n] for n in front}
    for n, s in collected.items():
        if n not in specs:
            specs[n] = s
    return specs
