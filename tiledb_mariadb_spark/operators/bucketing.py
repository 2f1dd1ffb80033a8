"""Bucketed co-location: shuffle-free joins on a pre-declared key.

The reference gets co-located key access for free — dimensions ARE the
physical sort order, so eq_ref/MRR index reads touch only matching tiles
(ha_mytile.cc:3838-4010, 4079-4221).  At Spark scale the analog is
bucketing: both join sides hash-partitioned into the same number of
buckets on the join key at WRITE time, so every subsequent join on that
key is exchange-free — the single biggest shuffle eliminator for a
repeatedly-joined 100 TB fact table.

``bucket_table`` writes a managed bucketed table (bucketBy + sortBy — the
sort gives parquet row-group locality inside each bucket, mirroring the
reference's in-tile cell order); ``assert_no_exchange`` is the plan audit
used by tests and docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_table(
    df: DataFrame,
    name: str,
    key: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed on ``key``.

    At 100 TB pick ``num_buckets`` so one bucket ≈ a few hundred MB per
    file (buckets × files-per-bucket tasks read in parallel); both sides
    of a recurring join must use the SAME bucket count and key.
    """
    if mode == "overwrite":
        # overwrite only replaces a REGISTERED table; an orphaned
        # warehouse directory (e.g. a prior process killed mid-write)
        # raises LOCATION_ALREADY_EXISTS — clear both.
        import os  # noqa: PLC0415
        import shutil  # noqa: PLC0415

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(
            os.path.join(wh.removeprefix("file:"), name.lower()),
            ignore_errors=True,
        )
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *key)
        .sortBy(*(sort_by or key))
        .format("parquet")
        .saveAsTable(name)
    )


def joined_bucketed(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst sees compatible hash
    output partitioning on both scans and plans a SortMergeJoin with no
    Exchange on either side."""
    return spark.table(left).join(spark.table(right), on=on, how=how)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the final physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
