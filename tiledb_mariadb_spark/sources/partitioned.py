"""Date-partitioned ingestion — the default layout for an append-heavy
event table at 100 TB: hive partitions on the event date mean (a) every
daily/range query prunes directories before listing a single file, and
(b) ingestion only ever appends new partitions (no rewrite, no
compaction coupling).

The reference's analog is a datetime dimension with tile extents
(t/mrr_datetime_dimensions.test); hive date partitions are how Spark
expresses the same pruning contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_by_date(
    df: DataFrame, path: str, ts_col: str, mode: str = "append"
) -> None:
    """Write with a derived ``event_date`` hive partition column, sorted
    by ``ts_col`` within partitions so time-range predicates also skip
    row groups inside a day."""
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition("event_date")
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_date_range(
    spark: SparkSession, path: str, start: str, end: str
) -> DataFrame:
    """Inclusive date-range scan; the filter lands in PartitionFilters
    (directory pruning), not a post-scan filter."""
    return spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(start)) & (F.col("event_date") <= F.lit(end))
    )
