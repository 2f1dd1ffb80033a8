"""Date-partitioned events layout: the range read prunes directories
(PartitionFilters) and returns exactly the in-range rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.plans.audit import partition_filters
from tiledb_mariadb_spark.sources.partitioned import ingest_by_date, read_date_range
from tiledb_mariadb_spark.sources.registry import load_table


def test_date_partitioned_ingest_and_pruned_read(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "by_date")
    ingest_by_date(events, path, "ts", mode="overwrite")

    scan = read_date_range(spark, path, "2024-01-05", "2024-01-07")
    pf = " ".join(partition_filters(scan))
    assert "event_date" in pf, pf

    got = scan.count()
    want = events.filter(
        (F.to_date("ts") >= "2024-01-05") & (F.to_date("ts") <= "2024-01-07")
    ).count()
    assert got == want > 0
