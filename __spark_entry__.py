"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H Q1-style pricing summary) on
  /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2,
  assembled from :mod:`tiledb_mariadb_spark.suite`.
- ``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted for
  genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiledb_mariadb_spark.suite import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
