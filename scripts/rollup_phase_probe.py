#!/usr/bin/env python
"""Phase breakdown for the q340/q343 rollup specs: time the fixture
ingest (create+write), the driver-side metadata rollup, and the
distributed triple-check scan separately (guide §1 — isolate before
optimizing)."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import t  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rollup-phase-probe")
    spark.range(10).collect()

    def _warm(batches):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        import tiledb_mariadb_spark.sources.tiledb_array  # noqa: F401, PLC0415

        yield from batches

    spark.range(64, numPartitions=64).mapInPandas(
        _warm, schema="id long"
    ).collect()

    from tiledb_mariadb_spark.sources.tiledb_array import (
        NativeDecoderBackend,
        read_array,
        write_array,
    )
    from tiledb_mariadb_spark.sources.tiledb_native import NativeAttr, NativeDim
    from tiledb_mariadb_spark.sources.tiledb_native_agg import (
        bucketed_agg_native,
        grid_agg_native,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_write import (
        create_native_array,
    )

    for rep in range(3):
        # ---- q343 shape
        uri = tempfile.mkdtemp(prefix="probe_grid_") + "/arr"
        t0 = time.perf_counter()
        create_native_array(
            uri,
            dims=[
                NativeDim("x", 1, 1, (0, 1_000_000), None),
                NativeDim("y", 1, 1, (0, 6_000_000), None),
            ],
            attrs=[NativeAttr("cents", 1, 1, False, None)],
            capacity=200,
        )
        src = t(spark, sf_dir, "orders").select(
            F.col("o_custkey").cast("bigint").alias("x"),
            F.col("o_orderkey").alias("y"),
            F.expr(
                "CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100.0D) AS BIGINT)"
            ).alias("cents"),
        )
        write_array(
            src.repartitionByRange(8, "x"), uri, backend=NativeDecoderBackend()
        )
        t1 = time.perf_counter()
        res = grid_agg_native(uri, {"x": 100, "y": 2048}, fields=["cents"])
        assert res is not None
        t2 = time.perf_counter()
        scan = (
            read_array(spark, uri, target_splits=8)
            .groupBy(
                F.expr("CAST(x DIV 100 AS BIGINT)").alias("bx"),
                F.expr("CAST(y DIV 2048 AS BIGINT)").alias("by"),
            )
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("cents").alias("s"))
            .collect()
        )
        t3 = time.perf_counter()
        print(
            f"q343 rep{rep}: write={t1-t0:.3f} meta={t2-t1:.3f} "
            f"scan={t3-t2:.3f} buckets={len(res['buckets'])} "
            f"audit={res['audit']}"
        )

        # ---- q340 shape
        uri2 = tempfile.mkdtemp(prefix="probe_bucket_") + "/arr"
        t0 = time.perf_counter()
        create_native_array(
            uri2,
            dims=[NativeDim("k", 1, 1, (0, 6_000_000), None)],
            attrs=[NativeAttr("cents", 1, 1, False, None)],
            capacity=200,
        )
        src2 = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.expr(
                "CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100.0D) AS BIGINT)"
            ).alias("cents"),
        )
        write_array(
            src2.repartitionByRange(8, "k"), uri2,
            backend=NativeDecoderBackend(),
        )
        t1 = time.perf_counter()
        res2 = bucketed_agg_native(uri2, 1024, fields=["cents"])
        assert res2 is not None
        t2 = time.perf_counter()
        (
            read_array(spark, uri2, target_splits=8)
            .groupBy(F.expr("CAST(k DIV 1024 AS BIGINT)").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("cents").alias("s"))
            .collect()
        )
        t3 = time.perf_counter()
        print(
            f"q340 rep{rep}: write={t1-t0:.3f} meta={t2-t1:.3f} "
            f"scan={t3-t2:.3f} buckets={len(res2['buckets'])} "
            f"audit={res2['audit']}"
        )


if __name__ == "__main__":
    main()
