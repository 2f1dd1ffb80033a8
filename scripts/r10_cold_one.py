#!/usr/bin/env python
"""One COLD query timing in a fresh process, with an optional SQLConf
override applied before the run (after the standard bench warmup).

Usage: python scripts/r10_cold_one.py <query> [conf=value ...]
Prints: <query> <sec> [conf=value ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    overrides = [a.split("=", 1) for a in sys.argv[2:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r10-cold-one")
    specs = all_specs()
    specs["q01_pricing_summary"].spark(spark, sf_dir).collect()

    def _warm_worker(batches):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        import tiledb_mariadb_spark.sources.tiledb_array  # noqa: F401, PLC0415
        import tiledb_mariadb_spark.sources.tiledb_native  # noqa: F401, PLC0415
        import tiledb_mariadb_spark.sources.tiledb_native_write  # noqa: F401, PLC0415

        yield from batches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 2, numPartitions=cpus * 2).mapInPandas(
        _warm_worker, schema="id long"
    ).collect()
    for k, v in overrides:
        spark.conf.set(k, v)
    t0 = time.perf_counter()
    specs[name].spark(spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    print(f"{name} {dt:.3f} {' '.join(sys.argv[2:])}")


if __name__ == "__main__":
    main()
