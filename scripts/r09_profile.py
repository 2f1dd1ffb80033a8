#!/usr/bin/env python
"""Profile individual headline queries: N timed repetitions each, with
the noop sink (computes every column, no result transfer) and the
bench's .collect() for comparison.

Usage: python scripts/r09_profile.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sink", choices=["collect", "noop"], default="collect")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r09-profile")
    specs = all_specs()
    # warm the JVM + parquet footers like bench.py does
    specs["q01_pricing_summary"].spark(spark, sf_dir).collect()

    # warm the python worker pool like bench.py does (one wave of 2
    # tasks per core importing pandas/numpy + the native codec stack),
    # so rep-1 numbers aren't inflated by cold-worker imports
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
    for name in args.queries:
        spec = specs[name]
        times = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            start = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(time.perf_counter() - start)
        ts = ", ".join(f"{x:.3f}" for x in times)
        print(f"{name}: [{ts}] min={min(times):.3f} ({args.sink})")


if __name__ == "__main__":
    main()
