#!/usr/bin/env python
"""Interleaved A/B of spark.sql.join.preferSortMergeJoin (false = r9
session default vs true = Spark default) over the join-tier headline
queries.  The flag is a runtime SQLConf, so one process alternates it
batch by batch — same JVM warmth, steal phases hit both arms equally.

Usage: python scripts/r10_ab_smj.py [-n ROUNDS] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs  # noqa: E402

DEFAULT_QUERIES = [
    "q200_pagerank",
    "q31_join_multi",
    "q36_join_theta",
    "q100_volume_shipping",
    "q342_triple_join",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("queries", nargs="*", default=DEFAULT_QUERIES)
    args = ap.parse_args()
    queries = args.queries or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r10-ab-smj")
    specs = all_specs()
    specs["q01_pricing_summary"].spark(spark, sf_dir).collect()

    def _warm_worker(batches):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        yield from batches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 2, numPartitions=cpus * 2).mapInPandas(
        _warm_worker, schema="id long"
    ).collect()

    results: dict[tuple[str, str], list[float]] = {}
    for rnd in range(args.n):
        for flag in ("false", "true"):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", flag)
            for name in queries:
                spark.sparkContext.setJobDescription(f"{name} smj={flag} r{rnd}")
                t0 = time.perf_counter()
                specs[name].spark(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                results.setdefault((name, flag), []).append(dt)
    print(f"\n== {args.n} rounds, interleaved ==")
    for name in queries:
        f = results[(name, "false")]
        t = results[(name, "true")]
        print(
            f"{name:28s} preferSMJ=false min={min(f):.3f} med={sorted(f)[len(f) // 2]:.3f} | "
            f"preferSMJ=true min={min(t):.3f} med={sorted(t)[len(t) // 2]:.3f}"
        )


if __name__ == "__main__":
    main()
