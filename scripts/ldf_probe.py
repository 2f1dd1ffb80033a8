#!/usr/bin/env python
"""Microbench: driver-local frame as Scan ExistingRDD (tuple path) vs
LocalTableScan (ldf pandas path), warm session, min-of-N — quantifies
the per-site win of converting suite `return spark.createDataFrame(...)`
result frames (guide §4: removing a Python-worker round-trip per action).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import ldf  # noqa: E402


def main() -> None:
    spark = get_spark("ldf-probe")
    spark.range(10).collect()  # warm JVM
    for n in (4, 30, 600):
        rows = [(f"m{i % 7}", i, i * 100) for i in range(n)]
        schema = "k string, a long, b long"
        # warm the python worker pool once with the RDD path
        spark.createDataFrame(rows, schema).collect()
        for label, mk in (
            ("tuple", lambda: spark.createDataFrame(rows, schema)),
            ("ldf", lambda: ldf(spark, rows, schema)),
        ):
            for action, run in (
                ("collect", lambda df: df.collect()),
                ("orderBy", lambda df: df.orderBy("k", "a").collect()),
            ):
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    run(mk())
                    ts.append(time.perf_counter() - t0)
                print(
                    f"n={n:4d} {label:5s} {action:7s} "
                    f"min={min(ts)*1000:7.1f}ms  all="
                    + ",".join(f"{x*1000:.0f}" for x in ts)
                )


if __name__ == "__main__":
    main()
