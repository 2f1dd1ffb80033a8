#!/usr/bin/env python
"""Per-query Spark JOB counts + wall time (guide §1: at sf0.1 the bench is
orchestration-bound, so the job count IS the cost model).

Reads the DAGScheduler's nextJobId counter before/after each query run —
the delta is the number of jobs the query launched (collect included).

Usage: python scripts/r10_jobcount.py [query ...]   (default: all headline)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r10-jobcount")
    specs = all_specs()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import HEADLINE  # noqa: E402

    sys.path.pop(0)
    names = sys.argv[1:] or [n for n in HEADLINE if n in specs]

    jsc = spark.sparkContext._jsc.sc()

    def next_job_id() -> int:
        return int(jsc.dagScheduler().nextJobId())

    # warm like bench.py
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

    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(name)
        j0 = next_job_id()
        t0 = time.perf_counter()
        specs[name].spark(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        dj = next_job_id() - j0
        rows.append((name, dj, dt))
        print(f"{name:32s} jobs={dj:4d}  sec={dt:7.3f}  sec/job={dt / max(dj, 1):.3f}")
    rows.sort(key=lambda r: -r[1])
    print("\n== by job count ==")
    for name, dj, dt in rows[:25]:
        print(f"{name:32s} jobs={dj:4d}  sec={dt:7.3f}")
    print(f"TOTAL jobs={sum(r[1] for r in rows)} sec={sum(r[2] for r in rows):.2f}")


if __name__ == "__main__":
    main()
