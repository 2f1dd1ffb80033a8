#!/usr/bin/env python
"""Storage-partitioned join scale probe (BASELINE.md source).

Writes two co-dimensioned native arrays (N rows each, range-partitioned
fragments, 70% key overlap), then times the same inner dim-key join two
ways at identical parallelism:

  copartitioned — copartitioned_join_arrays: ONE split plan, both sides
                  read per task, local pandas merge.  Exchanges: 1
                  (byte-sized split ids).
  shuffle       — read_array(A) JOIN read_array(B) in Spark SQL: both
                  sides leave their scan tasks, hash-partition on k,
                  sort-merge (or hash) join.  Exchanges: 2 full-data.

The claim to verify: the copartitioned join removes BOTH full-data
exchanges, so its advantage grows with row width x row count; at 100 TB
a fact-to-fact dim-key join is a double full-corpus shuffle in plain
Spark and a map-only pass here.

Usage: python scripts/copartition_probe.py [n_rows_per_side] [splits]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    splits = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np

    from tiledb_mariadb_spark.session import get_spark
    from tiledb_mariadb_spark.sources.tiledb_array import (
        copartitioned_join_arrays,
        read_array,
    )
    from tiledb_mariadb_spark.sources.tiledb_native import (
        NativeAttr,
        NativeDim,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_write import (
        create_native_array,
        write_native_fragment,
    )

    base = tempfile.mkdtemp(prefix="cpj_probe_")
    ua, ub = base + "/a", base + "/b"
    nfrag = 16
    dims = [NativeDim("k", 1, 1, (0, 4 * n), None)]
    for uri, names in ((ua, ("va", "wa")), (ub, ("vb", "wb"))):
        create_native_array(
            uri, dims=dims,
            attrs=[
                NativeAttr(names[0], 1, 1, False, None),
                NativeAttr(names[1], 3, 1, False, None),
            ],
        )
    t0 = time.time()
    step = -(-n // nfrag)
    for f in range(nfrag):
        lo, hi = f * step, min((f + 1) * step, n)
        ka = np.arange(lo, hi, dtype=np.int64) * 2          # evens
        kb = ka + (np.arange(lo, hi, dtype=np.int64) % 10 >= 7) * 1
        # ^ 70% of B keys match A's evens, 30% land on odd keys
        write_native_fragment(
            ua, {"k": ka, "va": ka * 3, "wa": ka * 0.5},
            ts=f + 1, version=19)
        write_native_fragment(
            ub, {"k": kb, "vb": kb * 7, "wb": kb * 0.25},
            ts=f + 1, version=19)
    t_write = time.time() - t0
    print(f"write: 2x{n} rows / {nfrag} frags each in {t_write:.2f}s")

    spark = get_spark("cpj-probe")
    # warm the Python worker pool + Arrow codegen so neither path pays
    # the one-time session cost (it dominated a 4M-row first job 6:1)
    read_array(spark, ua, target_splits=splits).count()
    read_array(spark, ub, target_splits=splits).count()

    t0 = time.time()
    cpj = copartitioned_join_arrays(
        spark, ua, ub, target_splits=splits,
    )
    n_cpj = cpj.count()
    t_cpj = time.time() - t0

    t0 = time.time()
    a = read_array(spark, ua, target_splits=splits)
    b = read_array(spark, ub, target_splits=splits)
    sj = a.join(b, "k", "inner")
    n_sj = sj.count()
    t_sj = time.time() - t0

    assert n_cpj == n_sj, (n_cpj, n_sj)
    plan = cpj._jdf.queryExecution().executedPlan().toString()
    print(
        f"rows joined: {n_cpj}; copartitioned {t_cpj:.2f}s "
        f"(exchanges={plan.count('Exchange')}, join_nodes="
        f"{plan.count('Join')}) vs shuffle {t_sj:.2f}s -> "
        f"{t_sj / t_cpj:.2f}x"
    )


if __name__ == "__main__":
    main()
