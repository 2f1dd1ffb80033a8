#!/usr/bin/env python
"""q290 assignment-shape experiment: the centroid argmax currently runs
as crossJoin(32) -> row_number window (full 32xN shuffle + sort).  A
groupBy(id).max(struct(cosc, -j, j, qv, nrm)) computes the same argmax
with MAP-SIDE partial aggregation (the 32 candidate rows of each id sit
consecutively in the same partition after the broadcast crossJoin), so
the exchange carries ~1 row per id instead of 32 (guide §2.3).
Ordering identity: (cosc, -j) is unique per id (j distinct), struct
comparison is lexicographic, doubles order identically to the window's
(cosc DESC, j ASC) including the NaN-greatest rule.

Interleaved warm timing + row-set equality vs the committed spec.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tiledb_mariadb_spark.functions import similarity as S  # noqa: E402
from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs, t  # noqa: E402
from tiledb_mariadb_spark.suite.pipeline_ops2 import (  # noqa: E402
    _Q290_PERT_SPARK,
    _Q290_THRESH,
)


def semdedup_pairs_maxby(corpus, centroids, id_col, threshold):
    from tiledb_mariadb_spark.functions.similarity import qdot_expr

    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        "qv",
        "nrm",
        "j",
        F.expr(f"({qdot_expr('qv', 'cv')} / (nrm * cnrm))").alias("cosc"),
    )
    best = F.max(
        F.struct(
            F.col("cosc").alias("cosc"),
            (-F.col("j")).alias("nj"),
            F.col("j").alias("j"),
            F.col("qv").alias("qv"),
            F.col("nrm").alias("nrm"),
        )
    ).alias("s")
    assigned = (
        scored.groupBy(id_col)
        .agg(best)
        .select(
            F.col(id_col), F.col("s.qv").alias("qv"),
            F.col("s.nrm").alias("nrm"), F.col("s.j").alias("cluster"),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("kept"),
            F.col(f"b.{id_col}").alias("dropped"),
            F.col("a.cluster").cast("long").alias("cluster"),
            F.expr(
                f"({qdot_expr('a.qv', 'b.qv')} / (a.nrm * b.nrm))"
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def build_inputs(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(_Q290_PERT_SPARK).alias("embedding"),
    )
    corpus = S.quantized_with_norm(e.unionByName(copies), "embedding").select(
        "vec_id", "qv", "nrm"
    )
    cents = S.seeded_centroids(
        e.filter(F.col("vec_id") < 256), "vec_id", "embedding", k=32
    )
    return corpus, cents


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "4"))
    spark = get_spark("r10-q290-exp")
    specs = all_specs()
    specs["q01_pricing_summary"].spark(spark, sf_dir).collect()

    def _warm(batches):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        yield from batches

    spark.range(64, numPartitions=64).mapInPandas(_warm, schema="id long").collect()

    def run_cur():
        return specs["q290_semdedup"].spark(spark, sf_dir).collect()

    def run_new():
        corpus, cents = build_inputs(spark, sf_dir)
        return (
            semdedup_pairs_maxby(corpus, cents, "vec_id", _Q290_THRESH)
            .orderBy("kept", "dropped")
            .collect()
        )

    only = os.environ.get("ONLY")
    variants = {"cur": run_cur, "new": run_new}
    if only:
        t0 = time.perf_counter()
        rows = variants[only]()
        print(f"COLD {only} {time.perf_counter() - t0:.3f} rows={len(rows)}")
        return
    ref = None
    times = {k: [] for k in variants}
    for rnd in range(n):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"q290:{name}#{rnd}")
            t0 = time.perf_counter()
            rows = fn()
            times[name].append(time.perf_counter() - t0)
            key = [tuple(r) for r in rows]
            if ref is None:
                ref = key
            elif key != ref:
                print(f"MISMATCH {name}: {len(key)} vs {len(ref)}")
                sys.exit(1)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(x, 2) for x in ts]}")


if __name__ == "__main__":
    main()
