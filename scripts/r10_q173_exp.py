#!/usr/bin/env python
"""q173 restructure experiment: interleaved warm timing of variants vs
the current spec, with row-set equality checked against the current
output.  Variants (all bit-identical by construction):

  cur  — the committed spec
  v2   — minhash signatures computed ONCE over all docs (%5 flag),
         persisted; corpus/batch are filters of the cached frame
  v3   — v2 + the candidate-bounded shingle-set frame persisted before
         its two broadcasts (one subtree instead of two)
  v4   — array-of-mins: one `mh` array column instead of 8 mh<j>
         columns (codegen shrink), bands read mh[i]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tiledb_mariadb_spark.functions import dedup as D  # noqa: E402
from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs, spread, t  # noqa: E402

P = D._MINHASH_P


def minhash_inline_arr(df, text_col, id_cols, k=3, num_hashes=8):
    """with_minhash_inline, but the 8 mins land in ONE array column."""
    words = f"split(trim({text_col}), ' ')"
    sh = (
        f"transform(sequence(1, size({words}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({words}, i, {k})))"
    )
    h31 = (
        f"(CAST(conv(substring(md5(concat('mh:', s)), 1, 15), 16, 10)"
        f" AS BIGINT) % {P})"
    )
    staged = df.withColumn("__hs", F.expr(f"transform({sh}, s -> {h31})"))
    consts = D._minhash_consts(num_hashes)
    arr = "array(" + ", ".join(
        f"array_min(transform(__hs, h -> ({a} * h + {b}) % {P}))"
        for a, b in consts
    ) + ")"
    return staged.select(*id_cols, F.expr(arr).alias("mh"))


def band_explode_arr(sigs, id_col, out, num_hashes=8, rows_per_band=2):
    num_bands = num_hashes // rows_per_band
    structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.col("mh")[b * rows_per_band].alias("h0"),
                F.col("mh")[b * rows_per_band + 1].alias("h1"),
            )
            for b in range(num_bands)
        ]
    )
    return sigs.select(
        F.col(id_col).alias(out), F.explode(structs).alias("bs")
    ).select(out, "bs.band", "bs.h0", "bs.h1")


def verify_tail(spark, d, cands):
    ids = (
        cands.select(F.col("index_id").alias("doc_id"))
        .union(cands.select(F.col("probe_id").alias("doc_id")))
        .distinct()
    )
    sets = (
        D.with_shingles(
            d.join(F.broadcast(ids), "doc_id", "left_semi"), "doc_id", "text", k=3
        )
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    return sets


def tail_join(cands, sets):
    return (
        cands.join(
            F.broadcast(
                sets.select(F.col("doc_id").alias("probe_id"), F.col("sh").alias("sp"))
            ),
            "probe_id",
        )
        .join(
            F.broadcast(
                sets.select(F.col("doc_id").alias("index_id"), F.col("sh").alias("si"))
            ),
            "index_id",
        )
        .withColumn("inter", F.size(F.array_intersect("sp", "si")).cast("long"))
        .filter(F.col("inter") >= 1)
        .select(
            "probe_id",
            "index_id",
            "inter",
            (
                F.col("inter")
                / (
                    F.size("sp").cast("long") + F.size("si").cast("long") - F.col("inter")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def v2(spark, sf_dir, arr=False, persist_sets=False):
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    mk = minhash_inline_arr if arr else D.with_minhash_inline
    sigs = mk(d, "text", ["doc_id"]).persist(StorageLevel.MEMORY_AND_DISK)
    corpus_sigs = sigs.filter(F.col("doc_id") % 5 != 0)
    batch_sigs = sigs.filter(F.col("doc_id") % 5 == 0)
    be = band_explode_arr if arr else D.band_explode
    idx = be(corpus_sigs, "doc_id", "index_id")
    probe = be(batch_sigs, "doc_id", "probe_id")
    cands = (
        idx.join(F.broadcast(probe), ["band", "h0", "h1"])
        .select("probe_id", "index_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sets = verify_tail(spark, d, cands)
    if persist_sets:
        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    out = tail_join(cands, sets)
    return out, [sigs, cands] + ([sets] if persist_sets else [])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "4"))
    spark = get_spark("r10-q173-exp")
    specs = all_specs()
    specs["q01_pricing_summary"].spark(spark, sf_dir).collect()

    def _warm_worker(batches):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        yield from batches

    spark.range(64, numPartitions=64).mapInPandas(_warm_worker, schema="id long").collect()

    def run_cur():
        df = specs["q173_incremental_dedup"].spark(spark, sf_dir)
        rows = df.collect()
        return rows, []

    def run_v(arr, psets):
        df, caches = v2(spark, sf_dir, arr=arr, persist_sets=psets)
        rows = df.collect()
        return rows, caches

    variants = {
        "cur": run_cur,
        "v2": lambda: run_v(False, False),
        "v3": lambda: run_v(False, True),
        "v4": lambda: run_v(True, True),
    }
    only = os.environ.get("ONLY")
    if only:  # cold single-variant mode: one first-run, print, exit
        t0 = time.perf_counter()
        rows, _ = variants[only]()
        print(f"COLD {only} {time.perf_counter() - t0:.3f} rows={len(rows)}")
        return
    # equality check once
    ref = None
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rnd in range(n):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"q173:{name}#{rnd}")
            t0 = time.perf_counter()
            rows, caches = fn()
            times[name].append(time.perf_counter() - t0)
            key = sorted((r.probe_id, r.index_id, r.inter, round(r.jaccard, 12)) for r in rows)
            if ref is None:
                ref = key
            elif key != ref:
                print(f"MISMATCH in {name}: {len(key)} vs {len(ref)} rows")
                sys.exit(1)
            for c in caches:
                c.unpersist()
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f} all={[round(x, 2) for x in ts]}")


if __name__ == "__main__":
    main()
