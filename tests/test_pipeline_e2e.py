"""End-to-end training-data pipeline: the composition story the
individual q6x/q7x queries verify piecewise — ingest → exact dedup →
quality/language filter → tokenize → fingerprint → near-dup prune →
similarity index — run as ONE DataFrame chain (single lazy plan, no
intermediate materialization until the final actions)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.functions import text as X
from tiledb_mariadb_spark.functions.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    with_shingles,
)
from tiledb_mariadb_spark.functions.ivf import (
    assign_lists,
    ivf_search,
    train_centroids,
)
from tiledb_mariadb_spark.sources.registry import load_table


def test_pipeline_end_to_end(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_raw = docs.count()

    # 1. exact dedup on normalized fingerprint (duplicates keep lowest id)
    fp = docs.withColumn("fp", X.fingerprint(F.col("text")))
    deduped = (
        fp.withColumn("keep", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keep"))
        .drop("keep", "fp")
    )
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_raw

    # 2. quality + language gate, 3. tokenize — all in one JVM projection
    feats = X.quality_features(F.col("text"))
    gated = (
        deduped.withColumn("n_tokens", feats["n_tokens"])
        .withColumn("stop_ratio", feats["stop_ratio"])
        .withColumn("lang", X.lang_id(F.col("text")))
        .filter((F.col("n_tokens") >= 5))
        .withColumn("bpe_tokens", X.bpe_token_count(F.col("text")))
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_dedup

    # 4. near-dup prune via MinHash-LSH candidates
    shingled = with_shingles(gated, "doc_id", "text", k=3)
    sigs = minhash_signatures(shingled, "doc_id", num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, rows_per_band=2)
    drop = pairs.select(F.col("b").alias("doc_id")).distinct()
    pruned = gated.join(drop, "doc_id", "left_anti")
    n_final = pruned.count()
    assert 0 < n_final <= n_gated

    # 5. similarity index over the embeddings of surviving docs
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    kept = emb.join(
        pruned.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    cents = train_centroids(kept, "vec_id", "embedding", k=4, iters=1)
    indexed = assign_lists(kept, cents, "embedding")
    q = [float(x) for x in kept.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    top = ivf_search(indexed, cents, q, "embedding", "vec_id", k=5, nprobe=2)
    rows = top.collect()
    assert len(rows) == 5
    assert rows[0]["cos"] >= rows[-1]["cos"]

    # the whole pipeline stayed JVM-side (no Python eval nodes)
    from tiledb_mariadb_spark.plans.audit import formatted_plan

    assert "BatchEvalPython" not in formatted_plan(pruned)
