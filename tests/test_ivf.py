"""IVF ANN: deterministic training, map-only assignment (no shuffle in the
physical plan), partition-pruned search, and recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.functions.ivf import (
    assign_lists,
    ivf_search,
    probe_lists,
    recall_at_k,
    train_centroids,
    write_ivf_index,
)
from tiledb_mariadb_spark.functions.similarity import cosine_topk
from tiledb_mariadb_spark.plans.audit import partition_filters
from tiledb_mariadb_spark.sources.registry import load_table


def _embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


def test_assignment_is_map_only(spark):
    emb = _embeddings(spark)
    cents = train_centroids(emb, "vec_id", "embedding", k=4, iters=1)
    assigned = assign_lists(emb, cents, "embedding")
    plan = assigned._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Exchange" not in plan
    # total partition of the data: every row gets exactly one valid list
    dist = assigned.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in dist) == emb.count()
    assert all(r["list_id"] >= 0 for r in dist)


def test_training_is_deterministic(spark):
    emb = _embeddings(spark)
    a = train_centroids(emb, "vec_id", "embedding", k=4, iters=2)
    b = train_centroids(emb, "vec_id", "embedding", k=4, iters=2)
    assert a == b


def test_search_prunes_partitions_and_recalls(spark, tmp_path):
    emb = _embeddings(spark)
    n = emb.count()
    k_lists = 8
    cents = train_centroids(emb, "vec_id", "embedding", k=k_lists, iters=2)
    path = str(tmp_path / "ivf")
    write_ivf_index(assign_lists(emb, cents, "embedding"), path)
    indexed = spark.read.parquet(path)

    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]

    # nprobe=2 of 8 lists → the isin filter lands as a PartitionFilter
    # (directory pruning before any I/O)
    res = ivf_search(indexed, cents, qvec, "embedding", "vec_id", k=10, nprobe=2)
    approx = [r["vec_id"] for r in res.collect()]
    probes = probe_lists(cents, qvec, 2)
    pf = " ".join(partition_filters(res))
    assert "list_id" in pf and "IN" in pf, pf
    assert len(probes) == 2
    # and only probed lists appear in the result
    got_lists = {
        r["list_id"]
        for r in indexed.join(res.select("vec_id"), "vec_id").select("list_id").collect()
    }
    assert got_lists <= set(probes)

    query = spark.createDataFrame([(qvec,)], "qv array<float>")
    exact = [
        r["vec_id"]
        for r in cosine_topk(emb, query, "vec_id", "embedding", 10).collect()
    ]
    # the query vector itself lives in a probed list → recall well above chance
    assert recall_at_k(approx, exact) >= 0.5
    assert approx[0] == qrow["vec_id"]
    assert res.count() == 10
    assert n > 0
