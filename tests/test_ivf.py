"""IVF ANN: deterministic training, map-only assignment (no shuffle in the
physical plan), partition-pruned search, and recall vs brute force."""

from __future__ import annotations

import re

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


def test_batch_search_probes_only_own_lists(spark, tmp_path):
    """Batch IVF: every result row must come from a list its query
    probed, and nprobe=all reproduces exact brute-force per query."""
    from tiledb_mariadb_spark.functions.ivf import ivf_search_batch
    from tiledb_mariadb_spark.functions.similarity import cosine_topk_batch

    emb = _embeddings(spark)
    k_lists = 8
    cents = train_centroids(emb, "vec_id", "embedding", k=k_lists, iters=2)
    path = str(tmp_path / "ivf_batch")
    corpus = emb.filter(F.col("vec_id") >= 5)
    write_ivf_index(assign_lists(corpus, cents, "embedding"), path)
    indexed = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    # approximate mode: results confined to each query's probed lists
    res = ivf_search_batch(
        indexed, cents, queries, "qid", "qv", "embedding", "vec_id",
        k=5, nprobe=2,
    )
    rows = res.collect()
    probed = {
        q["qid"]: set(probe_lists(cents, list(q["qv"]), 2))
        for q in queries.collect()
    }
    lists_of = {
        r["vec_id"]: r["list_id"]
        for r in indexed.select("vec_id", "list_id").collect()
    }
    for r in rows:
        assert lists_of[r["vec_id"]] in probed[r["qid"]]

    # exact mode (nprobe=all) equals brute force per query
    exact_ivf = ivf_search_batch(
        indexed, cents, queries, "qid", "qv", "embedding", "vec_id",
        k=5, nprobe=k_lists,
    )
    brute = cosine_topk_batch(
        corpus, queries, "vec_id", "embedding", "qid", "qv", k=5
    )
    a = {(r["qid"], r["vec_id"]) for r in exact_ivf.collect()}
    b = {(r["qid"], r["vec_id"]) for r in brute.collect()}
    assert a == b


def test_quantized_ann_recall(spark):
    """int8 quantization (q175) must preserve most of the exact top-k:
    recall@10 >= 0.7 against the float cosine ranking on real testdata.
    (The conformance hash only proves cross-engine agreement; this pins
    that the quantized scores still rank like the exact ones.)"""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions import similarity as S
    from tiledb_mariadb_spark.sources.registry import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    exact = S.cosine_topk(
        e.filter(F.col("vec_id") != 0),
        q.select(F.col("embedding").alias("qv")),
        "vec_id",
        "embedding",
        k=10,
    )
    qq = q.select(F.expr(S.quantize_int8_expr("embedding")).alias("qq"))
    quant = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select(
            "vec_id",
            F.expr(S.qdot_expr(S.quantize_int8_expr("embedding"), "qq")).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(10)
    )
    a = {r["vec_id"] for r in exact.collect()}
    b = {r["vec_id"] for r in quant.collect()}
    assert len(a & b) >= 7, (a, b)


def test_ivf_search_prunes_list_partitions(spark, tmp_path):
    """The scale claim behind the IVF layout: a stored index searched
    with nprobe < n_lists must only READ the probed list_id directories
    (partition pruning at the file level, not a post-scan filter)."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions.ivf import (
        probe_lists,
        train_centroids,
        assign_lists,
        ivf_search,
        write_ivf_index,
    )
    from tiledb_mariadb_spark.sources.registry import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = train_centroids(
        e.filter(F.col("vec_id") < 256), "vec_id", "embedding", k=8, iters=1
    )
    path = str(tmp_path / "ivf_prune")
    write_ivf_index(assign_lists(e, cents, "embedding"), path)
    stored = spark.read.parquet(path)
    qvec = [float(x) for x in e.orderBy("vec_id").limit(1).first()["embedding"]]
    res = ivf_search(stored, cents, qvec, "embedding", "vec_id", k=5, nprobe=2)
    probed = set(probe_lists(cents, qvec, 2))
    # inputFiles() lists the relation BEFORE pruning — the evidence is the
    # scan's PartitionFilters clause in the physical plan
    from tiledb_mariadb_spark.plans.audit import formatted_plan

    plan = formatted_plan(res)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan
    for lid in probed:
        assert str(lid) in m.group(1), (m.group(1), probed)
