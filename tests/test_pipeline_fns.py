"""Unit tests for corpus-pipeline operators beyond what the oracle specs
cover: convergence/termination of connected components, greedy-packing
invariants, determinism of the hash-keyed split/sample, plus
property-based fuzz (random graphs vs a Python union-find; random token
streams vs a Python greedy packer)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import pipeline as P


def test_connected_components_chain(spark):
    # Two components: a 4-chain (diameter > 1 round) and an isolated pair,
    # plus a singleton with no edges.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)],
                                  "node long")
    got = {
        r["node"]: r["cluster"]
        for r in P.connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_pack_greedy_invariants(spark):
    rows = [(i, n) for i, n in enumerate([100, 200, 300, 700, 50, 50, 480])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = P.pack_greedy(df, "doc_id", "n_tokens", window=512, num_shards=1)
    per_bin = (
        out.groupBy("bin")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_bin:
        # a bin only exceeds the window when it holds a single oversized doc
        assert r["tot"] <= 512 or r["n"] == 1
    # docs are packed in id order: bins are monotone in doc_id
    got = [r["bin"] for r in out.orderBy("doc_id").collect()]
    assert got == sorted(got)
    # 100+200 fit; 300 overflows -> new bin; 700 oversized alone; 50+50+480
    # overflows at 480
    assert got == [0, 0, 1, 2, 3, 3, 4]


def test_pack_sequential_offsets(spark):
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: (r["bin"], r["bin_offset"])
        for r in P.pack_sequential(df, "doc_id", "n_tokens", window=512).collect()
    }
    # doc1 straddles the 512 boundary; its bin is where its FIRST token lands
    assert out == {0: (0, 0), 1: (0, 300), 2: (1, 88)}


def test_split_deterministic_under_repartition(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = P.train_test_split(df, "doc_id", 0.2)
    b = P.train_test_split(df.repartition(13), "doc_id", 0.2)
    assert (
        a.join(b.withColumnRenamed("split", "split2"), "doc_id")
        .filter(F.col("split") != F.col("split2"))
        .count()
        == 0
    )
    frac = a.filter(F.col("split") == "test").count() / 2000
    assert 0.15 < frac < 0.25  # md5 fractions are ~uniform


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Random graphs: the distributed min-label propagation must agree
    with a driver-side union-find on every component assignment."""
    nodes = sorted({n for e in edges for n in e} | {0, 31})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}

    edges_df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    got = {
        r["node"]: r["cluster"]
        for r in P.connected_components(edges_df, nodes_df).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=700), max_size=30),
    window=st.integers(min_value=100, max_value=600),
)
def test_pack_greedy_matches_python_packer(spark, toks, window):
    """Random token streams: the per-shard Arrow packer must agree with a
    straight-line Python greedy walk (single shard isolates the order)."""
    bins, used, cur = [], 0, 0
    for n in toks:
        if used > 0 and used + n > window:
            cur, used = cur + 1, 0
        bins.append(cur)
        used += n
    rows = [(i, n) for i, n in enumerate(toks)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = P.pack_greedy(df, "doc_id", "n_tokens", window=window, num_shards=1)
    got = [r["bin"] for r in out.orderBy("doc_id").collect()]
    assert got == bins


def test_pipeline_ops_compose_with_streaming(spark):
    """The corpus-prep ops are stateless column transforms, so the same
    code runs unchanged on a readStream ingest path — streamed results
    must equal the batch results row-for-row."""
    from tests.conftest import SF_DIR
    from tiledb_mariadb_spark.streaming.events import run_to_completion

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def prep(df):
        tagged = P.train_test_split(df, "doc_id", test_frac=0.2)
        return tagged.select(
            "doc_id",
            "split",
            P.redact_pii(F.col("text")).alias("red"),
        ).filter(F.col("n_chars") > 50)

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    streamed = run_to_completion(prep(stream), "append")
    batch = prep(
        spark.read.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    a = {r["doc_id"]: (r["split"], r["red"]) for r in streamed.collect()}
    b = {r["doc_id"]: (r["split"], r["red"]) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "xx") for i in range(100)],
        "doc_id long, lang string",
    )
    out = P.stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == 50  # en kept with p=1.0


def test_input_validation(spark):
    import pytest

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="test_frac"):
        P.train_test_split(df, "doc_id", test_frac=1.5)
    with pytest.raises(ValueError, match="fractions"):
        P.stratified_sample(df, "doc_id", "doc_id", {"a": -0.1})
    with pytest.raises(ValueError, match="window"):
        P.pack_sequential(df, "doc_id", "doc_id", window=0)
    with pytest.raises(ValueError, match="num_shards"):
        P.pack_greedy(df, "doc_id", "doc_id", window=10, num_shards=0)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    nodes = spark.createDataFrame([(n,) for n in (1, 2, 3, 9)], "node long")
    got = {
        r["node"]: r["cluster"]
        for r in P.connected_components(
            edges, nodes, reliable_checkpoint=True
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_minhash_inline_equals_groupby(spark):
    """The in-row (zero-shuffle, streaming-legal) signature formulation is
    bit-identical to the explode+groupBy one, and plans with no Exchange."""
    from tiledb_mariadb_spark.functions import dedup as D
    from tiledb_mariadb_spark.plans.audit import formatted_plan
    from tiledb_mariadb_spark.sources.registry import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    inline = D.with_minhash_inline(d, "text", ["doc_id"])
    grouped = D.minhash_signatures(
        D.with_shingles(d, "doc_id", "text"), "doc_id"
    )
    a = sorted(tuple(r) for r in inline.collect())
    b = sorted(tuple(r) for r in grouped.collect())
    assert a == b
    assert "Exchange" not in formatted_plan(inline)


def test_setsim_join_is_exact(spark):
    """Prefix filtering must be lossless: setsim_join's result on random
    small corpora equals the brute-force all-pairs Jaccard-threshold
    join.  This pins the prefix-length arithmetic (an off-by-one there
    silently drops pairs — the failure mode LSH users accept but PPJoin
    exists to eliminate)."""
    import itertools
    import random

    from tiledb_mariadb_spark.functions.dedup import setsim_join

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(3, 12))))
            for i in range(25)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["a"], r["b"])
            for r in setsim_join(df, "doc_id", "text", 3, 5).collect()
        }
        sets = {i: set(txt.split()) for i, txt in docs}
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if un and 5 * inter >= 3 * un:
                want.add((a, b))
        assert got == want, (trial, got ^ want)


def test_stored_lsh_index_probe_matches_inline(spark, tmp_path):
    """write_lsh_index + probe_lsh_index reproduce the inline
    lsh_probe_pairs candidates exactly, and the probe plan broadcasts
    the batch side (the stored corpus index must never shuffle)."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions import dedup as D
    from tiledb_mariadb_spark.plans.audit import formatted_plan
    from tiledb_mariadb_spark.sources.registry import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    csigs = D.with_minhash_inline(corpus, "text", ["doc_id"])
    bsigs = D.with_minhash_inline(batch, "text", ["doc_id"])
    inline = {
        (r["probe_id"], r["index_id"])
        for r in D.lsh_probe_pairs(csigs, bsigs, "doc_id").collect()
    }
    path = str(tmp_path / "lsh_index")
    D.write_lsh_index(csigs, "doc_id", path)
    probed_df = D.probe_lsh_index(spark, path, bsigs, "doc_id")
    stored = {(r["probe_id"], r["index_id"]) for r in probed_df.collect()}
    assert stored == inline and stored
    plan = formatted_plan(probed_df)
    assert "BroadcastHashJoin" in plan, plan


def test_lsh_params_advisor():
    """(b, r) selection: the S-curve midpoint (1/b)^(1/r) must land near
    the requested threshold, and tighter thresholds get more rows per
    band (sharper curves)."""
    import pytest

    from tiledb_mariadb_spark.functions.dedup import lsh_params

    for thr in (0.3, 0.5, 0.7, 0.8, 0.9):
        n, b, r = lsh_params(thr)
        assert n == b * r <= 64
        t_star = (1.0 / b) ** (1.0 / r)
        assert abs(t_star - thr) < 0.05, (thr, b, r, t_star)
    # the suite's default (8 hashes, r=2) corresponds to a mid threshold
    _, b_low, r_low = lsh_params(0.3)
    _, b_high, r_high = lsh_params(0.9)
    assert r_high > r_low  # high precision needs sharper (more rows/band)
    with pytest.raises(ValueError):
        lsh_params(1.5)


def test_incremental_dedup_setverify_matches_explode(spark):
    """q173's set-based exact-Jaccard verify (collect_set +
    array_intersect, round 9) must reproduce the original
    explode->distinct->count formulation row for row: same candidate
    pairs, same distinct-intersection counts, same bit-exact jaccard
    (both divide the same int64 operands)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions import dedup as D
    from tiledb_mariadb_spark.sources.registry import load_table
    from tiledb_mariadb_spark.suite import all_specs

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["probe_id"], r["index_id"], r["inter"], r["jaccard"])
        for r in all_specs()["q173_incremental_dedup"]
        .spark(spark, sf_dir)
        .collect()
    }

    # reference: the pre-round-9 explode-based verify over the same data
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    cands = D.lsh_probe_pairs(
        D.with_minhash_inline(corpus, "text", ["doc_id"]),
        D.with_minhash_inline(batch, "text", ["doc_id"]),
        "doc_id",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    corpus_c = corpus.join(
        F.broadcast(cands.select(F.col("index_id").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    batch_c = batch.join(
        F.broadcast(cands.select(F.col("probe_id").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    cdist = D.with_shingles(corpus_c, "doc_id", "text", k=3).distinct()
    bdist = D.with_shingles(batch_c, "doc_id", "text", k=3).distinct()
    ps = bdist.select(F.col("doc_id").alias("probe_id"), "shingle")
    ixs = cdist.select(F.col("doc_id").alias("index_id"), "shingle")
    inter = (
        cands.join(ps, "probe_id")
        .join(ixs, ["index_id", "shingle"])
        .groupBy("probe_id", "index_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    pn = ps.groupBy("probe_id").agg(F.count(F.lit(1)).alias("np"))
    cn = ixs.groupBy("index_id").agg(F.count(F.lit(1)).alias("ni"))
    want = {
        (r["probe_id"], r["index_id"], r["inter"], r["jaccard"])
        for r in inter.join(pn, "probe_id")
        .join(cn, "index_id")
        .select(
            "probe_id",
            "index_id",
            "inter",
            (
                F.col("inter")
                / (F.col("np") + F.col("ni") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .collect()
    }
    cands.unpersist()
    assert got == want and got
