"""Plan-shape audits for the round-2 late-batch operators: the scale
claims each spec's docstring makes must be visible in the physical plan,
so a regression to a naive shape fails here rather than at 100 TB.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_overlap_has_no_cartesian_or_bnl(spark):
    from tiledb_mariadb_spark.suite.analytics6 import q223_interval_overlap

    plan = _plan(q223_interval_overlap(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # bucket EQUI-join only


def test_copurchase_has_no_fact_self_join(spark):
    from tiledb_mariadb_spark.suite.pipeline_ops6 import q228_copurchase

    plan = _plan(q228_copurchase(spark, SF_DIR))
    # pair generation happens inside the per-order group (array lambdas),
    # so the plan must contain no join at all
    assert "Join" not in plan, plan


def test_equi_depth_hist_has_no_global_window(spark):
    from tiledb_mariadb_spark.suite.analytics6 import q224_equi_depth_hist

    plan = _plan(q224_equi_depth_hist(spark, SF_DIR))
    assert "Window" not in plan


def test_skyline_windows_are_partition_local_then_bounded(spark):
    from tiledb_mariadb_spark.suite.pipeline_ops5 import q216_skyline

    plan = _plan(q216_skyline(spark, SF_DIR))
    # local phase windows key on spark_partition_id — no unkeyed window
    # over the raw input (the only constant-key window runs over the
    # already-eliminated survivor set)
    assert plan.count("Window") >= 2


def test_bm25_stats_are_broadcast(spark):
    from tiledb_mariadb_spark.suite.pipeline_ops5 import q213_bm25_topk

    plan = _plan(q213_bm25_topk(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    # top-k must be TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_vocab_encode_joins_broadcast_only(spark):
    from tiledb_mariadb_spark.suite.pipeline_ops6 import q230_vocab_encode

    plan = _plan(q230_vocab_encode(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_attribution_single_user_shuffle(spark):
    from tiledb_mariadb_spark.suite.analytics5 import q222_attribution

    plan = _plan(q222_attribution(spark, SF_DIR))
    # window + aggregate ride the same user_id partitioning: at most the
    # initial shuffle plus the bounded final sort
    assert "Join" not in plan
