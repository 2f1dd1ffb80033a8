"""Property-based window-function parity: hypothesis generates random
window specs (function × partition × order × frame) over orders and the
identical SQL text must agree with DuckDB row-for-row.

Determinism rules baked into the generator:
- ROWS frames and navigation functions always order by a TOTAL order
  (o_orderkey tiebreak) — ties under ROWS are engine-arbitrary;
- RANGE frames order by a single integer key (peers included, so
  duplicate keys are safe);
- aggregates stay integer (SUM/MIN/MAX/COUNT over BIGINT keys) — float
  accumulation order differs across engines.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.sources.registry import load_table

PARTS = ["", "PARTITION BY o_orderstatus", "PARTITION BY o_orderpriority"]
AGGS = ["SUM", "MIN", "MAX", "COUNT"]
INT_COLS = ["o_custkey", "o_orderkey"]


@st.composite
def window_expr(draw):
    part = draw(st.sampled_from(PARTS))
    kind = draw(
        st.sampled_from(["agg_rows", "agg_range", "rank", "nav", "running"])
    )
    if kind == "rank":
        fn = draw(st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"]))
        key = draw(st.sampled_from(["o_orderdate", "o_custkey"]))
        return f"{fn} OVER ({part} ORDER BY {key}, o_orderkey)"
    if kind == "nav":
        fn = draw(st.sampled_from(["LAG", "LEAD"]))
        col = draw(st.sampled_from(INT_COLS))
        off = draw(st.integers(min_value=1, max_value=3))
        return (
            f"{fn}({col}, {off}) OVER ({part} ORDER BY o_custkey, o_orderkey)"
        )
    agg = draw(st.sampled_from(AGGS))
    col = draw(st.sampled_from(INT_COLS))
    if kind == "agg_range":
        lo = draw(st.integers(min_value=0, max_value=50))
        hi = draw(st.integers(min_value=0, max_value=50))
        frame = f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
        return (
            f"CAST({agg}({col}) OVER ({part} ORDER BY o_custkey {frame})"
            f" AS BIGINT)"
        )
    if kind == "running":
        frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    else:
        lo = draw(st.integers(min_value=0, max_value=5))
        hi = draw(st.integers(min_value=0, max_value=5))
        frame = f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
    return (
        f"CAST({agg}({col}) OVER ({part} ORDER BY o_custkey, o_orderkey"
        f" {frame}) AS BIGINT)"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=window_expr())
def test_random_windows_match_oracle(spark, duck, expr):
    q = (
        f"SELECT o_orderkey, {expr} AS w FROM orders "
        "WHERE o_orderkey <= 2000 ORDER BY o_orderkey"
    )
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    got = [(r[0], r[1]) for r in spark.sql(q).collect()]
    want = [tuple(r) for r in duck.execute(q).fetchall()]
    assert got == want, f"mismatch for window: {expr}"
