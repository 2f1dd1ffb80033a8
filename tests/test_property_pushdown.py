"""Property-based pushdown parity: hypothesis generates random predicate
trees over lineitem (dim-style integer keys, float attrs, string attrs,
timestamps — the §2.2 matrix) and every tree must return the identical
row multiset on Spark and DuckDB.

This generalizes the reference's enumerated pushdown tests
(t/pushdown_ranges.test, t/query_conditions.test,
t/pushdown_two_predicates.test): instead of a fixed list of predicates,
any constant-only comparison/BETWEEN/IN/NULL-check combination under
AND/OR must agree with the oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.sources.registry import load_table

# (column, kind) pools — constants chosen to straddle the data's ranges
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
FLOAT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F"]
OPS = ["=", "<>", "<", "<=", ">", ">="]


@st.composite
def predicate(draw, depth: int = 0):
    kind = draw(
        st.sampled_from(
            ["int_cmp", "float_cmp", "str_cmp", "ts_cmp", "between", "in", "null"]
            + (["and", "or"] if depth < 2 else [])
        )
    )
    if kind == "ts_cmp":
        op = draw(st.sampled_from(OPS))
        month = draw(st.integers(min_value=1, max_value=12))
        day = draw(st.integers(min_value=1, max_value=28))
        year = draw(st.integers(min_value=1992, max_value=1998))
        return (
            f"l_shipdate {op} TIMESTAMP '{year}-{month:02d}-{day:02d} 00:00:00'"
        )
    if kind == "and" or kind == "or":
        left = draw(predicate(depth=depth + 1))
        right = draw(predicate(depth=depth + 1))
        return f"({left}) {kind.upper()} ({right})"
    if kind == "int_cmp":
        col = draw(st.sampled_from(INT_COLS))
        op = draw(st.sampled_from(OPS))
        v = draw(st.integers(min_value=0, max_value=7000))
        return f"{col} {op} {v}"
    if kind == "float_cmp":
        col = draw(st.sampled_from(FLOAT_COLS))
        op = draw(st.sampled_from(OPS))
        # two-decimal constants match the data's quantization: equality
        # predicates can actually hit, and parsing is exact in both engines
        v = draw(st.integers(min_value=0, max_value=10000)) / 100.0
        return f"{col} {op} {v}"
    if kind == "str_cmp":
        col = draw(st.sampled_from(STR_COLS))
        op = draw(st.sampled_from(["=", "<>", "<", ">"]))
        v = draw(st.sampled_from(STR_VALS))
        return f"{col} {op} '{v}'"
    if kind == "between":
        col = draw(st.sampled_from(INT_COLS + FLOAT_COLS))
        a = draw(st.integers(min_value=0, max_value=5000))
        b = draw(st.integers(min_value=0, max_value=5000))
        lo, hi = (a, b) if a <= b else (b, a)
        return f"{col} BETWEEN {lo} AND {hi}"
    if kind == "in":
        col = draw(st.sampled_from(INT_COLS))
        vals = draw(
            st.lists(st.integers(min_value=0, max_value=7000), min_size=1, max_size=5)
        )
        return f"{col} IN ({', '.join(map(str, vals))})"
    # IS [NOT] NULL — the reference's residual tier (never pushed there;
    # pushed fine here, results must still agree)
    col = draw(st.sampled_from(INT_COLS + STR_COLS))
    neg = draw(st.booleans())
    return f"{col} IS {'NOT ' if neg else ''}NULL"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_random_predicates_match_oracle(spark, duck, pred):
    q = (
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        f"WHERE {pred} ORDER BY l_orderkey, l_linenumber"
    )
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    got = [(r[0], r[1]) for r in spark.sql(q).collect()]
    want = duck.execute(q).fetchall()
    assert got == [tuple(r) for r in want], f"mismatch for predicate: {pred}"
