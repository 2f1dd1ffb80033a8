"""Property-based aggregation/join parity: hypothesis generates random
(filter, group-key, aggregate-list) combinations and random equi-join
shapes, and the result multiset must match DuckDB exactly.

This generalizes the enumerated §2.3/§2.4 conformance queries the same
way test_property_pushdown.py generalizes §2.2: any random composition of
the covered operators must agree with the oracle, not just the curated
ones.  All aggregates are integer-exact (scaled-BIGINT sums for float
columns — see suite/__init__.py) so comparisons are bit-identical with no
accumulation-order caveats.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from tests.test_property_pushdown import predicate
from tiledb_mariadb_spark.sources.registry import load_table

# group-key expressions valid and identical in both dialects
GROUP_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "(l_partkey % 5)",
    "(l_suppkey % 3)",
    "CAST(l_quantity AS BIGINT)",
]

# aggregate expressions: integer-exact on both engines
AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT l_suppkey)",
    "CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT)",
    "MIN(l_orderkey)",
    "MAX(l_orderkey)",
    "MIN(l_returnflag)",
    "CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)",
]


@st.composite
def agg_query(draw):
    keys = draw(
        st.lists(st.sampled_from(GROUP_KEYS), min_size=1, max_size=2, unique=True)
    )
    aggs = draw(st.lists(st.sampled_from(AGGS), min_size=1, max_size=3, unique=True))
    pred = draw(predicate())
    having = draw(st.sampled_from([None, "COUNT(*) >= 2", "COUNT(*) >= 10"]))
    sel_keys = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
    sel_aggs = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    q = (
        f"SELECT {sel_keys}, {sel_aggs} FROM lineitem WHERE {pred} "
        f"GROUP BY {', '.join(keys)}"
    )
    if having:
        q += f" HAVING {having}"
    return q


def _multiset(rows) -> Counter:
    return Counter(tuple(r) for r in rows)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=agg_query())
def test_random_aggregates_match_oracle(spark, duck, q):
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    got = _multiset(spark.sql(q).collect())
    want = _multiset(duck.execute(q).fetchall())
    assert got == want, f"mismatch for query: {q}"


JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


@st.composite
def join_query(draw):
    jt = draw(st.sampled_from(JOIN_TYPES))
    o_lo = draw(st.integers(min_value=0, max_value=4000))
    c_pred = draw(st.sampled_from(
        ["c_nationkey < 12", "c_acctbal > 0", "c_mktsegment = 'BUILDING'"]
    ))
    # filters INSIDE subqueries so outer-join null-extension semantics are
    # unambiguous and identical across engines
    return (
        "SELECT o_orderkey, o_custkey, c_custkey, c_nationkey "
        f"FROM (SELECT * FROM orders WHERE o_orderkey > {o_lo}) o "
        f"{jt} (SELECT * FROM customer WHERE {c_pred}) c "
        "ON o.o_custkey = c.c_custkey"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=join_query())
def test_random_joins_match_oracle(spark, duck, q):
    for name in ("orders", "customer"):
        load_table(spark, SF_DIR, name).createOrReplaceTempView(name)
    got = _multiset(spark.sql(q).collect())
    want = _multiset(duck.execute(q).fetchall())
    assert got == want, f"mismatch for query: {q}"


@st.composite
def semi_anti_query(draw):
    kind = draw(st.sampled_from(["IN", "NOT IN", "EXISTS", "NOT EXISTS"]))
    c_pred = draw(st.sampled_from(
        ["c_nationkey < 12", "c_acctbal > 1000", "c_mktsegment = 'AUTOMOBILE'"]
    ))
    if kind in ("IN", "NOT IN"):
        # NOT IN over a possibly-empty/no-null key set (c_custkey is a key)
        return (
            "SELECT o_orderkey FROM orders WHERE o_custkey "
            f"{kind} (SELECT c_custkey FROM customer WHERE {c_pred})"
        )
    neg = "NOT " if kind == "NOT EXISTS" else ""
    return (
        "SELECT o_orderkey FROM orders o WHERE "
        f"{neg}EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey"
        f" AND {c_pred})"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=semi_anti_query())
def test_random_semi_anti_match_oracle(spark, duck, q):
    for name in ("orders", "customer"):
        load_table(spark, SF_DIR, name).createOrReplaceTempView(name)
    got = _multiset(spark.sql(q).collect())
    want = _multiset(duck.execute(q).fetchall())
    assert got == want, f"mismatch for query: {q}"
