"""Property-based scalar-expression parity: random integer expression
trees (arithmetic, integer division/modulo, CASE, LEAST/GREATEST,
ABS/sign) evaluated over lineitem must agree with DuckDB row-for-row.
Operands are bounded (pre-reduced mod 1000, +1 offsets on divisors) so
ANSI-mode Spark never overflows or divides by zero.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.sources.registry import load_table

BASE = [
    "(l_orderkey % 1000)",
    "(l_partkey % 997)",
    "(l_suppkey % 101)",
    "CAST(l_linenumber AS BIGINT)",
]


@st.composite
def int_expr(draw, depth: int = 0):
    if depth >= 3:
        return draw(st.sampled_from(BASE))
    kind = draw(
        st.sampled_from(
            ["base", "add", "sub", "mul", "idiv", "mod", "case", "minmax", "abs"]
        )
    )
    if kind == "base":
        return draw(st.sampled_from(BASE))
    a = draw(int_expr(depth=depth + 1))
    if kind == "abs":
        return f"abs({a} - 500)"
    b = draw(int_expr(depth=depth + 1))
    if kind == "add":
        return f"({a} + {b})"
    if kind == "sub":
        return f"({a} - {b})"
    if kind == "mul":
        return f"(({a} % 3001) * ({b} % 3001))"
    if kind == "idiv":
        # abs() both sides: DuckDB // FLOORS while Spark DIV truncates —
        # they only agree for non-negative operands (documented dialect
        # gap, deliberately excluded from the property)
        return f"(abs({a}) // ((abs({b}) % 97) + 1))"
    if kind == "mod":
        return f"(abs({a}) % ((abs({b}) % 97) + 1))"
    if kind == "minmax":
        fn = draw(st.sampled_from(["least", "greatest"]))
        return f"{fn}({a}, {b})"
    cmp_op = draw(st.sampled_from(["<", ">", "=", "<="]))
    c = draw(int_expr(depth=depth + 1))
    return f"(CASE WHEN {a} {cmp_op} {b} THEN {c} ELSE 0 - {c} END)"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=int_expr())
def test_random_scalar_exprs_match_oracle(spark, duck, expr):
    spark_expr = expr.replace("//", "DIV")
    base = (
        "SELECT l_orderkey, l_linenumber, CAST({e} AS BIGINT) AS v "
        "FROM lineitem WHERE l_orderkey <= 600 "
        "ORDER BY l_orderkey, l_linenumber"
    )
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    got = [tuple(r) for r in spark.sql(base.format(e=spark_expr)).collect()]
    want = [tuple(r) for r in duck.execute(base.format(e=expr)).fetchall()]
    assert got == want, f"mismatch for: {expr}"
