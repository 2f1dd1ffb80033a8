"""Randomized differential fuzz of the unified JVM provider: arbitrary
WHERE conjunctions + aggregate sets + optional FLOOR-bucket grouping
over format("tiledb_agg") must equal the same query over a plain
in-memory DataFrame of the identical rows — whichever physical path the
provider picks (metadata agg, grouped rollup, filtered bridge scan).

This is the trust test for the seams: filter translation (3VL), the
vacuous-IsNotNull fold, metadata-vs-scan agreement, grouped key order,
and the Arrow wire all sit under it."""

from __future__ import annotations

import random
import shutil

import pytest

from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    create_native_array,
    write_native_fragment,
)

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("jar") is None,
    reason="needs a JDK (javac + jar) to build the shim",
)

N = 400


def _mk(tmp_path, rng):
    uri = str(tmp_path / "fz")
    create_native_array(
        uri,
        [NativeDim("k", 1, 1, (0, 10**6), None)],
        [
            NativeAttr("a", 1, 1, False, None),
            NativeAttr("b", 1, 1, True, None),
            NativeAttr("f", 3, 1, False, None),
        ],
        capacity=rng.choice([50, 100, 10000]),
    )
    rows = {
        "k": list(range(N)),
        "a": [rng.randrange(0, 40) for _ in range(N)],
        "b": [None if rng.random() < 0.2 else rng.randrange(0, 40)
              for _ in range(N)],
        "f": [float(rng.randrange(0, 1000)) for _ in range(N)],
    }
    n_frag = rng.choice([1, 3])
    step = N // n_frag
    for i in range(n_frag):
        lo, hi = i * step, (N if i == n_frag - 1 else (i + 1) * step)
        write_native_fragment(
            uri,
            {c: rows[c][lo:hi] for c in rows},
            ts=i + 1, version=19,
        )
    return uri, rows


def _rand_where(rng):
    conjs = []
    for _ in range(rng.randrange(0, 3)):
        col = rng.choice(["k", "a", "b"])
        kind = rng.randrange(5)
        if kind == 0:
            conjs.append(f"{col} >= {rng.randrange(0, N)}")
        elif kind == 1:
            conjs.append(f"{col} <= {rng.randrange(0, N)}")
        elif kind == 2:
            conjs.append(f"{col} = {rng.randrange(0, 40)}")
        elif kind == 3:
            vals = sorted(rng.sample(range(0, 40), 3))
            conjs.append(f"{col} IN ({', '.join(map(str, vals))})")
        else:
            conjs.append(
                f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
            )
    return (" WHERE " + " AND ".join(conjs)) if conjs else ""


def _rand_aggs(rng):
    pool = [
        "COUNT(*)", "COUNT(b)", "SUM(a)", "MIN(a)", "MAX(a)",
        "SUM(b)", "MIN(k)", "MAX(k)", "AVG(a)", "SUM(f)", "MIN(f)",
    ]
    return rng.sample(pool, rng.randrange(1, 4))


def test_fuzz_agg_and_scan_vs_dataframe(spark, tmp_path):
    rng = random.Random(20260816)
    uri, rows = _mk(tmp_path, rng)
    from tiledb_mariadb_spark.sources.jvm_agg import agg_reader

    agg_reader(spark, uri).load().createOrReplaceTempView("fz_jvm")
    ref = spark.createDataFrame(
        list(zip(rows["k"], rows["a"], rows["b"], rows["f"])),
        "k long, a long, b long, f double",
    )
    ref.createOrReplaceTempView("fz_ref")
    for trial in range(25):
        where = _rand_where(rng)
        aggs = ", ".join(
            f"{a} AS c{i}" for i, a in enumerate(_rand_aggs(rng))
        )
        grouped = rng.random() < 0.5
        if grouped:
            w = rng.choice([1, 7, 50, 100])
            g = f"CAST(FLOOR(k/{w}) AS BIGINT)" if w > 1 else "k"
            q = (
                f"SELECT {g} AS grp, {aggs} FROM {{t}}{where} "
                f"GROUP BY {g} ORDER BY grp"
            )
        else:
            q = f"SELECT {aggs} FROM {{t}}{where}"
        got = [tuple(r) for r in spark.sql(q.format(t="fz_jvm")).collect()]
        exp = [tuple(r) for r in spark.sql(q.format(t="fz_ref")).collect()]
        assert got == exp, f"trial {trial}: {q}\n{got[:4]} != {exp[:4]}"
    # raw-row parity once (the scan path end-to-end, all columns)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM fz_jvm").collect()
    )
    exp = sorted(tuple(r) for r in spark.sql("SELECT * FROM fz_ref").collect())
    assert got == exp


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_fuzz_topn_limit_vs_dataframe(spark, tmp_path):
    """Round 9: randomized ORDER BY col [ASC|DESC] LIMIT n (the TopN
    zone-map pushdown + estimate-sized split plans) and bare LIMIT
    (advisory truncation) over format('tiledb_agg') must equal the
    in-memory DataFrame — across fragment layouts, nullable columns,
    filters, and tie-heavy value distributions."""
    rng = random.Random(20260817)
    uri, rows = _mk(tmp_path, rng)
    from tiledb_mariadb_spark.sources.jvm_agg import agg_reader

    agg_reader(spark, uri).load().createOrReplaceTempView("fz2_jvm")
    ref = spark.createDataFrame(
        list(zip(rows["k"], rows["a"], rows["b"], rows["f"])),
        "k long, a long, b long, f double",
    )
    ref.createOrReplaceTempView("fz2_ref")
    for trial in range(20):
        col = rng.choice(["k", "a", "b", "f"])
        desc = rng.random() < 0.5
        n = rng.choice([1, 3, 10, 50])
        where = _rand_where(rng)
        # total order via the unique dim tiebreak so both engines pick
        # the identical row SET under ties (a is tie-heavy by design)
        q = (
            f"SELECT k, {col} AS v FROM {{t}}{where} "
            f"ORDER BY {col} {'DESC' if desc else 'ASC'}, k LIMIT {n}"
        )
        got = [tuple(r) for r in spark.sql(q.format(t="fz2_jvm")).collect()]
        exp = [tuple(r) for r in spark.sql(q.format(t="fz2_ref")).collect()]
        assert got == exp, f"trial {trial}: {q}\n{got[:4]} != {exp[:4]}"
    # bare LIMIT (no sort): the advisory per-split truncation must
    # still deliver exactly n rows that all belong to the table
    full = {
        tuple(r) for r in spark.sql("SELECT k, a FROM fz2_ref").collect()
    }
    for n in (1, 7, 399, 400, 500):
        got = spark.sql(f"SELECT k, a FROM fz2_jvm LIMIT {n}").collect()
        assert len(got) == min(n, N)
        assert all(tuple(r) in full for r in got)
