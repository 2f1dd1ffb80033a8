"""Property-based as-of join parity: random (key, ts) trade/quote tables
run through the custom union+window operator (operators/asof.py) must
match DuckDB's native ASOF JOIN row-for-row — including the edge cases
random data produces (no earlier quote, equal timestamps, duplicate
quote times per key)."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiledb_mariadb_spark.operators.asof import asof_join

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # key
        st.integers(min_value=0, max_value=50),     # ts (seconds)
        st.integers(min_value=1, max_value=999),    # value
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(trades=rows, quotes=rows)
def test_asof_matches_duckdb_native(spark, trades, quotes):
    # unique event ids so result rows are comparable sets; DuckDB ASOF
    # picks the LATEST quote with q_ts <= t_ts, breaking exact-time ties
    # arbitrarily among equal q_ts — dedupe quote (key, ts) to the max
    # value row so both engines face a deterministic winner
    q_dedup = {}
    for k, ts, v in quotes:
        q_dedup[(k, ts)] = max(v, q_dedup.get((k, ts), 0))
    quotes_u = [(k, ts, v) for (k, ts), v in q_dedup.items()]
    trades_u = [(i, k, ts, v) for i, (k, ts, v) in enumerate(trades)]

    tdf = spark.createDataFrame(
        [(i, k, f"2024-01-01 00:00:{ts:02d}" if ts < 60 else None, v)
         for i, k, ts, v in trades_u],
        "tid int, k int, ts_s string, tv int",
    ).selectExpr("tid", "k", "CAST(ts_s AS TIMESTAMP) AS ts", "tv")
    qdf = spark.createDataFrame(
        [(k, f"2024-01-01 00:00:{ts:02d}", v) for k, ts, v in quotes_u],
        "k int, ts_s string, qv int",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "qv")

    got = {
        r["tid"]: r["qv_asof"]
        for r in asof_join(
            tdf, qdf, on="k", left_ts="ts", right_ts="ts",
            right_values=["qv"], strict=False,
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE trades(tid INT, k INT, ts TIMESTAMP, tv INT)"
    )
    con.executemany(
        "INSERT INTO trades VALUES (?, ?, ?, ?)",
        [
            (i, k, f"2024-01-01 00:00:{ts:02d}", v)
            for i, k, ts, v in trades_u
        ],
    )
    con.execute("CREATE TABLE quotes(k INT, ts TIMESTAMP, qv INT)")
    con.executemany(
        "INSERT INTO quotes VALUES (?, ?, ?)",
        [(k, f"2024-01-01 00:00:{ts:02d}", v) for k, ts, v in quotes_u],
    )
    want = dict(
        con.execute(
            "SELECT t.tid, q.qv FROM trades t "
            "ASOF LEFT JOIN quotes q ON t.k = q.k AND t.ts >= q.ts"
        ).fetchall()
    )
    assert got == want, f"trades={trades_u} quotes={quotes_u}"


def test_asof_directions_and_tolerance_match_bruteforce(spark):
    """forward/nearest/tolerance vs a python brute force over randomized
    (key, ts) data — same guarantee the backward fuzz gives q38."""
    import random

    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.operators.asof import asof_join

    rng = random.Random(99)
    lrows, rrows = [], []
    for i in range(200):
        lrows.append((i, rng.randint(0, 5), rng.randint(0, 1000)))
    for j in range(150):
        rrows.append((rng.randint(0, 5), rng.randint(0, 1000), j))
    left = spark.createDataFrame(lrows, "lid int, k int, t long").select(
        "lid", "k", F.timestamp_micros(F.col("t")).alias("ts")
    )
    right = spark.createDataFrame(rrows, "k int, t long, rv int").select(
        "k", F.timestamp_micros(F.col("t")).alias("ts"), "rv"
    )

    def brute(direction, tol=None):
        out = {}
        for lid, k, t in lrows:
            cands = [(rt, rv) for (rk, rt, rv) in rrows if rk == k]
            back = max(((rt, rv) for rt, rv in cands if rt < t), default=None)
            fwd = min(((rt, rv) for rt, rv in cands if rt > t), default=None)
            pick = None
            if direction == "backward":
                pick = back
            elif direction == "forward":
                pick = fwd
            else:
                if fwd is None or (
                    back is not None and (t - back[0]) <= (fwd[0] - t)
                ):
                    pick = back
                else:
                    pick = fwd
            if pick is not None and tol is not None and abs(pick[0] - t) > tol:
                pick = None
            out[lid] = pick[1] if pick else None
        return out

    for direction in ("backward", "forward", "nearest"):
        got = {
            r["lid"]: r["rv_asof"]
            for r in asof_join(
                left, right, "k", "ts", "ts", ["rv"], direction=direction
            ).collect()
        }
        assert got == brute(direction), direction
    got_tol = {
        r["lid"]: r["rv_asof"]
        for r in asof_join(
            left, right, "k", "ts", "ts", ["rv"],
            direction="nearest", tolerance_us=50,
        ).collect()
    }
    assert got_tol == brute("nearest", tol=50)
