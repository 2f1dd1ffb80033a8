"""Optimistic multi-writer concurrency: parallel appends to one tile
table must never lose a version or clobber the catalog (the fragment
directory is the atomic claim; the sidecar append serializes under the
commit lock).  The reference serializes writes inside one MariaDB server
process; a distributed lakehouse cannot — this pins the Delta-style
commit behavior."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable


def test_parallel_appends_all_commit(spark, tmp_path):
    t = TileTable.create(
        spark,
        str(tmp_path / "conc_t"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        allows_dups=True,
        overwrite=True,
    )
    n_writers, rows_each = 6, 20

    def append(i: int) -> int:
        df = spark.createDataFrame(
            [(i * 1000 + j, i) for j in range(rows_each)], ["k", "v"]
        )
        return t.write(df)

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        versions = list(ex.map(append, range(n_writers)))

    # every writer got a distinct version and every row is present
    assert len(set(versions)) == n_writers
    reread = TileTable(spark, str(tmp_path / "conc_t"))
    assert len(reread.schema.versions) == n_writers
    assert reread.read().count() == n_writers * rows_each
    # version log is sorted and gap-free from 1
    vs = [v["v"] for v in reread.schema.versions]
    assert vs == sorted(vs)
    assert set(vs) == set(range(1, n_writers + 1))


def test_lww_still_holds_after_concurrent_upserts(spark, tmp_path):
    t = TileTable.create(
        spark,
        str(tmp_path / "conc_lww"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )

    def upsert(i: int) -> int:
        df = spark.createDataFrame([(1, i), (2, i)], ["k", "v"])
        return t.write(df)

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(upsert, range(4)))

    # whichever writer claimed the HIGHEST version wins every coordinate
    reread = TileTable(spark, str(tmp_path / "conc_lww"))
    winner = max(
        reread.schema.versions, key=lambda r: r["v"]
    )["v"]
    got = {r["k"]: r["v"] for r in reread.read().collect()}
    # version numbers were claimed 1..4 in SOME order; the writer i that
    # claimed `winner` wrote v=i — recover i via the claim order
    order = {ver: i for i, ver in enumerate(versions)}
    assert got == {1: order[winner], 2: order[winner]}


def test_stale_commit_lock_is_broken(spark, tmp_path):
    """A lockfile left by a writer killed mid-commit must not wedge the
    table forever: locks older than the staleness bound are auto-broken
    (claim-by-rename, so only one waiter does it)."""
    import os
    import time

    uri = str(tmp_path / "stale_lock")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )
    lock = os.path.join(uri, ".commit.lock")
    with open(lock, "w") as f:
        f.write("{}")
    old = time.time() - 3600
    os.utime(lock, (old, old))  # owner "died" an hour ago
    v = t.write(spark.createDataFrame([(1, 10)], ["k", "v"]))
    assert v == 1
    assert not os.path.exists(lock)
    assert t.read().count() == 1


def test_fresh_lock_still_blocks(spark, tmp_path):
    import os

    import pytest

    uri = str(tmp_path / "fresh_lock")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )
    with open(os.path.join(uri, ".commit.lock"), "w") as f:
        f.write("{}")
    from tiledb_mariadb_spark.catalog import _sidecar_lock

    with pytest.raises(TimeoutError, match="commit lock busy"):
        with _sidecar_lock(uri, timeout=0.3):
            pass
    os.unlink(os.path.join(uri, ".commit.lock"))
    assert t.write(spark.createDataFrame([(1, 10)], ["k", "v"])) == 1


def test_write_precondition_detects_late_commit(spark, tmp_path):
    """write(_expect_versions=...) must refuse to publish when a version
    it did not merge has committed meanwhile (the consolidation
    lost-update guard), rolling back its data claim."""
    import os

    import pytest

    from tiledb_mariadb_spark.catalog import ConsolidationConflict

    uri = str(tmp_path / "conflict_t")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )
    t.write(spark.createDataFrame([(1, 10)], ["k", "v"]))  # v1
    other = TileTable(spark, uri)
    other.write(spark.createDataFrame([(1, 99)], ["k", "v"]))  # v2: late
    with pytest.raises(ConsolidationConflict, match=r"\[2\]"):
        t.write(
            spark.createDataFrame([(1, 10)], ["k", "v"]),
            _expect_versions={1},
        )
    # the aborted claim directory was rolled back and nothing committed
    fresh = TileTable(spark, uri)
    assert [v["v"] for v in fresh.schema.versions] == [1, 2]
    assert sorted(os.listdir(os.path.join(uri, "data"))) == [
        "__tile_v=1",
        "__tile_v=2",
    ]


def test_consolidate_remerges_concurrent_append(spark, tmp_path):
    """An append landing between consolidation's snapshot read and its
    baseline commit must survive: the commit aborts, the loop re-merges
    with the late fragment included (round-2 advisor item — previously
    the stale baseline's higher __tile_v shadowed the append)."""
    uri = str(tmp_path / "consol_race")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )
    t.write(spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]))
    t.write(spark.createDataFrame([(2, 21)], ["k", "v"]))

    real_read = TileTable.read
    fired = {"done": False}

    def race_read(self, *a, **kw):
        if not fired["done"]:
            fired["done"] = True
            # concurrent writer overwrites k=1 AFTER the snapshot was taken
            TileTable(spark, uri).write(
                spark.createDataFrame([(1, 999)], ["k", "v"])
            )
        return real_read(self, *a, **kw)

    TileTable.read = race_read
    try:
        t.consolidate()
    finally:
        TileTable.read = real_read

    rows = {r["k"]: r["v"] for r in TileTable(spark, uri).read().collect()}
    # without conflict detection this read returns k=1 → 10 (lost update)
    assert rows == {1: 999, 2: 21}


def test_consolidate_races_live_appenders(spark, tmp_path):
    """Consolidation under live concurrent appenders: whatever interleaving
    happens, no committed append may be lost or shadowed (the round-2
    advisor's lost-update scenario, exercised with real threads rather
    than an injected hook)."""
    import threading

    from tiledb_mariadb_spark.catalog import ConsolidationConflict

    uri = str(tmp_path / "consol_stress")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        overwrite=True,
    )
    t.write(spark.createDataFrame([(k, 0) for k in range(8)], ["k", "v"]))

    expected = {k: 0 for k in range(8)}
    lock = threading.Lock()
    done = threading.Event()

    def appender(tid: int) -> None:
        w = TileTable(spark, uri)
        for i in range(4):
            k, v = tid, tid * 100 + i
            w.write(spark.createDataFrame([(k, v)], ["k", "v"]))
            with lock:
                # versions are monotonically claimed, so the latest write
                # to a coordinate wins; each appender owns its own k
                expected[k] = v

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()

    def consolidator() -> None:
        c = TileTable(spark, uri)
        while not done.is_set():
            try:
                c.consolidate()
            except ConsolidationConflict:
                pass  # appenders still racing; try again next round

    ct = threading.Thread(target=consolidator)
    ct.start()
    for th in threads:
        th.join()
    done.set()
    ct.join()

    final = TileTable(spark, uri)
    final.consolidate()  # quiesced: must succeed and preserve everything
    got = {r["k"]: r["v"] for r in final.read().collect()}
    assert got == expected
    assert len(final.schema.versions) == 1


def test_native_fragment_writers_need_no_coordination(tmp_path):
    """The module claim under test: independent processes append native
    fragments concurrently with ZERO coordination and every write is
    visible afterwards (TileDB's multi-writer model) — including the
    footer count staying provable (disjoint key ranges)."""
    import multiprocessing as mp

    from tiledb_mariadb_spark.sources.tiledb_native import (
        NativeAttr,
        NativeDim,
        count_native_array,
        read_native_array,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_write import (
        create_native_array,
    )

    d = str(tmp_path / "mw")
    create_native_array(
        d,
        dims=[NativeDim("k", 1, 1, (0, 10**6), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )

    def writer(base):
        # fresh import in the child; unique ts per writer
        from tiledb_mariadb_spark.sources.tiledb_native_write import (
            write_native_fragment,
        )

        ks = list(range(base, base + 500))
        write_native_fragment(
            d, {"k": ks, "v": [k * 2 for k in ks]}, ts=1000 + base
        )

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=writer, args=(b,))
             for b in (0, 10_000, 20_000, 30_000)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    _s, rows = read_native_array(d)
    assert len(rows) == 2000
    assert rows[0] == (0, 0) and rows[-1] == (30_499, 60_998)
    assert count_native_array(d) == 2000  # disjoint NEDs -> provable
