"""Z-order clustering: key parity with the Python reference, and the
locality property that motivates it (a small 2-D box after z-clustering
touches fewer files than round-robin layout)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tiledb_mariadb_spark.operators.zorder import (
    cluster_by_zorder,
    z_value,
    z_value_py,
)


def test_z_value_matches_python_reference(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select(
        "x", "y", z_value([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == z_value_py([r["x"], r["y"]], bits=8), (r["x"], r["y"])


def test_zorder_clustering_improves_box_locality(spark, tmp_path):
    grid = [(x, y, x * 256 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x int, y int, payload int")

    z_path = str(tmp_path / "zordered")
    cluster_by_zorder(df, ["x", "y"], num_partitions=16, bits=8).write.parquet(z_path)

    rr_path = str(tmp_path / "roundrobin")
    df.repartition(16).write.parquet(rr_path)

    def files_touched(path):
        scan = (
            spark.read.parquet(path)
            .filter(F.col("x").between(10, 17) & F.col("y").between(10, 17))
        )
        scan.collect()
        return len(set(scan.inputFiles()))

    assert len(glob.glob(f"{z_path}/*.parquet")) >= 8
    # Spark lists all files in inputFiles (no dynamic file skipping at this
    # API level), so compare row-group-level effectiveness via parquet
    # footers: in the z-ordered layout, the box rows live in few files.
    import pyarrow.parquet as pq

    def files_containing_box(path):
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                }
                x_st, y_st = cols["x"].statistics, cols["y"].statistics
                if x_st.min <= 17 and x_st.max >= 10 and y_st.min <= 17 and y_st.max >= 10:
                    n += 1
                    break
        return n

    z_touch = files_containing_box(z_path)
    rr_touch = files_containing_box(rr_path)
    assert z_touch < rr_touch, (z_touch, rr_touch)


def test_hilbert_cell_order_table_layout(spark, tmp_path):
    """cell_order='HILBERT' tables (t/hilbert.test) write Morton-clustered
    tiles: a 2-D box predicate touches fewer files than row-major range
    layout on the leading dim alone."""
    import glob

    import pyarrow.parquet as pq

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    grid = [(x, y, x * 256 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x int, y int, payload int")

    def files_containing_box(uri):
        n = 0
        for f in glob.glob(f"{uri}/data/__tile_v=1/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                }
                xs, ys = cols["x"].statistics, cols["y"].statistics
                if xs.min <= 17 and xs.max >= 10 and ys.min <= 17 and ys.max >= 10:
                    n += 1
                    break
        return n

    def make(uri, order):
        tt = TileTable.create(
            spark,
            uri,
            dimensions=[
                Dim("x", "int", lower=0, upper=63),
                Dim("y", "int", lower=0, upper=63),
            ],
            attributes=[Attr("payload", "int")],
            cell_order=order,
            # one row-major tile = ONE x-row (64 cells) vs one z tile =
            # an 8x8 block: an 8x8 box then needs 8 row-major tiles but
            # only ~1-4 z blocks — the geometry Hilbert order exists for
            capacity=64,
        )
        tt.write(df)
        return tt

    z = make(str(tmp_path / "hilb"), "HILBERT")
    r = make(str(tmp_path / "rowmaj"), "ROW_MAJOR")
    assert z.read().count() == r.read().count() == 4096
    assert files_containing_box(z.uri) < files_containing_box(r.uri)


def test_subarray_pushes_dim_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable
    from tiledb_mariadb_spark.plans.audit import pushed_filters

    tt = TileTable.create(
        spark,
        str(tmp_path / "sub"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "double")],
    )
    tt.write(spark.range(10_000).select(F.col("id").alias("k"), F.rand(5).alias("v")))
    df = tt.subarray({"k": (100, 199)})
    assert df.count() == 100
    pushed = " ".join(pushed_filters(df))
    assert "k" in pushed and "GreaterThanOrEqual" in pushed, pushed


def test_subarray_rejects_non_dimension(spark, tmp_path):
    import pytest

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "subbad"),
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "double")],
    )
    with pytest.raises(ValueError, match="not dimensions"):
        tt.subarray({"v": (0, 1)})


# --- true Hilbert curve ------------------------------------------------------


def test_hilbert_expr_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.operators.zorder import hilbert2_expr, hilbert2_py

    n = 16  # full 16x16 grid at bits=4
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
    )
    got = {
        (r["x"], r["y"]): r["h"]
        for r in grid.withColumn(
            "h", F.expr(hilbert2_expr("x", "y", bits=4))
        ).collect()
    }
    for x in range(n):
        for y in range(n):
            assert got[(x, y)] == hilbert2_py(x, y, bits=4), (x, y)


def test_hilbert_curve_is_continuous_morton_is_not():
    """Hilbert's defining property: consecutive index values are ADJACENT
    cells (Manhattan distance 1) — so any key range is a connected region.
    Morton provably violates this (the 'jump' at quadrant boundaries)."""
    from tiledb_mariadb_spark.operators.zorder import hilbert2_py, z_value_py

    bits, n = 4, 16
    by_h = sorted(
        ((x, y) for x in range(n) for y in range(n)),
        key=lambda p: hilbert2_py(p[0], p[1], bits=bits),
    )
    dists_h = [
        abs(a[0] - b[0]) + abs(a[1] - b[1]) for a, b in zip(by_h, by_h[1:])
    ]
    assert all(d == 1 for d in dists_h)

    by_z = sorted(
        ((x, y) for x in range(n) for y in range(n)),
        key=lambda p: z_value_py([p[0], p[1]], bits=bits),
    )
    dists_z = [
        abs(a[0] - b[0]) + abs(a[1] - b[1]) for a, b in zip(by_z, by_z[1:])
    ]
    assert any(d > 1 for d in dists_z)


def test_hilbert_table_box_scan_matches_rowmajor(spark, tmp_path):
    """A HILBERT-cell-order 2-D tile table must answer box queries
    identically to a plain copy (layout changes, results don't)."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    rows = spark.range(32 * 32).select(
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
        (F.col("id") * 7 % 101).alias("v"),
    )
    tt = TileTable.create(
        spark,
        str(tmp_path / "hil"),
        dimensions=[
            Dim("x", "int", lower=0, upper=31, tile_extent=8),
            Dim("y", "int", lower=0, upper=31, tile_extent=8),
        ],
        attributes=[Attr("v", "bigint")],
        cell_order="HILBERT",
        capacity=128,
    )
    tt.write(rows)
    got = (
        tt.read()
        .filter("x BETWEEN 4 AND 11 AND y BETWEEN 20 AND 27")
        .agg(F.sum("v"), F.count("*"))
        .collect()[0]
    )
    want = (
        rows.filter("x BETWEEN 4 AND 11 AND y BETWEEN 20 AND 27")
        .agg(F.sum("v"), F.count("*"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_explain_pruning_reports_skipped_files(spark, tmp_path):
    """EXPLAIN TILES: range-clustered layout must let a narrow dim range
    skip most fragment files, and the kept files must cover every
    matching row."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "prune"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "bigint")],
        capacity=1000,
    )
    tt.write(
        spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
    )
    rep = tt.explain_pruning({"k": (2100, 2399)}).collect()
    assert len(rep) >= 8  # capacity=1000 over 10k rows → ~10 files
    kept = [r for r in rep if r["kept"]]
    assert 1 <= len(kept) < len(rep) / 2, rep
    # sanity: the kept files hold at least the matching row count
    assert sum(r["rows"] for r in kept) >= 300
    import pytest

    with pytest.raises(ValueError, match="not dimensions"):
        tt.explain_pruning({"v": (0, 1)})


def test_optimize_recluster_by_attribute(spark, tmp_path):
    """OPTIMIZE CLUSTER BY(attr): after the rewrite, footer min/max on the
    attribute become near-disjoint across files (attribute predicates can
    skip files), results unchanged."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "opt"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "bigint")],
        capacity=1000,
    )
    # v is uncorrelated with k → every k-ordered file spans all of v
    tt.write(
        spark.range(10_000).select(
            F.col("id").alias("k"), ((F.col("id") * 7919) % 10_000).alias("v")
        )
    )
    before = tt.read().groupBy().agg(F.sum("v"), F.count("*")).collect()[0]

    def v_spans(version):
        spans = []
        for f in sorted(
            glob.glob(f"{tt.uri}/data/__tile_v={version}/*.parquet")
        ):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().names.index("v")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            spans.append((min(los), max(his)))
        return spans

    wide = v_spans(1)
    assert all(hi - lo > 5_000 for lo, hi in wide)  # every file spans v

    new_v = tt.optimize(cluster_by=["v"])
    after = tt.read().groupBy().agg(F.sum("v"), F.count("*")).collect()[0]
    assert tuple(after) == tuple(before)
    tight = v_spans(new_v)
    assert len(tight) >= 8
    # near-disjoint: each file covers a narrow v slice now
    assert all(hi - lo < 2_500 for lo, hi in tight), tight
    assert len(tt.schema.versions) == 1  # compacted


def test_explain_pruning_on_string_dimension(spark, tmp_path):
    """Footer min/max statistics prune on STRING dimensions too: a
    range-clustered string-keyed table skips files for a narrow
    lexicographic range (t/string_dim.test's access pattern)."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "strprune"),
        dimensions=[Dim("k", "string")],
        attributes=[Attr("v", "bigint")],
        capacity=500,
    )
    tt.write(
        spark.range(5000).select(
            F.format_string("key-%05d", F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
    )
    rep = tt.explain_pruning({"k": ("key-01000", "key-01499")}).collect()
    kept = [r for r in rep if r["kept"]]
    assert len(rep) >= 8
    assert 1 <= len(kept) < len(rep) / 2, rep
    got = tt.subarray({"k": ("key-01000", "key-01499")}).count()
    assert got == 500


def test_optimize_keep_history_preserves_time_travel(spark, tmp_path):
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "opt_hist"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "bigint")],
    )
    tt.write(spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("v")))
    tt.write(
        spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") + 1000).alias("v")
        )
    )
    tt.optimize(cluster_by=["v"], keep_history=True)
    # pre-optimize snapshot still addressable
    assert tt.read(at=1).count() == 100
    got = {r["k"]: r["v"] for r in tt.read(at=1).collect()}
    assert got[0] == 0
    # latest state reflects the overwrite
    latest = {r["k"]: r["v"] for r in tt.read().collect()}
    assert latest[0] == 1000 and len(latest) == 100


def test_explain_pruning_honors_time_travel(spark, tmp_path):
    """explain_pruning(at=ts) reports only the fragment files a
    time-travel read would see."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        str(tmp_path / "prune_tt"),
        dimensions=[Dim("k", "bigint")],
        attributes=[Attr("v", "bigint")],
        capacity=1000,
        allows_dups=True,
    )
    tt.write(spark.range(2000).select(F.col("id").alias("k"), F.col("id").alias("v")))
    tt.write(spark.range(2000).select(F.col("id").alias("k"), F.col("id").alias("v")))
    all_files = tt.explain_pruning({"k": (0, 1999)}).collect()
    v1_files = tt.explain_pruning({"k": (0, 1999)}, at=1).collect()
    assert {r["version"] for r in all_files} == {1, 2}
    assert {r["version"] for r in v1_files} == {1}
    assert len(v1_files) < len(all_files)
