"""Physical-plan audits: the suite is correct AND the plans are the ones
that survive a 100× scale-up — predicate pushdown reaches the parquet
scan, column pruning trims ReadSchema, small dims broadcast, codegen is
active (SURVEY.md §4 parity table)."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.plans.audit import (
    codegen_stage_count,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from tiledb_mariadb_spark.suite import all_specs

SPECS = all_specs()


def test_filter_pushdown_reaches_scan(spark):
    """Dim-equality, range, IN, datetime predicates must appear in
    PushedFilters (the subarray-range/QueryCondition analog)."""
    for name, expected in {
        "q03_filter_eq": "c_mktsegment",
        "q04_filter_range": "l_quantity",
        "q05_filter_in": "o_orderpriority",
        "q08_filter_datetime": "o_orderdate",
    }.items():
        df = SPECS[name].spark(spark, SF_DIR)
        pushed = " ".join(pushed_filters(df))
        assert expected in pushed, f"{name}: no pushed filter on {expected}: {pushed}"


def test_projection_prunes_columns(spark):
    """q02 projects 2 of 6 orders columns; the scan must read only those."""
    df = SPECS["q02_scan_projection"].spark(spark, SF_DIR)
    cols = read_schema_columns(df)
    assert set(cols) == {"o_orderkey", "o_totalprice"}, cols


def test_star_join_broadcasts_dims(spark):
    df = SPECS["q31_join_multi"].spark(spark, SF_DIR)
    assert has_broadcast_join(df)


def test_point_lookup_broadcasts(spark):
    df = SPECS["q30_join_inner"].spark(spark, SF_DIR)
    assert has_broadcast_join(df)


def test_codegen_active_on_flagship(spark):
    df = SPECS["q01_pricing_summary"].spark(spark, SF_DIR)
    df.collect()  # AQE reveals codegen stages only in the executed final plan
    assert codegen_stage_count(df) >= 1


def test_tile_table_time_travel_prunes_partitions(spark):
    """Reading snapshot v1 of a 2-version tile table must scan only the
    v=1 files (partition pruning on __tile_v)."""
    from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

    tt = TileTable.create(
        spark,
        "/root/repo/.tmp/tile_tables/prune_check",
        dimensions=[Dim("k", "int")],
        attributes=[Attr("val", "string")],
        overwrite=True,
    )
    tt.write(spark.createDataFrame([(1, "a")], "k int, val string"), version_ts=100)
    tt.write(spark.createDataFrame([(2, "b")], "k int, val string"), version_ts=200)
    snapshot = tt.read(at=100)
    files = snapshot.inputFiles()
    assert files and all("__tile_v=1" in f for f in files), files


def test_no_python_udf_in_any_plan(spark):
    """No query may fall off the JVM fast path: row-at-a-time Python UDFs
    (BatchEvalPython) are banned everywhere; Arrow-batched Python
    (MapInPandas / ArrowEvalPython) is allowed only for the declared
    multimodal decode boundary and spatial WKB residual tier."""
    from tiledb_mariadb_spark.plans.audit import formatted_plan

    arrow_ok = {
        "q70_multimodal",
        "q73_frame_sample",
        "q74_resize_cosine",
        "q77_ewma",  # grouped recurrence — the declared applyInPandas tier
        "q95_spatial_intersects",
        "q139_pack_greedy",  # greedy bin packing — sequential per shard
        "q267_connector_scan",  # connector reads: the backend boundary IS
        # a declared mapInPandas (executor-side array decode)
        "q278_native_write",  # connector write→scan: same declared
        # mapInPandas boundary (native fragment io), round 4
        "q286_native_consolidation",  # consolidation + pruned connector
        # scan: same declared native-io boundary
        "q292_native_count",  # footer-count spec writes via mapInPandas
        "q293_native_metadata",  # metadata write spec: same boundary
        "q294_native_evolution",  # evolution spec write + connector scan
        "q295_native_hilbert",  # hilbert write + connector scan
        "q296_native_dense_partial",  # dense subarray write + scan
        "q314_native_dense_v19",  # dense v19 box writes + columnar scan
        "q315_dense_datasource",  # dense box writes + format() scan
        "q316_delete_datasource",  # write + .del + format() scan
        "q317_string_dim_corpus",  # string-dim writes + connector scan
        "q318_encrypted_dense",  # encrypted dense writes + keyed scan
        "q319_distributed_consolidation",  # staged-fragment writes +
        # .con atomic flip + connector scan: same declared boundary
        "q320_dense_consolidation",  # dense band consolidation writes +
        # connector scan: same declared native-io boundary
        "q321_incremental_consolidation",  # size-ratio run merges via
        # the fragment-subset reader: same declared boundary
        "q322_metadata_consolidation",  # metadata write + fold + agg
        # source stats through the same declared boundary
        "q323_commits_consolidation",  # explicit-ts connector writes +
        # commits fold: same declared native-io boundary
        "q324_cdc_window",  # layered connector writes + window scan:
        # same declared native-io boundary
        "q326_window_rollup",  # snapshot + window-delta fold through
        # the connector: same declared native-io boundary
        "q327_dense_incremental",  # dense band writes + incremental
        # run merge + connector scan: same declared native-io boundary
        "q328_cdc_coverage",  # layered connector writes + consolidate +
        # since-window scan: same declared native-io boundary
        "q329_char_fast_path",  # fixed-CHAR fragment write + connector
        # range scan: same declared native-io boundary
        "q331_filter_matrix",  # mixed-pipeline fragment write + connector
        # range scan: same declared native-io boundary
        "q333_bloom_prune",  # bloom-sidecar fragment writes + pruned
        # point lookups: same declared native-io boundary
        "q338_windowed_agg",  # connector fragment writes feeding the
        # metadata-only windowed aggregate: same declared boundary
        "q339_copartitioned_join",  # two connector writes + the
        # storage-partitioned join (the join IS the declared
        # native-io mapInPandas boundary — zero shuffle is its point)
        "q340_bucketed_rollup",  # connector fragment writes feeding
        # the metadata-only bucketed rollup: same declared boundary
        "q341_bucket_refresh",  # snapshot + window-delta rollup fold
        # through the connector: same declared native-io boundary
        "q342_triple_join",  # three connector writes + the three-way
        # storage-partitioned star join: same declared boundary
        "q343_grid_rollup",  # connector fragment writes feeding the
        # metadata-only 2-D grid rollup: same declared boundary
        "q297_datasource_stacked",  # stacked-pushdown write + format scan
        "q298_native_lifecycle",  # fused lifecycle write + connector scan
        "q299_native_estimate",  # estimator spec write via mapInPandas
        "q301_native_deletes",  # delete-commit lifecycle write + scan
        "q303_native_enum",  # enumeration connector scans: same
        # declared native-io mapInPandas boundary
        "q304_native_bio_scan",  # v21 connector scans: same boundary
        "q305_native_vector_store",  # fragment-per-partition vector
        # write + connector read: same declared boundary
        "q307_native_v19_stats",  # v19 fragment writes via
        # mapInPandas: same declared boundary
        "q308_native_encryption",  # encrypted connector write+read:
        # same declared native-io boundary (AES-GCM inside the task)
        "q309_native_enum_write",  # enum-label connector write+read:
        # same declared native-io boundary
        "q311_native_spatial",  # native connector scan + the declared
        # WKB residual pandas_udf (spatial exact tier)
        "q313_spatial_datasource",  # connector write + format() scan
        # with spatial option pushdown: same declared boundary
        "q312_secure_corpus",  # encrypted connector write+read feeding
        # the dedup pipeline: same declared native-io boundary
        "q344_topk_pushdown",  # connector writes + the bound-pruned
        # scans: same declared native-io boundary
        "q345_snapshot_diff",  # two-snapshot self-join per split: the
        # diff IS the declared native-io mapInPandas boundary
        "q346_merge_into",  # clause-split probe + fragment writes:
        # same declared native-io boundary
        "q347_native_asof",  # per-split local merge_asof over both
        # arrays' subarrays: same declared native-io boundary
        "q348_cdc_capstone",  # upsert + diff + rollup fold through the
        # connector: same declared native-io boundary
        "q349_ttl_retention",  # day-generation writes + expiry census +
        # surviving-state scan: same declared native-io boundary
        "q350_keyed_asof",  # per-split keyed merge_asof over both
        # arrays' subarrays: same declared native-io boundary
        "q352_jvm_grouped_rollup",  # the fragment-ingest mapInPandas
        # feeding the JVM provider: same declared native-io boundary
        "q353_dense_rollup",  # the fill-materializing connector scan
        "q360_jvm_write_roundtrip",  # provider write smoke (JVM write jobs)
        "q359_dense_patch_rollup",  # overlap-patch ingest + the same
        # fill-materializing connector scan leg (declared native-io)
        # (triple-match leg 2): same declared native-io boundary
        "q354_utf16_corpus",  # exotic-encoding connector scan (exact
        # row path): same declared native-io boundary
    }
    skip = {  # streaming queries materialize eagerly in run_to_completion
        "q90_stream_window",
        "q91_session_window",
        "q92_stream_stateful",
        "q93_stream_stream_join",
        "q94_stream_dedup",
        "q177_stream_probe_dedup",
        "q279_stream_native_sink",  # streaming + native connector boundary
    }
    offenders = []
    for name, spec in SPECS.items():
        if name in skip:
            continue
        plan = formatted_plan(spec.spark(spark, SF_DIR))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        if name not in arrow_ok and (
            "MapInPandas" in plan
            or "ArrowEvalPython" in plan
            or "FlatMapGroupsInPandas" in plan
        ):
            offenders.append((name, "unexpected Arrow-Python stage"))
    assert not offenders, offenders


def test_split_and_sample_are_map_only(spark):
    """train/test split and stratified sampling are pure maps over the
    scan — zero Exchange (at 100 TB a shuffle here would be a full-corpus
    tax for a per-row decision)."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.functions import pipeline as P
    from tiledb_mariadb_spark.plans.audit import formatted_plan
    from tiledb_mariadb_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    split_plan = formatted_plan(P.train_test_split(docs, "doc_id", 0.1))
    assert "Exchange" not in split_plan
    sample_plan = formatted_plan(
        P.stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    )
    assert "Exchange" not in sample_plan
    redact_plan = formatted_plan(
        docs.select(P.redact_pii(F.col("text")).alias("r"))
    )
    assert "Exchange" not in redact_plan and "Python" not in redact_plan


def test_repetition_ratio_is_map_only(spark):
    """q144's per-document distinct-ngram ratio is computed from the
    in-row shingle array — zero Exchange (the explode+groupBy shape would
    shuffle the whole shingled corpus, ~10x the text bytes)."""
    from tiledb_mariadb_spark.plans.audit import formatted_plan

    plan = formatted_plan(SPECS["q144_repetition_ratio"].spark(spark, SF_DIR))
    assert "Exchange" not in plan, plan
    # q176 chunking is the same scan-rate contract: per-row explode only
    plan = formatted_plan(SPECS["q176_chunk_documents"].spark(spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_incremental_dedup_broadcasts_probe(spark):
    """q173's candidate join must broadcast the (small) probe batch so the
    corpus band index never shuffles — at 100 TB the index side is the
    whole corpus and an exchange there defeats incremental ingest."""
    from tiledb_mariadb_spark.plans.audit import formatted_plan

    plan = formatted_plan(SPECS["q173_incremental_dedup"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequential_is_distributed_prefix_sum(spark):
    """The corpus-wide cumsum must NOT funnel through one partition: the
    big-side window is partitioned by __pid over range partitions, and the
    only SinglePartition exchange is the #partitions-row offsets frame."""
    import re

    from tiledb_mariadb_spark.plans.audit import formatted_plan

    plan = formatted_plan(SPECS["q138_pack_sequential"].spark(spark, SF_DIR))
    assert "rangepartitioning(doc_id" in plan
    assert re.search(r"windowspecdefinition\(__pid#\d+, doc_id", plan), plan
    assert plan.count("SinglePartition") == 1, plan


def test_pack_greedy_single_shuffle(spark):
    """Greedy packing = one groupBy(shard) shuffle feeding the per-shard
    Arrow batch; no second exchange, no global sort."""
    import re

    from tiledb_mariadb_spark.plans.audit import formatted_plan

    plan = formatted_plan(SPECS["q139_pack_greedy"].spark(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "FlatMapGroupsInPandas" in plan


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a date-partitioned fact against a filtered dim must inject
    a runtime dynamicpruningexpression into PartitionFilters — at 100 TB
    this is the difference between scanning 3 days and scanning 10 years."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.plans.audit import formatted_plan
    from tiledb_mariadb_spark.sources.partitioned import ingest_by_date
    from tiledb_mariadb_spark.sources.registry import load_table

    path = str(tmp_path / "dpp_events")
    ev = load_table(spark, SF_DIR, "events")
    ingest_by_date(ev, path, "ts", mode="overwrite")
    fact = spark.read.parquet(path)
    dates = (
        fact.select("event_date").distinct().limit(3)
        .withColumn("tag", F.lit("x"))
    )
    dates.write.mode("overwrite").parquet(str(tmp_path / "dpp_dates"))
    dim = spark.read.parquet(str(tmp_path / "dpp_dates")).filter(
        F.col("tag") == "x"
    )
    plan = formatted_plan(fact.join(dim, "event_date").groupBy("event_date").count())
    assert "dynamicpruningexpression" in plan, plan


def test_bloom_filter_runtime_join(spark):
    """A selective filter on the build side of a shuffle join must inject
    a runtime bloom filter into the probe-side scan, pre-dropping rows
    before the exchange.  The application-side size threshold is zeroed
    because test data is tiny — at the target scale the default (10 GB)
    triggers on its own."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.plans.audit import formatted_plan
    from tiledb_mariadb_spark.sources.registry import load_table

    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        od = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert "bloom_filter_agg" in formatted_plan(j)
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_decontamination_broadcasts_benchmark(spark):
    """The benchmark (eval-set) shingles are the tiny side of the overlap
    join and must broadcast — the corpus side streams map-side."""
    df = SPECS["q149_decontamination"].spark(spark, SF_DIR)
    from tiledb_mariadb_spark.plans.audit import has_broadcast_join

    assert has_broadcast_join(df)


def test_footer_aggregate_pushdown(spark):
    """group_by_handler parity: filter-less MIN/MAX/COUNT answered from
    parquet footers — PushedAggregation appears under the V2 BatchScan and
    the values equal the computed aggregates."""
    from pyspark.sql import functions as F

    from tiledb_mariadb_spark.operators.agg_pushdown import footer_aggregates
    from tiledb_mariadb_spark.sources.registry import load_table

    # timestamp columns disqualify footer pushdown (no usable stats for
    # the pushdown rule) — numeric/key columns are the supported set,
    # mirroring the reference's own per-type aggregate constraints
    row, plan = footer_aggregates(
        spark,
        f"{SF_DIR}/orders.parquet",
        mins=("o_totalprice",),
        maxs=("o_totalprice", "o_orderkey"),
    )
    assert "PushedAggregation" in plan and "MIN(o_totalprice)" in plan, plan
    want = (
        load_table(spark, SF_DIR, "orders")
        .agg(
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            F.max("o_orderkey").alias("mxk"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert (row["min_o_totalprice"], row["max_o_totalprice"], row["n"]) == (
        want["mn"], want["mx"], want["n"],
    )
    assert row["max_o_orderkey"] == want["mxk"]
