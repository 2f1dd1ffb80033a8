"""SQL-function library: each temporary function must agree with its
Column-API twin on the corpus, and stay codegen-inline (no Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.functions import text as X
from tiledb_mariadb_spark.functions.sql_macros import register_sql_functions
from tiledb_mariadb_spark.plans.audit import formatted_plan
from tiledb_mariadb_spark.sources.registry import load_table


def test_sql_functions_match_column_api(spark):
    names = register_sql_functions(spark)
    assert "tile_lang_id" in names
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 300)
    docs.createOrReplaceTempView("docs_m")
    via_sql = spark.sql(
        """
        SELECT doc_id, tile_fingerprint(text) AS fp, tile_token_count(text) AS tc,
               tile_lang_id(text) AS lang, tile_bpe_tokens(text) AS bpe
        FROM docs_m
        """
    )
    via_cols = docs.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        X.token_count(F.col("text")).alias("tc"),
        X.lang_id(F.col("text")).alias("lang"),
        X.bpe_token_count(F.col("text")).alias("bpe"),
    )
    a = {r["doc_id"]: (r["fp"], r["tc"], r["lang"], r["bpe"]) for r in via_sql.collect()}
    b = {r["doc_id"]: (r["fp"], r["tc"], r["lang"], r["bpe"]) for r in via_cols.collect()}
    assert a == b and len(a) == 300

    # macro, not UDF: nothing Python in the plan
    plan = formatted_plan(via_sql)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_sql_macros_match_column_api(spark):
    from tiledb_mariadb_spark.functions import pipeline as P

    register_sql_functions(spark)
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 200)
    docs.createOrReplaceTempView("docs_p")
    via_sql = spark.sql(
        """
        SELECT doc_id, tile_split(CAST(doc_id AS STRING), 0.1d) AS split,
               tile_redact_pii(text) AS red
        FROM docs_p
        """
    )
    frac = P.hash_fraction(F.col("doc_id").cast("string"), "split")
    via_cols = docs.select(
        "doc_id",
        F.when(frac < 0.1, F.lit("test")).otherwise(F.lit("train")).alias("split"),
        P.redact_pii(F.col("text")).alias("red"),
    )
    a = {r["doc_id"]: (r["split"], r["red"]) for r in via_sql.collect()}
    b = {r["doc_id"]: (r["split"], r["red"]) for r in via_cols.collect()}
    assert a == b and len(a) == 200
    plan = formatted_plan(via_sql)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_and_repetition_macros_match_specs(spark):
    """tile_chunks / tile_repetition_ratio reproduce q176/q144 through
    pure SQL, staying codegen-inline (no Python stage)."""
    from tiledb_mariadb_spark.suite import all_specs

    register_sql_functions(spark)
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("docs_m")
    # SQL UDFs can't sit inside Generate (UNSUPPORTED_SQL_UDF_USAGE) —
    # project the array first, then explode the column
    via_sql = spark.sql(
        """
        SELECT doc_id, ch.pos AS chunk_idx, ch.col AS chunk_text
        FROM (SELECT doc_id, tile_chunks(text) AS chunks FROM docs_m)
        LATERAL VIEW posexplode(chunks) ch
        """
    )
    spec = all_specs()["q176_chunk_documents"].spark(spark, SF_DIR)
    a = {(r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in via_sql.collect()}
    b = {(r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in spec.collect()}
    assert a == b and a

    rep_sql = spark.sql(
        "SELECT doc_id, tile_repetition_ratio(text) AS r FROM docs_m"
    )
    rep_spec = all_specs()["q144_repetition_ratio"].spark(spark, SF_DIR)
    ra = {r["doc_id"]: r["r"] for r in rep_sql.collect()}
    rb = {r["doc_id"]: r["rep_ratio"] for r in rep_spec.collect()}
    assert ra == rb
    plan = formatted_plan(rep_sql)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
