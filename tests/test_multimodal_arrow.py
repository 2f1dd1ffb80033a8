"""mapInArrow feature extraction must agree exactly with the mapInPandas
path (same schema, same values) — the zero-copy Arrow tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.functions.multimodal import (
    extract_features,
    extract_features_arrow,
)
from tiledb_mariadb_spark.sources.registry import load_table


def test_arrow_and_pandas_extractors_agree(spark):
    d = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 200)
        .withColumn("blob", F.col("text").cast("binary"))
    )
    via_pandas = {
        r["doc_id"]: (r["byte_len"], r["first_byte"], r["blob_md5"])
        for r in extract_features(d, "doc_id", "blob").collect()
    }
    via_arrow = {
        r["doc_id"]: (r["byte_len"], r["first_byte"], r["blob_md5"])
        for r in extract_features_arrow(d, "doc_id", "blob").collect()
    }
    assert via_pandas == via_arrow and len(via_arrow) == 200
