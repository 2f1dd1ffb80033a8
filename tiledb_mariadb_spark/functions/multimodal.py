"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED
(`decode_image` raises NotImplementedError; `fake_decode_features` is the
deterministic stand-in) — but the Spark-side plumbing is real: binary
columns, schema contracts, Arrow batch iteration, and partition-parallel
UDF execution are exactly what a production decode would use.

Scale notes: mapInPandas streams Arrow batches; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.  Decode is per-row
independent → scales linearly with partitions; no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, first_byte bigint, blob_md5 string"
)


def decode_image(data: bytes) -> "object":
    """Real decode would go through PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_features"
    )


def fake_decode_features(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode + feature extraction, keeping the
    Arrow-batch contract (DataFrame-in → DataFrame-out per batch)."""
    for pdf in pdf_iter:
        blobs = pdf["blob"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": blobs.map(len).astype("int64"),
                "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype(
                    "int64"
                ),
                "blob_md5": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def extract_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Run the (stubbed) decode over a binary column with mapInPandas."""
    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob")
    )
    return prepared.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)
