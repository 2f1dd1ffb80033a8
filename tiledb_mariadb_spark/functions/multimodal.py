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


def extract_features_arrow(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """The same feature extraction via ``mapInArrow`` — RecordBatch in,
    RecordBatch out, no pandas conversion at all.  For wide binary
    columns this is the lowest-overhead Python boundary Spark offers
    (pandas round-trips copy the blob bytes; Arrow buffers don't)."""

    def featurize(batch_iter):
        import pyarrow as pa  # noqa: PLC0415

        for batch in batch_iter:
            ids = batch.column("doc_id")
            blobs = batch.column("blob").to_pylist()
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids,
                    "byte_len": pa.array(
                        [len(b) if b is not None else 0 for b in blobs],
                        type=pa.int64(),
                    ),
                    "first_byte": pa.array(
                        [b[0] if b else -1 for b in blobs], type=pa.int64()
                    ),
                    "blob_md5": pa.array(
                        [hashlib.md5(b or b"").hexdigest() for b in blobs]
                    ),
                }
            )

    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob")
    )
    return prepared.mapInArrow(featurize, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_chars bigint, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_size: int = 64,
    every_n: int = 4,
) -> DataFrame:
    """Video-style frame sampling: split each payload into fixed-size
    frames, keep every ``every_n``-th — the one-to-MANY mapInPandas shape
    a real frame extractor (ffmpeg keyframe pull) uses.  The per-frame
    decode is the stub (md5 fingerprint stands in for pixel features);
    the batch fan-out, output schema, and partition-parallel execution
    are the production plumbing.  No shuffle: rows expand in place."""

    def explode_frames(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, fidx, fchars, fmd5 = [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = payload or ""
                n_frames = -(-len(p) // frame_size) if len(p) else 0
                for fi in range(0, n_frames, every_n):
                    chunk = p[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(did)
                    fidx.append(fi)
                    fchars.append(len(chunk))
                    fmd5.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "frame_chars": pd.Series(fchars, dtype="int64"),
                    "frame_md5": pd.Series(fmd5, dtype="object"),
                }
            )

    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return prepared.mapInPandas(explode_frames, schema=FRAME_SCHEMA)


def resize_features_int(
    df: DataFrame, id_col: str, binary_col: str, dim: int = 8
) -> DataFrame:
    """Exact-integer twin of :func:`resize_features`: per-stripe BYTE SUMS
    (int64) instead of float means.  Same decode→resize→pool plumbing, but
    every feature is exact int64 — so downstream cosine/top-k is
    engine-independent and the q74 conformance spec can be HASH-verified
    against a DuckDB oracle that recomputes the same sums from
    ``hex(encode(text))``."""

    def featurize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, fvs = [], []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                stride = -(-len(b) // dim) if b else 0
                fvs.append(
                    [int(sum(b[s * stride : (s + 1) * stride])) for s in range(dim)]
                )
                ids.append(did)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "features": pd.Series(fvs, dtype="object"),
                }
            )

    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob")
    )
    return prepared.mapInPandas(
        featurize, schema="doc_id bigint, features array<bigint>"
    )


def resize_features(
    df: DataFrame, id_col: str, binary_col: str, dim: int = 8
) -> DataFrame:
    """Image-resize stub: map each blob to a fixed-``dim`` float vector
    (stripe-wise byte means — deterministic stand-in for
    decode→resize→pool).  Output feeds the embedding ops (cosine/LSH/IVF)
    directly, closing the multimodal→similarity pipeline."""

    def featurize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def vec(b: bytes) -> list[float]:
            if not b:
                return [0.0] * dim
            stride = -(-len(b) // dim)
            return [
                (sum(b[i * stride : (i + 1) * stride]) / max(1, len(b[i * stride : (i + 1) * stride])))
                / 255.0
                for i in range(dim)
            ]

        for pdf in pdf_iter:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "features": pdf["blob"].map(vec),
                }
            )

    prepared = df.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob")
    )
    return prepared.mapInPandas(featurize, schema="doc_id bigint, features array<float>")


# --- perceptual hashing (dHash) ---------------------------------------------
# 64-bit difference hash over an opaque blob's first 65 bytes (the
# classic 8x9 -> 64-bit gradient fingerprint, bytes-as-pixels per the
# q70/q74 decode-stub convention), held as FOUR 16-bit band ints — never
# one 64-bit value (bit 63 would overflow BIGINT arithmetic differently
# per engine) — which doubles as the pigeonhole index: hamming<=h over 4
# bands forces at least one exact band match when h < 4*... well, h <= 6
# guarantees >=1 of 4 bands is untouched.  Conformance: q291.

_DHASH_BYTES = (
    "transform(sequence(0, 64), i -> IF(2*i+2 <= length(__hx),"
    " CAST(conv(substring(__hx, 2*i+1, 2), 16, 10) AS BIGINT), 0L))"
)
_DHASH_BANDS = (
    "transform(sequence(0, 3), k -> aggregate(sequence(0, 15), 0L,"
    " (acc, i) -> acc + IF(element_at(__bs, 16*k+i+1) >"
    " element_at(__bs, 16*k+i+2), shiftleft(1L, i), 0L)))"
)


def with_dhash_bands(df: DataFrame, binary_col: str) -> DataFrame:
    """Adds ``bands`` (array<bigint>, four 16-bit dHash bands) computed
    from ``binary_col`` — all-JVM codegen, no Python stage."""
    return (
        df.withColumn("__hx", F.hex(F.col(binary_col)))
        .withColumn("__bs", F.expr(_DHASH_BYTES))
        .withColumn("bands", F.expr(_DHASH_BANDS))
        .drop("__hx", "__bs")
    )


def phash_neardup_pairs(
    hashed: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by Hamming distance over dHash bands: pigeonhole
    band equi-join for candidates (bounded by bucket population, never
    all-pairs), exact popcount verify on candidates only.  ``hashed``
    must carry ``bands`` (with_dhash_bands).  Returns (a, b, hamming)."""
    banded = hashed.select(
        F.col(id_col), "bands", F.posexplode("bands").alias("k", "bv")
    )
    x, y = banded.alias("a"), banded.alias("b")
    return (
        x.join(
            y,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("ida"),
            F.col(f"b.{id_col}").alias("idb"),
            F.expr(
                "aggregate(zip_with(a.bands, b.bands,"
                " (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("ida").alias("a"), F.col("idb").alias("b"), "hamming"
        )
    )
