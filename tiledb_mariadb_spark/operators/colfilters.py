"""Per-column filter/compression pipelines → parquet codecs + encodings.

The reference parses `filters='GZIP=6,ZSTD=1'`-style CSV per attribute and
table-level `coordinate_filters` / `offset_filters` / `validity_filters`
into TileDB FilterLists (mytile/mytile.cc:1308-1413 parse_filter_list;
exercised by mysql-test/mytile/t/filters.test).  Spark-first equivalent:
parquet already compresses and encodes *per column chunk*, so each TileDB
filter maps onto the parquet feature that does the same job:

====================  =========================================------------
TileDB filter         parquet mapping
====================  =========================================------------
GZIP / ZSTD / LZ4     column-chunk compression codec (level honored)
BZIP2                 gzip (parquet has no bzip2 — closest ratio codec)
NONE                  uncompressed
RLE / DICTIONARY      dictionary encoding (RLE_DICTIONARY pages)
DOUBLE_DELTA /
POSITIVE_DELTA /
DELTA /
BIT_WIDTH_REDUCTION   DELTA_BINARY_PACKED column encoding (integer cols)
BITSHUFFLE /
BYTESHUFFLE /
SCALE_FLOAT           accepted + echoed only: the parquet analog
                      (BYTE_STREAM_SPLIT) is rejected by Spark's
                      vectorized reader — see note at _SHUFFLE_ENCODED
CHECKSUM_MD5 /
CHECKSUM_SHA256       parquet page checksums (CRC; file-level)
====================  =========================================------------

`offset_filters` (var-length offset compression) and `validity_filters`
have no parquet analog — offsets and nulls live in rep/def levels that are
compressed with the column chunk — so they are accepted, persisted, and
echoed by show_create, but carry no physical knob (documented degradation,
not silent).

When every column agrees on one codec the stock Spark writer is used
(keeps whole-stage codegen → writer path).  Genuinely per-column codecs
or encodings write through ``df.mapInArrow`` — one pyarrow file per
partition, preserving the range-clustered layout, no pandas type laundering
— which is exactly the fragment-per-partition shape of the TileDB sink
(writers need no coordination, so parallelism = partition count).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Optional

#: filter name → kind.  Mirrors the reference's accepted vocabulary
#: (tiledb_filter_type_from_str); unknown names raise like the reference's
#: "Unknown or unsupported filter type" error.
_COMPRESSION = {
    "GZIP": "gzip",
    "ZSTD": "zstd",
    "LZ4": "lz4",
    "BZIP2": "gzip",  # no parquet bzip2; documented fallback
    "NONE": "none",
}
_DICT_ENCODED = {"RLE", "DICTIONARY"}
_DELTA_ENCODED = {"DOUBLE_DELTA", "POSITIVE_DELTA", "DELTA", "BIT_WIDTH_REDUCTION"}
# BITSHUFFLE/BYTESHUFFLE/SCALE_FLOAT would map onto parquet's
# BYTE_STREAM_SPLIT float encoding — but Spark's VECTORIZED parquet
# reader rejects that encoding ("Unsupported encoding: BYTE_STREAM_SPLIT",
# round-3 footer-audit finding), so writing it would either break reads
# or force the slow row-based reader on every scan of the table: at
# 100 TB the vectorized read path is worth more than the marginal float
# compression.  They are therefore accepted + echoed with no physical
# knob (same documented degradation as offset_filters).
_SHUFFLE_ENCODED: set = set()
_CHECKSUM = {"CHECKSUM_MD5", "CHECKSUM_SHA256"}
_ACCEPTED_NOOP = {"BITSHUFFLE", "BYTESHUFFLE", "SCALE_FLOAT", "XOR", "WEBP"}

KNOWN_FILTERS = (
    set(_COMPRESSION) | _DICT_ENCODED | _DELTA_ENCODED | _SHUFFLE_ENCODED
    | _CHECKSUM | _ACCEPTED_NOOP
)


def parse_filter_list(filter_csv: str) -> list[tuple[str, Optional[str]]]:
    """``'GZIP=6,ZSTD'`` → ``[('GZIP', '6'), ('ZSTD', None)]`` with the
    reference's validation semantics (unknown name → error)."""
    out: list[tuple[str, Optional[str]]] = []
    for part in filter_csv.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, opt = part.partition("=")
        name = name.upper()
        if name not in KNOWN_FILTERS:
            raise ValueError(f"Unknown or unsupported filter type: {name}")
        out.append((name, opt or None))
    return out


@dataclass
class ParquetFilterPlan:
    """Physical write plan derived from declared filter pipelines."""

    codec_by_col: dict[str, str] = field(default_factory=dict)
    level_by_col: dict[str, int] = field(default_factory=dict)
    dict_cols: list[str] = field(default_factory=list)
    encoding_by_col: dict[str, str] = field(default_factory=dict)
    page_checksum: bool = False

    @property
    def uniform_codec(self) -> Optional[str]:
        """The single codec when all declared columns agree (and no
        per-column encodings are needed) — lets the stock writer run."""
        if self.dict_cols or self.encoding_by_col or self.page_checksum:
            return None
        codecs = set(self.codec_by_col.values())
        if len(codecs) == 1 and not self.level_by_col:
            return next(iter(codecs))
        return None

    @property
    def needs_arrow_writer(self) -> bool:
        return bool(
            self.codec_by_col or self.dict_cols or self.encoding_by_col
            or self.page_checksum
        ) and self.uniform_codec is None


def plan_for_schema(schema) -> ParquetFilterPlan:
    """Build the write plan from a TileSchema's declared filter CSVs."""
    plan = ParquetFilterPlan()

    def apply(cols: list[str], csv: Optional[str]) -> None:
        if not csv:
            return
        for fname, opt in parse_filter_list(csv):
            for c in cols:
                if fname in _COMPRESSION:
                    # first compression filter wins (the pipeline head is
                    # the codec; later stages are encodings)
                    plan.codec_by_col.setdefault(c, _COMPRESSION[fname])
                    if opt is not None and fname == "GZIP":
                        try:
                            lvl = int(opt)
                            if lvl > 0:
                                plan.level_by_col[c] = lvl
                        except ValueError:
                            pass
                elif fname in _DICT_ENCODED:
                    if c not in plan.dict_cols:
                        plan.dict_cols.append(c)
                elif fname in _DELTA_ENCODED:
                    plan.encoding_by_col.setdefault(c, "DELTA_BINARY_PACKED")
                elif fname in _SHUFFLE_ENCODED:
                    plan.encoding_by_col.setdefault(c, "BYTE_STREAM_SPLIT")
                elif fname in _CHECKSUM:
                    plan.page_checksum = True

    dim_cols = [d.name for d in schema.dimensions]
    apply(dim_cols, getattr(schema, "coordinate_filters", None))
    for a in schema.attributes:
        apply([a.name], getattr(a, "filters", None))
    # offset_filters / validity_filters: accepted + persisted, no knob
    return plan


def write_clustered_parquet(
    df, path: str, plan: ParquetFilterPlan, encryption_key: Optional[bytes] = None
) -> None:
    """Write ``df`` (already range-clustered) to ``path`` honoring the
    filter plan.  Uniform codec → stock Spark writer; per-column plans or
    encryption → one pyarrow file per partition via mapInArrow (no
    shuffle, no pandas conversion, layout preserved).  With
    ``encryption_key`` each fragment is a parquet buffer sealed with
    AES-256-GCM (see operators/encryption.py) — crypto runs in the tasks,
    parallelism = partition count."""
    if not plan.needs_arrow_writer and encryption_key is None:
        writer = df.write.mode("overwrite")
        if plan.uniform_codec:
            writer = writer.option("compression", plan.uniform_codec)
        writer.parquet(path)
        return

    codec_by_col = dict(plan.codec_by_col)
    uniform = plan.uniform_codec
    dict_cols = list(plan.dict_cols)
    encoding_by_col = dict(plan.encoding_by_col)
    checksum = plan.page_checksum
    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415

        got = list(batches)
        if got:
            table = pa.Table.from_batches(got)
            # per-column codec dict: unlisted columns use snappy (Spark's
            # parquet default), matching "no filters declared" semantics
            default_codec = uniform or "snappy"
            compression = {
                f.name: codec_by_col.get(f.name, default_codec).upper()
                for f in table.schema
            }
            use_dictionary = dict_cols if dict_cols else False
            column_encoding = encoding_by_col or None
            if column_encoding is not None:
                # pyarrow requires dictionary off for explicitly-encoded
                # columns; turn it on only where requested
                use_dictionary = dict_cols
            kwargs = dict(
                compression=compression,
                use_dictionary=use_dictionary,
                column_encoding=column_encoding,
                write_page_checksum=checksum,
            )
            tag = uuid.uuid4().hex
            if encryption_key is None:
                pq.write_table(table, os.path.join(path, f"part-{tag}.parquet"), **kwargs)
            else:
                from tiledb_mariadb_spark.operators.encryption import (  # noqa: PLC0415
                    encrypt_bytes,
                )

                sink = pa.BufferOutputStream()
                pq.write_table(table, sink, **kwargs)
                blob = encrypt_bytes(encryption_key, sink.getvalue().to_pybytes())
                with open(os.path.join(path, f"part-{tag}.parquet.aes"), "wb") as f:
                    f.write(blob)
            n = table.num_rows
        else:
            n = 0
        yield pa.RecordBatch.from_pydict({"written": [n]})

    df.mapInArrow(write_part, schema="written long").collect()
