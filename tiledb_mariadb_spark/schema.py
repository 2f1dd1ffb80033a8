"""Type system: the SURVEY §1.3 mapping between the reference's storage
types (TileDB datatypes as surfaced through MariaDB) and Spark types.

Notable parity decisions (SURVEY §1.3 table):
- unsigned ints widen (UINT8→short, UINT16→int, UINT32→long,
  UINT64→decimal(20,0)) so no value overflows — the reference maps them to
  MySQL UNSIGNED columns (mytile/mytile.cc:30-56);
- DECIMAL stays a true DecimalType here (the reference *degrades* it to
  FLOAT64, mytile/mytile.cc:20-24 — we must only match results, not the
  lossy behavior);
- TIME has no Spark type → micros-of-day BIGINT + helper functions
  (reference: 9 TIME resolutions collapse to int64, mytile/mytile.cc:88-90);
- fixed multi-value cells (cell_val_num>1) surface as BLOB in the
  reference (mytile/mytile.cc:170-172) but as ArrayType here — Spark is
  natively better at this;
- nested struct/map are a Spark-only superset (unsupported in reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# TileDB datatype name → Spark type (SURVEY §1.3; cites mytile/mytile.cc:14-264)
TILEDB_TO_SPARK: dict[str, T.DataType] = {
    "INT8": T.ByteType(),
    "UINT8": T.ShortType(),  # widen: 255 > ByteType max
    "INT16": T.ShortType(),
    "UINT16": T.IntegerType(),
    "INT24": T.IntegerType(),
    "INT32": T.IntegerType(),
    "UINT32": T.LongType(),
    "INT64": T.LongType(),
    "UINT64": T.DecimalType(20, 0),
    "FLOAT32": T.FloatType(),
    "FLOAT64": T.DoubleType(),
    "BOOL": T.BooleanType(),
    "STRING_ASCII": T.StringType(),
    "STRING_UTF8": T.StringType(),
    "STRING_UTF16": T.StringType(),
    "STRING_UTF32": T.StringType(),
    "STRING_UCS2": T.StringType(),
    "STRING_UCS4": T.StringType(),
    "BLOB": T.BinaryType(),
    "GEOM_WKB": T.BinaryType(),
    "GEOM_WKT": T.BinaryType(),
    "DATETIME_YEAR": T.IntegerType(),
    "DATETIME_DAY": T.DateType(),
    "DATETIME_MONTH": T.TimestampType(),
    "DATETIME_WEEK": T.TimestampType(),
    "DATETIME_HR": T.TimestampType(),
    "DATETIME_MIN": T.TimestampType(),
    "DATETIME_SEC": T.TimestampType(),
    "DATETIME_MS": T.TimestampType(),
    "DATETIME_US": T.TimestampType(),
    "DATETIME_NS": T.TimestampType(),  # truncates to µs like the reference's int64 collapse
    "TIME_HR": T.LongType(),
    "TIME_MIN": T.LongType(),
    "TIME_SEC": T.LongType(),
    "TIME_MS": T.LongType(),
    "TIME_US": T.LongType(),
    "TIME_NS": T.LongType(),
}

# Inverse: Spark type → canonical TileDB storage type for CREATE/discovery.
SPARK_TO_TILEDB: dict[str, str] = {
    "byte": "INT8",
    "short": "INT16",
    "int": "INT32",
    "bigint": "INT64",
    "long": "INT64",
    "float": "FLOAT32",
    "double": "FLOAT64",
    "boolean": "BOOL",
    "string": "STRING_UTF8",
    "binary": "BLOB",
    "date": "DATETIME_DAY",
    "timestamp": "DATETIME_US",
    "timestamp_ntz": "DATETIME_US",
    "decimal(20,0)": "UINT64",
}


def spark_type_for(tiledb_type: str) -> T.DataType:
    try:
        return TILEDB_TO_SPARK[tiledb_type.upper()]
    except KeyError:
        raise ValueError(f"unsupported TileDB type: {tiledb_type}") from None


def tiledb_type_for(spark_ddl: str) -> str:
    key = spark_ddl.lower()
    if key.startswith("decimal") and key != "decimal(20,0)":
        return "FLOAT64"  # the reference's (lossy) DECIMAL mapping
    if key.startswith("array<"):
        inner = key[len("array<") : -1]
        return f"{tiledb_type_for(inner)}[]"  # multi-value cell
    try:
        return SPARK_TO_TILEDB[key]
    except KeyError:
        raise ValueError(f"no TileDB mapping for Spark type: {spark_ddl}") from None


def discover_tiledb_schema(df_schema: T.StructType) -> list[tuple[str, str, bool]]:
    """(name, tiledb_type, nullable) per column — discovery direction."""
    return [
        (f.name, tiledb_type_for(f.dataType.simpleString()), f.nullable)
        for f in df_schema.fields
    ]


# --- TIME-as-micros helpers (no Spark TIME type) ---------------------------


def time_to_micros_of_day(ts: Column) -> Column:
    """TIMESTAMP → micros since midnight (the TIME surrogate)."""
    return F.unix_micros(ts) - F.unix_micros(F.date_trunc("day", ts))


def micros_of_day_to_string(us: Column) -> Column:
    """micros-of-day → 'HH:MM:SS.ffffff' display form."""
    secs = (us / F.lit(1_000_000)).cast("long")
    frac = us - secs * 1_000_000
    return F.concat(
        F.lpad((secs / 3600).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((secs % 3600) / 60).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((secs % 60).cast("string"), 2, "0"),
        F.lit("."),
        F.lpad(frac.cast("string"), 6, "0"),
    )
