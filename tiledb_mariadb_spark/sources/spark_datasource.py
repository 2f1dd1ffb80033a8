"""First-class Spark Data Source for native TileDB arrays (Spark 4
Python Data Source API): ``spark.read.format("tiledb_native")`` /
``df.write.format("tiledb_native")`` over bare on-disk arrays — schema
from the array's own blob, one Spark InputPartition per domain split,
REAL filter pushdown through Catalyst's pushFilters hook (dim ranges
prune partitions before launch; attribute predicates evaluate inside the
backend before rows cross the Arrow boundary), Arrow-batch reads, and
writes that land one native fragment per task.

This is the idiomatic-Spark face of the connector: what
``tiledb_array.read_array``/``write_array`` express as function calls,
this module surfaces through the planner itself — the same integration
point the reference occupies inside MariaDB (the handler +
cond_push hooks, ha_mytile.cc:2783-2882), re-expressed as Spark's
official extension API.

Options:
- ``path``   array directory (required)
- ``at``     unix-millis time travel (open_at parity)
- ``target_splits``  max partitions (default 16)
- write: ``dims`` comma-separated dim column names +
  ``domain.<dim>`` "lo:hi" bounds — auto-creates the array on first
  write when it does not exist.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    pass


def _backend(encryption_key=None):
    from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
        NativeDecoderBackend,
    )

    return NativeDecoderBackend(encryption_key=encryption_key)


@dataclass
class _SplitPartition(InputPartition):
    ranges: list  # inclusive per-dim (lo, hi)


class TileDBNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tiledb_native"

    def _uri(self) -> str:
        uri = self.options.get("path") or self.options.get("location")
        if not uri:
            raise ValueError("tiledb_native requires the 'path' option")
        # SQL `CREATE TABLE ... USING tiledb_native` URI-ifies the path
        # ('file:/x' or 'file:///x'); the backend wants a plain fs path
        if uri.startswith("file:"):
            uri = uri[5:]
            while uri.startswith("//"):
                uri = uri[1:]
        if "://" in uri:
            # remote schemes (tiledb:// REST, object stores) refuse
            # loudly AT OPEN — never a downstream path failure
            from tiledb_mariadb_spark.sources.storage import (  # noqa: PLC0415
                require_local,
            )

            uri = require_local(uri)
        return uri

    def _at(self):
        at = self.options.get("at")
        return int(at) if at is not None else None

    def _since(self):
        # inclusive LOWER time bound (TileDB timestamp_start): with
        # 'at' this reads the WINDOW of fragments written in
        # [since, at] — the CDC-export shape (only the delta, newest-
        # wins within it)
        since = self.options.get("since")
        return int(since) if since is not None else None

    def _key(self):
        # AES-256-GCM table key (the reference's encryption_key table
        # option).  Lives only in options/closures, never on disk.
        return self.options.get("encryption_key")

    def schema(self) -> str:
        info = _backend(self._key()).info(self._uri(), at=self._at())
        return ", ".join(
            f"`{f.name}` {f.dtype}" for f in info.dims + info.attrs
        )

    def reader(self, schema: StructType) -> "TileDBNativeReader":
        return TileDBNativeReader(
            self._uri(), self._at(),
            int(self.options.get("target_splits", 16)),
            [f.name for f in schema.fields],
            encryption_key=self._key(),
            since=self._since(),
            bbox=self.options.get("bbox"),
            spatial_wkb=self.options.get("spatial_wkb"),
            spatial_dims=self.options.get("spatial_dims"),
            spatial_pad=self.options.get("spatial_pad"),
        )

    def writer(self, schema: StructType, overwrite: bool) -> "TileDBNativeWriter":
        if overwrite:
            raise ValueError(
                "tiledb_native writes are append-only fragments "
                "(TileDB model); use mode('append')"
            )
        return TileDBNativeWriter(self._uri(), dict(self.options), schema)


_COND_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


class TileDBNativeReader(DataSourceReader):
    def __init__(self, uri, at, target_splits, columns, encryption_key=None,
                 bbox=None, spatial_wkb=None, spatial_dims=None,
                 spatial_pad=None, since=None):
        self.uri, self.at = uri, at
        self.since = since
        self.target_splits = target_splits
        self.columns = columns
        self.encryption_key = encryption_key
        self.dim_ranges: dict = {}
        self.conditions: list = []
        info = _backend(encryption_key).info(uri, at=at)
        self._dim_names = [d.name for d in info.dims]
        self._attr_names = [a.name for a in info.attrs]
        self._info = info
        # spatial / box pushdown OPTIONS (cond_push_func_spatial parity,
        # mytile/ha_mytile.cc:2312-2507, 2825-2830): plain SQL over the
        # format has no ST_* functions Catalyst could push, so the MBR
        # tier arrives as reader options and seeds dim_ranges — splits
        # outside the box never become tasks (plan_splits prunes on
        # these ranges exactly like pushed filters).  The EXACT
        # geometry residual stays with the caller, same two-tier
        # contract as operators/spatial.st_intersects_native.
        if bbox:
            # "dim:lo:hi[;dim:lo:hi...]" — generic per-dim window
            for part in str(bbox).split(";"):
                nm, lo_s, hi_s = part.split(":")
                if nm not in self._dim_names:
                    raise ValueError(f"bbox names non-dimension {nm!r}")
                lo, hi = float(lo_s), float(hi_s)
                self.dim_ranges[nm] = (lo, hi)
        if spatial_wkb:
            # WKB polygon (hex) -> padded MBR over two named dims.
            # spatial_pad is REQUIRED: the dims index centroids, so the
            # MBR only over-selects when pad >= the corpus's max stored
            # half-extent (see st_intersects_native's contract).
            if spatial_pad is None or spatial_dims is None:
                raise ValueError(
                    "spatial_wkb requires spatial_dims='x,y' and "
                    "spatial_pad=<max stored half-extent>"
                )
            from tiledb_mariadb_spark.operators.spatial import (  # noqa: PLC0415
                parse_wkb_polygon,
            )

            dx, dy = [s.strip() for s in str(spatial_dims).split(",")]
            if dx not in self._dim_names or dy not in self._dim_names:
                raise ValueError(
                    f"spatial_dims {spatial_dims!r} must name dims"
                )
            pad = float(spatial_pad)
            pts = parse_wkb_polygon(bytes.fromhex(str(spatial_wkb)))
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            self._merge_range(dx, min(xs) - pad, max(xs) + pad)
            self._merge_range(dy, min(ys) - pad, max(ys) + pad)

    def _merge_range(self, name, lo, hi):
        cur = self.dim_ranges.get(name, (None, None))
        if isinstance(cur, list):
            self.dim_ranges[name] = [
                (v, w) for v, w in cur
                if (lo is None or w >= lo) and (hi is None or v <= hi)
            ]
            return
        nlo = lo if cur[0] is None else (cur[0] if lo is None else max(cur[0], lo))
        nhi = hi if cur[1] is None else (cur[1] if hi is None else min(cur[1], hi))
        self.dim_ranges[name] = (nlo, nhi)

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Catalyst hands every eligible predicate here; we absorb what
        the storage layer can evaluate (the reference's cond_push) and
        return the rest as residuals for Spark to re-apply."""

        _narrow = self._merge_range  # intersect with any existing range

        def _add_points(name, pts):
            cur = self.dim_ranges.get(name)
            if cur is None:
                self.dim_ranges[name] = [(v, v) for v in pts]
            elif isinstance(cur, tuple):
                lo, hi = cur
                self.dim_ranges[name] = [
                    (v, v)
                    for v in pts
                    if (lo is None or v >= lo) and (hi is None or v <= hi)
                ]
            else:
                keep = {v for v, _ in cur}
                self.dim_ranges[name] = [(v, v) for v in pts if v in keep]

        residual = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            known = col in self._dim_names or col in self._attr_names
            ftype = type(f)
            if not known:
                residual.append(f)
                continue
            if col in self._dim_names and ftype in _COND_OPS:
                v = f.value
                if ftype is EqualTo:
                    _narrow(col, v, v)
                elif ftype is GreaterThanOrEqual:
                    _narrow(col, v, None)
                elif ftype is LessThanOrEqual:
                    _narrow(col, None, v)
                elif ftype is GreaterThan and isinstance(v, int):
                    _narrow(col, v + 1, None)
                elif ftype is LessThan and isinstance(v, int):
                    _narrow(col, None, v - 1)
                else:
                    residual.append(f)
                    continue
                # dims are exactly enforced by the range scan: absorbed
                continue
            if ftype in _COND_OPS:
                self.conditions.append((col, _COND_OPS[ftype], f.value))
            elif ftype is IsNull:
                self.conditions.append((col, "is_null"))
            elif ftype is IsNotNull:
                self.conditions.append((col, "is_not_null"))
            elif ftype is In and col in self._dim_names and all(
                isinstance(v, int) for v in f.value
            ):
                # EXACT multi-range absorption (MRR parity): one point
                # range per IN value, merged/split by plan_splits — the
                # holes between values are never scanned and no residual
                # re-check is needed
                _add_points(col, sorted(set(f.value)))
            elif ftype is In and col in self._attr_names and all(
                v is None or isinstance(v, (int, float, str, bool))
                for v in f.value
            ):
                # attr IN-list: pushed as one backend condition — exact
                # isin evaluation inside the task, and fragments whose
                # stats/bloom prove EVERY member absent skip entirely.
                # NULL members drop (IN's NULL never matches, 3VL).
                self.conditions.append((
                    col, "in",
                    tuple(v for v in f.value if v is not None),
                ))
            else:
                residual.append(f)
        return residual

    def partitions(self):
        from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
            plan_splits,
        )

        be = _backend(self.encryption_key)
        if self.since is not None:
            # vacuum hazard: a since-window whose straddling originals
            # were consolidated away reads incomplete — fail loudly
            # (read_array parity, round-8 guard)
            from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
                window_destroyed,
            )

            try:
                if window_destroyed(self.uri, self.since):
                    raise ValueError(
                        f"tiledb_native: the CDC window since="
                        f"{self.since} was destroyed by consolidation + "
                        "vacuum; rows would be silently lost"
                    )
            except OSError:
                pass  # non-native layout: backend semantics
        if self.conditions:
            # condition-aware planning (read_array parity): intersect
            # the scan with the non-skippable fragments' union NED —
            # needle queries over bloom-indexed attrs launch tasks only
            # where candidate fragments live; [] = provably empty.
            # All ops qualify (stats refute range conjuncts too)
            cfn = getattr(be, "condition_ned", None)
            cbox = cfn(self.uri, list(self.conditions), at=self.at,
                       since=self.since) if cfn else None
            if cbox == []:
                # provably empty: one sentinel partition that reads
                # nothing (the DS API requires >=1 partition)
                return [_SplitPartition(ranges=None)]
            if cbox is not None:
                for d, (clo, chi) in zip(self._info.dims, cbox):
                    self._merge_range(d.name, clo, chi)
        weights_fn = getattr(be, "split_weights", None)
        weights = weights_fn(self.uri, at=self.at) if weights_fn else None
        # string-keyed arrays (no integer axis): cut dim0 at fragment
        # var-NED boundary keys so format() reads parallelize too (r7)
        skeys = None
        if not any(
            isinstance(b, int)
            for d in self._info.dims for b in (d.domain or (None, None))
        ):
            skeys_fn = getattr(be, "string_split_keys", None)
            skeys = (
                skeys_fn(self.uri, at=self.at, since=self.since)
                if skeys_fn else None
            )
        splits = plan_splits(
            self._info, self.dim_ranges, self.target_splits,
            weights=weights, string_keys=skeys,
        )
        return [_SplitPartition(s) for s in splits]

    _PA_TYPES = {
        "bigint": "int64", "int": "int32", "smallint": "int16",
        "tinyint": "int8", "double": "float64", "float": "float32",
        "string": "string", "boolean": "bool", "binary": "binary",
    }

    def read(self, partition: _SplitPartition) -> Iterator:
        import pyarrow as pa  # noqa: PLC0415

        if partition is None or partition.ranges is None:
            return  # plan-level empty (condition_ned == [])
        kw = {} if self.since is None else {"since": self.since}
        pdf = _backend(self.encryption_key).read_range(
            self.uri,
            partition.ranges,
            self.columns,
            at=self.at,
            conditions=self.conditions,
            **kw,
        )
        if not len(pdf):
            return
        # explicit Arrow schema: a split whose nullable column is
        # all-None must not drift to the null type (schema mismatch
        # across partitions)
        ddl = {f.name: f.dtype for f in self._info.dims + self._info.attrs}

        def _pa_type(d: str):
            if d.startswith("array<") and d.endswith(">"):
                inner = d[6:-1]
                return pa.list_(
                    getattr(pa, self._PA_TYPES.get(inner, "string"))()
                )
            return getattr(pa, self._PA_TYPES.get(d, "string"))()

        fields = [
            pa.field(c, _pa_type(ddl.get(c, "string")))
            for c in self.columns
        ]
        yield pa.RecordBatch.from_pandas(
            pdf, schema=pa.schema(fields), preserve_index=False
        )


@dataclass
class _WroteFragment(WriterCommitMessage):
    n_rows: int


class TileDBNativeWriter(DataSourceWriter):
    def __init__(self, uri, options, schema):
        self.uri = uri
        self.options = options
        self.schema = schema
        self._ensure_array()

    def _ensure_array(self) -> None:
        import os  # noqa: PLC0415

        from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
            ArrayInfo,
            AttrInfo,
            DimInfo,
        )

        if os.path.isfile(os.path.join(self.uri, "__array_schema.tdb")):
            return
        dims_opt = self.options.get("dims")
        if not dims_opt:
            raise ValueError(
                "array does not exist; pass option('dims', 'col,...') "
                "(+ optional 'domain.<dim>' = 'lo:hi') to auto-create"
            )
        dim_names = [d.strip() for d in dims_opt.split(",")]
        field_types = {f.name: f.dataType.simpleString() for f in self.schema.fields}
        dims = []
        for dn in dim_names:
            dom = self.options.get(f"domain.{dn}", "0:9223372036854775806")
            lo, hi = (int(x) for x in dom.split(":"))
            dims.append(DimInfo(dn, field_types[dn], (lo, hi)))
        attrs = [
            AttrInfo(f.name, f.dataType.simpleString(), f.nullable)
            for f in self.schema.fields
            if f.name not in dim_names
        ]
        # filter DDL passthrough (the reference's CREATE TABLE options):
        # option("filters.<col>", "GZIP=6,BYTESHUFFLE"), plus
        # coordinate/offset/validity_filters, compressor,
        # string_compressor — parsed and honored by the schema writer
        create_opts = {
            k: v
            for k, v in self.options.items()
            if k.startswith("filters.")
            or k in (
                "compressor", "string_compressor", "coordinate_filters",
                "offset_filters", "validity_filters", "bloom",
            )
        }
        _backend(self.options.get("encryption_key")).create(
            self.uri, ArrayInfo(dims=dims, attrs=attrs, options=create_opts)
        )

    def write(self, iterator: Iterator) -> _WroteFragment:
        import pandas as pd  # noqa: PLC0415

        rows = list(iterator)
        if not rows:
            return _WroteFragment(0)
        pdf = pd.DataFrame(rows, columns=[f.name for f in self.schema.fields])
        _backend(self.options.get("encryption_key")).write(self.uri, pdf)
        return _WroteFragment(len(rows))

    def commit(self, messages) -> None:
        # fragments are independently durable once written (TileDB's
        # commit model): nothing to finalize
        pass

    def abort(self, messages) -> None:
        # written fragments from failed tasks would need fragment GC in a
        # full implementation; newest-wins reads stay correct regardless
        pass


class TileDBNativeStreamReader(SimpleDataSourceStreamReader):
    """Streaming SOURCE over a native array: the offset is the set of
    committed fragment directories; each micro-batch emits exactly the
    rows of fragments that appeared since the last offset (TileDB's
    append-only fragment model makes the change feed exact and
    replayable — readBetweenOffsets re-decodes the same immutable
    fragments)."""

    def __init__(self, uri: str, columns: list, encryption_key=None):
        self.uri = uri
        self.columns = columns
        self.encryption_key = encryption_key

    def _frags(self) -> list:
        import os  # noqa: PLC0415

        from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
            _fragment_dirs,
        )

        return [os.path.basename(f) for f in _fragment_dirs(self.uri)]

    def _rows_of(self, frag_names: list) -> Iterator:
        """Rows of exactly the named fragments (each decoded in
        isolation — fragments are immutable, so a batch's content never
        changes on replay)."""
        import os  # noqa: PLC0415

        from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
            _fragment_dirs,
            parse_array_schema,
            _read_field,
            _schema_path,
        )

        if not frag_names:
            return
        if self.encryption_key is not None:
            from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
                open_encryption,
            )

            open_encryption(self.uri, self.encryption_key)
        wanted = set(frag_names)
        schema = parse_array_schema(_schema_path(self.uri))
        names = [d.name for d in schema.dims] + [a.name for a in schema.attrs]
        idx = [names.index(c) for c in self.columns]
        for f in _fragment_dirs(self.uri):
            if os.path.basename(f) not in wanted:
                continue
            cols = [
                _read_field(f, schema, d, i, "d")
                for i, d in enumerate(schema.dims)
            ] + [
                _read_field(f, schema, a, i, "a")
                for i, a in enumerate(schema.attrs)
            ]
            for row in zip(*cols):
                yield tuple(row[j] for j in idx)

    def initialOffset(self) -> dict:
        return {"frags": []}

    def read(self, start: dict):
        seen = set(start.get("frags", []))
        now = self._frags()
        new = [f for f in now if f not in seen]
        # materialized list: the runner copies/pickles the batch payload
        return list(self._rows_of(new)), {"frags": now}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("frags", []))
        return list(
            self._rows_of(
                [f for f in end.get("frags", []) if f not in seen]
            )
        )

    def commit(self, end: dict) -> None:
        pass  # fragments are immutable; nothing to clean up


class TileDBNativeStreamWriter(DataSourceStreamWriter):
    """Streaming SINK: every epoch's partitions land as independent
    native fragments — micro-batch commit IS TileDB's fragment-commit
    model, so there is nothing extra to finalize."""

    def __init__(self, uri, options, schema):
        self._w = TileDBNativeWriter(uri, options, schema)

    def write(self, iterator: Iterator) -> _WroteFragment:
        return self._w.write(iterator)

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass


def _ds_simple_stream_reader(self, schema: StructType):
    return TileDBNativeStreamReader(
        self._uri(), [f.name for f in schema.fields],
        encryption_key=self._key(),
    )


def _ds_stream_writer(self, schema: StructType, overwrite: bool):
    return TileDBNativeStreamWriter(self._uri(), dict(self.options), schema)


TileDBNativeDataSource.simpleStreamReader = _ds_simple_stream_reader
TileDBNativeDataSource.streamWriter = _ds_stream_writer


def register_tiledb_native(spark) -> None:
    """Register the data source on a session:
    ``spark.read.format('tiledb_native').option('path', uri).load()``;
    streaming: ``spark.readStream.format('tiledb_native')`` emits new
    fragments per micro-batch, ``df.writeStream.format('tiledb_native')``
    lands fragments per epoch."""
    spark.dataSource.register(TileDBNativeDataSource)


_STATS_DDL = (
    "column string, cnt bigint, min_num double, max_num double, "
    "sum_num double, null_count bigint, min_str string, max_str string"
)


def sql_stats_table_from_array(
    spark, table_name: str, uri: str, at=None, encryption_key=None
) -> str:
    """COUNT/MIN/MAX/SUM/NULL_COUNT of a native array as a SQL table
    WITHOUT scanning it — group_by_handler parity
    (mytile/ha_mytile.cc:607-715, which answers these aggregates from
    storage before the executor runs).  The Python DataSource API has no
    SupportsPushDownAggregates hook, so ``SELECT COUNT(*) FROM <view>``
    over the format full-scans; THIS is the documented fast path: one
    row per column, answered entirely from fragment metadata (footer
    COUNT + fmmsn stats — zero data tiles decoded).

    Returns ``'metadata'`` when the trust rules allowed a metadata-only
    answer, else ``'scan'``: the same view computed by a distributed
    scan+aggregate through the registered format (the honest fallback
    when deletes/dense/overlap make per-fragment stats unmergeable).
    Stats a path cannot serve are NULL, never guessed: string columns
    fill min_str/max_str, numerics min_num/max_num/sum_num, null_count
    only for nullable attributes."""
    from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
        _DT,
        attr_stats_native_array,
        count_native_array,
        open_encryption,
        parse_array_schema,
        _schema_path,
    )

    if encryption_key is not None:
        open_encryption(uri, encryption_key)
    cnt = count_native_array(uri, at=at)
    st = attr_stats_native_array(uri, at=at)
    schema = parse_array_schema(_schema_path(uri))
    fields = list(schema.dims) + list(schema.attrs)
    if cnt is not None and st is not None:
        rows = []
        for f in fields:
            s = st.get(f.name) or {}
            is_str = _DT[f.dtype_id][1] == "c"
            has_mm = "min" in s
            rows.append((
                f.name,
                cnt,
                float(s["min"]) if has_mm and not is_str else None,
                float(s["max"]) if has_mm and not is_str else None,
                float(s["sum"]) if "sum" in s else None,
                int(s["null_count"]) if "null_count" in s else None,
                str(s["min"]) if has_mm and is_str else None,
                str(s["max"]) if has_mm and is_str else None,
            ))
        spark.createDataFrame(rows, _STATS_DDL).createOrReplaceTempView(
            table_name
        )
        return "metadata"
    # fallback: identical view shape from a distributed scan+aggregate
    from pyspark.sql import functions as F  # noqa: PLC0415

    reader = spark.read.format("tiledb_native").option("path", uri)
    if at is not None:
        reader = reader.option("at", str(at))
    if encryption_key is not None:
        reader = reader.option("encryption_key", encryption_key)
    register_tiledb_native(spark)
    df = reader.load()
    nullable_attrs = {a.name for a in schema.attrs if a.nullable}
    parts = []
    for f in fields:
        is_str = _DT[f.dtype_id][1] == "c"
        # fixed multi-value (array-typed) cells carry no orderable stats
        is_num = f.cell_val_num == 1 and not is_str
        c = F.col(f.name)
        parts.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.count(F.lit(1)).alias("cnt"),
                (F.min(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.sum(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("sum_num"),
                (F.sum(F.when(c.isNull(), 1).otherwise(0))
                 if f.name in nullable_attrs
                 else F.lit(None).cast("bigint")).alias("null_count"),
                (F.min(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            ).alias(f.name)
        )
    one = df.agg(*parts)
    stacked = one.select(
        F.explode(F.array(*[F.col(f.name) for f in fields])).alias("s")
    ).select("s.*")
    stacked.createOrReplaceTempView(table_name)
    return "scan"


def sql_windowed_stats_from_array(
    spark, table_name: str, uri: str, ranges: dict,
    at=None, since=None, encryption_key=None,
) -> str:
    """Range-WINDOWED COUNT/MIN/MAX/SUM/NULL_COUNT as a SQL table — the
    subarray form of :func:`sql_stats_table_from_array` (group_by_handler
    parity, mytile/ha_mytile.cc:607-715, extended with TileDB core's
    tile-stats aggregate design): tiles fully inside ``ranges`` answer
    from fragment metadata, only boundary tiles decode.  Same row shape
    (``_STATS_DDL``), ``cnt`` = in-window cell count.

    Returns ``'metadata'`` when the trust rules held (boundary tiles may
    still have been decoded — exactly, driver-side, O(boundary)), else
    ``'scan'``: the identical view computed by a distributed
    filter+aggregate through the registered format.  Enum attributes
    report LABEL extrema in min_str/max_str on both paths."""
    from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
        _DT,
        open_encryption,
        parse_array_schema,
        _schema_path,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_agg import (  # noqa: PLC0415
        windowed_agg_native,
    )

    if encryption_key is not None:
        open_encryption(uri, encryption_key)
    schema = parse_array_schema(_schema_path(uri))
    fields = list(schema.dims) + list(schema.attrs)
    res = windowed_agg_native(
        uri, ranges, fields=[f.name for f in fields], at=at, since=since
    )
    if res is not None:
        rows = []
        for f in fields:
            s = res["fields"][f.name]
            is_str = _DT[f.dtype_id][1] == "c" or bool(
                getattr(f, "enumeration", None)
            )
            rows.append((
                f.name,
                res["count"],
                float(s["min"]) if s["min"] is not None and not is_str
                else None,
                float(s["max"]) if s["max"] is not None and not is_str
                else None,
                float(s["sum"]) if s["sum"] is not None else None,
                int(s["null_count"]) if s["null_count"] is not None
                else None,
                str(s["min"]) if s["min"] is not None and is_str else None,
                str(s["max"]) if s["max"] is not None and is_str else None,
            ))
        spark.createDataFrame(rows, _STATS_DDL).createOrReplaceTempView(
            table_name
        )
        return "metadata"
    # fallback: identical view shape from a distributed scan+aggregate
    # with the window pushed down as dim-range filters
    from pyspark.sql import functions as F  # noqa: PLC0415

    reader = spark.read.format("tiledb_native").option("path", uri)
    if at is not None:
        reader = reader.option("at", str(at))
    if since is not None:
        reader = reader.option("since", str(since))
    if encryption_key is not None:
        reader = reader.option("encryption_key", encryption_key)
    register_tiledb_native(spark)
    df = reader.load()
    for dname, (lo, hi) in (ranges or {}).items():
        if lo is not None:
            df = df.filter(F.col(dname) >= lo)
        if hi is not None:
            df = df.filter(F.col(dname) <= hi)
    nullable_attrs = {a.name for a in schema.attrs if a.nullable}
    parts = []
    for f in fields:
        is_str = _DT[f.dtype_id][1] == "c" or bool(
            getattr(f, "enumeration", None)
        )
        is_num = f.cell_val_num == 1 and not is_str
        c = F.col(f.name)
        parts.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.count(F.lit(1)).alias("cnt"),
                (F.min(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.sum(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("sum_num"),
                (F.sum(F.when(c.isNull(), 1).otherwise(0))
                 if f.name in nullable_attrs
                 else F.lit(None).cast("bigint")).alias("null_count"),
                (F.min(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            ).alias(f.name)
        )
    one = df.agg(*parts)
    stacked = one.select(
        F.explode(F.array(*[F.col(f.name) for f in fields])).alias("s")
    ).select("s.*")
    stacked.createOrReplaceTempView(table_name)
    return "scan"


def sql_bucketed_stats_from_array(
    spark, table_name: str, uri: str, width: int,
    at=None, since=None, encryption_key=None, ranges=None,
) -> str:
    """GROUP BY ``floor(dim0/width)`` rollup as a SQL table — the
    grouped twin of :func:`sql_windowed_stats_from_array` (the
    hypertable continuous-aggregate shape): per bucket and column,
    COUNT/MIN/MAX/SUM/NULL_COUNT answered from tile stats in one footer
    walk; only bucket-edge tiles decode.  Row shape: ``bucket`` +
    ``_STATS_DDL``; ``cnt`` = the bucket's cell count.

    ``ranges`` optionally windows the rollup (dim name -> inclusive
    (lo, hi)) — GROUP BY bucket WHERE dim BETWEEN a AND b, answered
    with out-of-window tiles skipped from metadata.

    Returns ``'metadata'`` when the trust rules held, else ``'scan'``:
    the identical view from a distributed groupBy over the registered
    format (exact floor division, any-sign coordinates)."""
    from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
        _DT,
        open_encryption,
        parse_array_schema,
        _schema_path,
    )
    from tiledb_mariadb_spark.sources.tiledb_native_agg import (  # noqa: PLC0415
        bucketed_agg_native,
    )

    if encryption_key is not None:
        open_encryption(uri, encryption_key)
    schema = parse_array_schema(_schema_path(uri))
    fields = list(schema.dims) + list(schema.attrs)
    ddl = "bucket bigint, " + _STATS_DDL
    res = bucketed_agg_native(
        uri, width, fields=[f.name for f in fields], at=at, since=since,
        ranges=ranges,
    )
    if res is not None:
        rows = []
        for b, ent in sorted(res["buckets"].items()):
            for f in fields:
                s = ent["fields"][f.name]
                is_str = _DT[f.dtype_id][1] == "c" or bool(
                    getattr(f, "enumeration", None)
                )
                rows.append((
                    int(b),
                    f.name,
                    ent["count"],
                    float(s["min"]) if s["min"] is not None and not is_str
                    else None,
                    float(s["max"]) if s["max"] is not None and not is_str
                    else None,
                    float(s["sum"]) if s["sum"] is not None else None,
                    int(s["null_count"]) if s["null_count"] is not None
                    else None,
                    str(s["min"]) if s["min"] is not None and is_str
                    else None,
                    str(s["max"]) if s["max"] is not None and is_str
                    else None,
                ))
        spark.createDataFrame(rows, ddl).createOrReplaceTempView(
            table_name
        )
        return "metadata"
    from pyspark.sql import functions as F  # noqa: PLC0415

    reader = spark.read.format("tiledb_native").option("path", uri)
    if at is not None:
        reader = reader.option("at", str(at))
    if since is not None:
        reader = reader.option("since", str(since))
    if encryption_key is not None:
        reader = reader.option("encryption_key", encryption_key)
    register_tiledb_native(spark)
    df = reader.load()
    for dname, (rlo, rhi) in (ranges or {}).items():
        if rlo is not None:
            df = df.filter(F.col(dname) >= rlo)
        if rhi is not None:
            df = df.filter(F.col(dname) <= rhi)
    d0 = schema.dims[0].name
    # exact FLOOR division for any-sign integer keys (never through
    # double: keys past 2^53 would round): non-negative python-mod
    # then an exact DIV
    bexpr = F.expr(
        f"CAST((`{d0}` - (((`{d0}` % {width}) + {width}) % {width})) "
        f"DIV {width} AS BIGINT)"
    )
    nullable_attrs = {a.name for a in schema.attrs if a.nullable}
    parts = []
    for f in fields:
        is_str = _DT[f.dtype_id][1] == "c" or bool(
            getattr(f, "enumeration", None)
        )
        is_num = f.cell_val_num == 1 and not is_str
        c = F.col(f.name)
        parts.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.count(F.lit(1)).alias("cnt"),
                (F.min(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.sum(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("sum_num"),
                (F.sum(F.when(c.isNull(), 1).otherwise(0))
                 if f.name in nullable_attrs
                 else F.lit(None).cast("bigint")).alias("null_count"),
                (F.min(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c).cast("string") if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            ).alias(f.name)
        )
    grouped = df.groupBy(bexpr.alias("bucket")).agg(*parts)
    stacked = grouped.select(
        "bucket",
        F.explode(F.array(*[F.col(f.name) for f in fields])).alias("s"),
    ).select("bucket", "s.*")
    stacked.createOrReplaceTempView(table_name)
    return "scan"


def sql_table_from_array(spark, table_name: str, uri: str, **options) -> None:
    """SQL-surface registration — the ``CREATE TABLE ... ENGINE=mytile
    uri='...'`` analog: the bare array becomes a plain SQL table name
    (temp view over the registered format, so pushFilters still applies).
    Spark's catalog `CREATE TABLE ... USING <python-ds>` does not forward
    OPTIONS to the Python read path (verified on 4.1), hence the view."""
    register_tiledb_native(spark)
    reader = spark.read.format("tiledb_native").option("path", uri)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    reader.load().createOrReplaceTempView(table_name)
