"""Pure-Python decoder for (a subset of) the TileDB 1.6 on-disk fragment
format — enough to read the reference repo's own committed fixture
arrays (mysql-test/mytile/test_data/tiledb_arrays/1.6/quickstart_dense,
quickstart_sparse) without libtiledb, and validate our engine against
the exact bytes the reference's mtr suite reads.

Format subset implemented (public TileDB format spec, v1.6 era):

- **filtered/chunked tile** — ``[num_chunks u64]`` then per chunk
  ``[orig_len u32][filtered_len u32][metadata_len u32][metadata]
  [filtered bytes]``; chunk payloads may be raw, zlib (attribute GZIP
  filter) or zstd (the 1.6 default coordinate filter);
- **minimal zstd frame decoder** — magic + frame header + RAW / RLE
  blocks only (the only block types tiny fixture tiles produce; a
  compressed block raises, it never silently misreads);
- **dense fragments** — the attribute tile holds cells in row-major
  global order over the declared domain;
- **sparse fragments** — ``__coords.tdb`` holds per-dimension
  coordinate chunks (dim-major), attribute tiles align cell-for-cell.

The array SCHEMA is supplied by the caller (dims/attrs/domain, the same
registration contract as ``create_allow_subset_existing_array``):
deserializing the 1.6 binary schema blob is out of scope — the fixture
schemas are documented in the reference's own discovery.result golden
file, which the tests mirror.  Write support is intentionally absent.
"""

from __future__ import annotations

import itertools
import os
import struct
import zlib

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _zstd_decode_minimal(buf: bytes) -> bytes:
    """Decode a zstd frame containing only RAW / RLE blocks."""
    if buf[:4] != ZSTD_MAGIC:
        raise ValueError("not a zstd frame")
    pos = 4
    fhd = buf[pos]
    pos += 1
    single_segment = (fhd >> 5) & 1
    fcs_code = fhd >> 6
    if fhd & 0x03:
        raise NotImplementedError("dictionary frames unsupported")
    if (fhd >> 3) & 1:
        raise NotImplementedError("reserved bit set")
    if not single_segment:
        pos += 1  # window descriptor
    fcs_sizes = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}
    pos += fcs_sizes[fcs_code]
    out = bytearray()
    while True:
        header = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = header & 1
        btype = (header >> 1) & 3
        size = header >> 3
        if btype == 0:  # raw
            out += buf[pos : pos + size]
            pos += size
        elif btype == 1:  # RLE: one byte repeated `size` times
            out += buf[pos : pos + 1] * size
            pos += 1
        else:
            raise NotImplementedError(
                "compressed zstd blocks unsupported (minimal decoder)"
            )
        if last:
            break
    return bytes(out)


def _decode_chunk(filtered: bytes, orig_len: int) -> bytes:
    if filtered[:4] == ZSTD_MAGIC:
        out = _zstd_decode_minimal(filtered)
    elif filtered[:2] in (b"\x78\x01", b"\x78\x9c", b"\x78\xda"):
        out = zlib.decompress(filtered)
    else:
        out = filtered
    if len(out) != orig_len:
        raise ValueError(f"chunk decoded to {len(out)}, expected {orig_len}")
    return out


def read_chunked_tile(buf: bytes) -> list[bytes]:
    """Parse a filtered tile buffer into its decoded chunks."""
    (num_chunks,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    chunks = []
    for _ in range(num_chunks):
        orig, filt, meta = struct.unpack_from("<III", buf, pos)
        pos += 12 + meta
        chunks.append(_decode_chunk(buf[pos : pos + filt], orig))
        pos += filt
    return chunks


def _fragment_dir(array_dir: str) -> str:
    frags = sorted(
        d
        for d in os.listdir(array_dir)
        if d.startswith("__") and os.path.isdir(os.path.join(array_dir, d))
    )
    if not frags:
        raise FileNotFoundError(f"no fragment in {array_dir}")
    return os.path.join(array_dir, frags[-1])


_STRUCT_CODE = {"int32": "i", "int64": "q", "float32": "f", "float64": "d"}


def _cells(raw: bytes, dtype: str) -> list:
    code = _STRUCT_CODE[dtype]
    size = struct.calcsize(code)
    return list(struct.unpack(f"<{len(raw) // size}{code}", raw))


def read_dense_array(
    array_dir: str,
    dim_domains: list[tuple[int, int]],
    attrs: dict[str, str],
) -> list[tuple]:
    """Rows of (dim1..dimN, attr1..attrM) for a single-fragment dense
    1.6 array whose tile extent covers the whole domain (the fixture
    layout): cells are row-major over the domain."""
    frag = _fragment_dir(array_dir)
    coords = list(
        itertools.product(*[range(lo, hi + 1) for lo, hi in dim_domains])
    )
    cols = []
    for attr, dtype in attrs.items():
        buf = open(os.path.join(frag, f"{attr}.tdb"), "rb").read()
        vals = _cells(b"".join(read_chunked_tile(buf)), dtype)
        if len(vals) != len(coords):
            raise ValueError(f"{attr}: {len(vals)} cells for {len(coords)}")
        cols.append(vals)
    return [c + tuple(v[i] for v in cols) for i, c in enumerate(coords)]


def read_sparse_array_v2(
    array_dir: str,
    dim_names: list[str],
    dim_dtype: str,
    attrs: dict[str, str],
) -> list[tuple]:
    """Sparse 2.x-layout array (one coordinate FILE per dimension —
    ``<dim>.tdb`` — instead of 1.6's zipped ``__coords.tdb``); the tile
    payload format is unchanged, so this covers the reference's 2.3
    Hilbert fixture too (cell order affects on-disk cell sequence only,
    not decoding)."""
    frag = _fragment_dir(array_dir)
    dims = []
    for d in dim_names:
        buf = open(os.path.join(frag, f"{d}.tdb"), "rb").read()
        dims.append(_cells(b"".join(read_chunked_tile(buf)), dim_dtype))
    n = len(dims[0])
    out_attrs = []
    for attr, dtype in attrs.items():
        buf = open(os.path.join(frag, f"{attr}.tdb"), "rb").read()
        vals = _cells(b"".join(read_chunked_tile(buf)), dtype)
        if len(vals) != n:
            raise ValueError(f"{attr}: {len(vals)} values for {n} cells")
        out_attrs.append(vals)
    return [
        tuple(d[i] for d in dims) + tuple(v[i] for v in out_attrs)
        for i in range(n)
    ]


def dense_to_dataframe(
    spark,
    array_dir: str,
    dim_names: list[str],
    dim_domains: list[tuple[int, int]],
    attrs: dict[str, str],
):
    """Dense 1.6 array → Spark DataFrame (dims then attrs)."""
    rows = read_dense_array(array_dir, dim_domains, attrs)
    ddl = ", ".join(
        [f"`{d}` int" for d in dim_names]
        + [f"`{a}` {'int' if t == 'int32' else t}" for a, t in attrs.items()]
    )
    return spark.createDataFrame(rows, ddl)


def read_sparse_array(
    array_dir: str,
    n_dims: int,
    dim_dtype: str,
    attrs: dict[str, str],
) -> list[tuple]:
    """Rows of (dim1..dimN, attr1..attrM) for a single-fragment sparse
    1.6 array: ``__coords.tdb`` chunks are per-dimension coordinate
    vectors (dim-major)."""
    frag = _fragment_dir(array_dir)
    cbuf = open(os.path.join(frag, "__coords.tdb"), "rb").read()
    chunks = read_chunked_tile(cbuf)
    if len(chunks) == n_dims:
        dims = [_cells(c, dim_dtype) for c in chunks]
    else:
        # single zipped chunk: (d1, d2, ..., dn) per cell
        flat = _cells(b"".join(chunks), dim_dtype)
        dims = [flat[i::n_dims] for i in range(n_dims)]
    n = len(dims[0])
    out_attrs = []
    for attr, dtype in attrs.items():
        buf = open(os.path.join(frag, f"{attr}.tdb"), "rb").read()
        vals = _cells(b"".join(read_chunked_tile(buf)), dtype)
        if len(vals) != n:
            raise ValueError(f"{attr}: {len(vals)} values for {n} cells")
        out_attrs.append(vals)
    return [
        tuple(d[i] for d in dims) + tuple(v[i] for v in out_attrs)
        for i in range(n)
    ]
