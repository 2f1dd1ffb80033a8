"""From-scratch pure-Python Zstandard frame decoder (RFC 8878).

Why it exists: the TileDB on-disk format compresses most tiles with zstd
(the 1.6+ default coordinate/offsets codec).  The native decoder
(sources/tiledb_native.py) previously handled only RAW/RLE zstd blocks —
enough for tiny fixture tiles — and delegated real compressed blocks to
pyarrow's bundled codec.  This module removes that dependency for
arbitrary arrays: a complete decoder for zstd frames,

- literals: Raw, RLE, Huffman-compressed (direct or FSE-compressed
  weights, 1-stream and 4-stream), and Treeless (previous-table reuse);
- sequences: Predefined / RLE / FSE_Compressed / Repeat table modes for
  all three code streams (literals-length, offset, match-length),
  interleaved-state backward bitstream, full repeat-offset history
  semantics (including the literals_length == 0 shifted rules);
- frames: window / single-segment headers, frame content size, content
  checksum skip, multi-block frames with cross-block table reuse and
  cross-block match windows.

NOT implemented (loud failures, never misreads): dictionary frames and
skippable frames — TileDB never writes either.

Written from the public RFC 8878 specification (the FSE distribution
reader is the exact inverse of the spec's count-encoding state machine);
validated by fuzz round-trips against a real zstd encoder
(tests/test_zstd_py.py).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


class ZstdError(ValueError):
    pass


# --------------------------------------------------------------------------
# bit readers
# --------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # absolute bit position

    def read(self, n: int) -> int:
        out = 0
        p = self.pos
        for i in range(n):
            out |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return out

    @property
    def bytes_used(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bitstream (Huffman / FSE payloads): the last non-zero
    byte's highest set bit is a sentinel; reads consume high bits
    downward, zero-padding once the start is passed (callers watch
    ``.bits`` for exhaustion)."""

    __slots__ = ("val", "bits")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        self.val = int.from_bytes(data, "little")
        if self.val == 0:
            raise ZstdError("bitstream has no sentinel bit")
        self.bits = self.val.bit_length() - 1  # drop the sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bits >= n:
            self.bits -= n
            return (self.val >> self.bits) & ((1 << n) - 1)
        got = self.bits if self.bits > 0 else 0
        out = (self.val & ((1 << got) - 1)) << (n - got) if got else 0
        self.bits -= n
        return out


# --------------------------------------------------------------------------
# FSE
# --------------------------------------------------------------------------


def read_fse_distribution(data: bytes) -> tuple[list[int], int, int]:
    """FSE table description -> (normalized counts with -1 for
    less-than-one probabilities, accuracy_log, bytes consumed).

    Exact inverse of the spec's count encoder: the encoder keeps
    ``remaining = table_size + 1``, ``threshold = table_size``,
    ``nbits = accuracy_log + 1``; each count+1 is written in ``nbits``
    bits, or ``nbits - 1`` when it falls below
    ``max = 2*threshold - 1 - remaining``, with values >= threshold
    shifted up by ``max``; after each symbol threshold/nbits shrink
    while remaining < threshold.  A zero count is followed by 2-bit
    zero-run repeats (3 = continue)."""
    br = _ForwardBits(data)
    accuracy_log = br.read(4) + 5
    if accuracy_log > 15:
        raise ZstdError(f"accuracy_log {accuracy_log} too large")
    table_size = 1 << accuracy_log
    remaining = table_size + 1
    threshold = table_size
    nbits = accuracy_log + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > 255:
            raise ZstdError("too many FSE symbols")
        mx = (2 * threshold - 1) - remaining
        low = br.read(nbits - 1)
        if low < mx:
            e = low
        else:
            e = low | (br.read(1) << (nbits - 1))
            if e >= threshold:
                e -= mx
        count = e - 1
        counts.append(count)
        remaining -= -count if count < 0 else count
        if count == 0:
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return counts, accuracy_log, br.bytes_used


class FseTable:
    """Decoding table: state -> (symbol, nb_bits, baseline)."""

    __slots__ = ("accuracy_log", "symbol", "nb_bits", "baseline")

    def __init__(self, counts: list[int], accuracy_log: int):
        size = 1 << accuracy_log
        self.accuracy_log = accuracy_log
        self.symbol = [0] * size
        self.nb_bits = [0] * size
        self.baseline = [0] * size
        # less-than-one symbols take one cell each from the TOP
        high = size
        state_desc = [0] * len(counts)
        for s, c in enumerate(counts):
            if c == -1:
                high -= 1
                self.symbol[high] = s
                state_desc[s] = 1
            elif c > 0:
                state_desc[s] = c
        # spread the positive-probability symbols
        pos = 0
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                self.symbol[pos] = s
                pos = (pos + step) & mask
                while pos >= high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE spread did not cycle to zero")
        # uniform nb_bits/baseline pass (low-prob cells start at desc=1
        # -> nb = accuracy_log, baseline = 0)
        for state in range(size):
            s = self.symbol[state]
            x = state_desc[s]
            state_desc[s] += 1
            nb = accuracy_log - (x.bit_length() - 1)
            self.nb_bits[state] = nb
            self.baseline[state] = (x << nb) - size


def fse_table_from_rle(symbol: int) -> FseTable:
    t = FseTable.__new__(FseTable)
    t.accuracy_log = 0
    t.symbol = [symbol]
    t.nb_bits = [0]
    t.baseline = [0]
    return t


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


class HuffTable:
    """Prefix-lookup table of size 2^max_bits: peek max_bits, map to
    (symbol, code_len), give back unused bits."""

    __slots__ = ("max_bits", "sym", "len")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("empty Huffman weights")
        # implied last weight completes the sum to the next power of two
        nxt = 1 << total.bit_length()
        leftover = nxt - total
        if leftover & (leftover - 1):
            raise ZstdError("Huffman weights do not complete a power of 2")
        weights = weights + [leftover.bit_length()]
        max_bits = nxt.bit_length() - 1
        if max_bits > 11:
            raise ZstdError(f"Huffman max_bits {max_bits} exceeds 11")
        self.max_bits = max_bits
        size = 1 << max_bits
        self.sym = bytearray(size)
        self.len = bytearray(size)
        # canonical order: ascending weight, then ascending symbol; a
        # weight-w symbol has code length max_bits+1-w and owns
        # 2^(w-1) consecutive table slots
        pos = 0
        for w in range(1, max_bits + 2):
            for s, sw in enumerate(weights):
                if sw != w:
                    continue
                n = 1 << (w - 1)
                code_len = max_bits + 1 - w
                self.sym[pos : pos + n] = bytes([s]) * n
                self.len[pos : pos + n] = bytes([code_len]) * n
                pos += n
        if pos != size:
            raise ZstdError("Huffman table underfilled")

    def decode_stream(self, data: bytes, out_len: int) -> bytes:
        br = _BackBits(data)
        out = bytearray()
        mb = self.max_bits
        sym, lens = self.sym, self.len
        while len(out) < out_len:
            avail = br.bits
            idx = br.read(mb)
            code_len = lens[idx]
            if code_len > avail:
                raise ZstdError("Huffman stream exhausted early")
            br.bits += mb - code_len  # give back unused bits
            out.append(sym[idx])
        return bytes(out)


def _read_huffman_table(data: bytes) -> tuple[HuffTable, int]:
    """Huffman tree description -> (table, bytes consumed)."""
    hdr = data[0]
    if hdr >= 128:  # direct: hdr-127 weights, 4 bits each
        n = hdr - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        weights = [
            (raw[i >> 1] >> 4) if i % 2 == 0 else (raw[i >> 1] & 0xF)
            for i in range(n)
        ]
        return HuffTable(weights), 1 + nbytes
    # FSE-compressed weights (two interleaved states)
    comp = data[1 : 1 + hdr]
    counts, alog, used = read_fse_distribution(comp)
    table = FseTable(counts, alog)
    br = _BackBits(comp[used:])
    s1 = br.read(alog)
    s2 = br.read(alog)
    if br.bits < 0:
        raise ZstdError("weights bitstream too short")
    weights: list[int] = []
    while True:
        if len(weights) > 254:
            raise ZstdError("too many Huffman weights")
        weights.append(table.symbol[s1])
        nb = table.nb_bits[s1]
        if nb > br.bits:
            weights.append(table.symbol[s2])
            break
        s1 = table.baseline[s1] + br.read(nb)
        weights.append(table.symbol[s2])
        nb = table.nb_bits[s2]
        if nb > br.bits:
            weights.append(table.symbol[s1])
            break
        s2 = table.baseline[s2] + br.read(nb)
    return HuffTable(weights), 1 + hdr


# --------------------------------------------------------------------------
# sequence code tables (RFC 8878 §3.1.1.3.2.1)
# --------------------------------------------------------------------------

_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384,
                              32768, 65536]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                 99, 131, 259, 515, 1027, 2051, 4099, 8195,
                                 16387, 32771, 65539]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DEFAULT_LOG, _ML_DEFAULT_LOG, _OF_DEFAULT_LOG = 6, 6, 5


# --------------------------------------------------------------------------
# frame decoding
# --------------------------------------------------------------------------


class _FrameState:
    """Cross-block state within one frame: Huffman table (Treeless
    literals), FSE tables (Repeat mode), repeat-offset history."""

    __slots__ = ("huff", "ll", "of", "ml", "rep")

    def __init__(self):
        self.huff = None
        self.ll = self.of = self.ml = None
        self.rep = [1, 4, 8]


def _decode_literals(data: bytes, st: _FrameState) -> tuple[bytes, int]:
    """Literals section -> (literals, bytes consumed)."""
    b0 = data[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):  # 1-byte header, 5-bit size
            rsize, hlen = b0 >> 3, 1
        elif sf == 1:  # 2-byte, 12-bit
            rsize, hlen = (b0 >> 4) | (data[1] << 4), 2
        else:  # 3-byte, 20-bit
            rsize, hlen = (b0 >> 4) | (data[1] << 4) | (data[2] << 12), 3
        if ltype == 0:
            if hlen + rsize > len(data):
                raise ZstdError("raw literals overrun block")
            return bytes(data[hlen : hlen + rsize]), hlen + rsize
        return data[hlen : hlen + 1] * rsize, hlen + 1
    # Compressed (2) / Treeless (3)
    if sf in (0, 1):  # 3-byte header: 10-bit sizes
        both = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
        rsize, csize, hlen = both & 0x3FF, both >> 10, 3
        four_streams = sf == 1
    elif sf == 2:  # 4-byte: 14-bit sizes
        both = ((b0 >> 4) | (data[1] << 4) | (data[2] << 12)
                | (data[3] << 20))
        rsize, csize, hlen = both & 0x3FFF, both >> 14, 4
        four_streams = True
    else:  # 5-byte: 18-bit sizes
        both = ((b0 >> 4) | (data[1] << 4) | (data[2] << 12)
                | (data[3] << 20) | (data[4] << 28))
        rsize, csize, hlen = both & 0x3FFFF, both >> 18, 5
        four_streams = True
    payload = data[hlen : hlen + csize]
    if len(payload) != csize:
        raise ZstdError("literals payload overruns block")
    if ltype == 2:
        st.huff, used = _read_huffman_table(payload)
        payload = payload[used:]
    elif st.huff is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table = st.huff
    if not four_streams:
        return table.decode_stream(payload, rsize), hlen + csize
    if len(payload) < 6:
        raise ZstdError("4-stream literals too short for jump table")
    s1, s2, s3 = struct.unpack_from("<3H", payload, 0)
    streams = [
        payload[6 : 6 + s1],
        payload[6 + s1 : 6 + s1 + s2],
        payload[6 + s1 + s2 : 6 + s1 + s2 + s3],
        payload[6 + s1 + s2 + s3 :],
    ]
    part = (rsize + 3) // 4
    sizes = [part, part, part, rsize - 3 * part]
    out = b"".join(
        table.decode_stream(sdata, slen)
        for sdata, slen in zip(streams, sizes)
    )
    return out, hlen + csize


def _seq_table(mode, data, pos, prev, default, default_log, max_symbol):
    if mode == 0:  # Predefined
        return FseTable(default, default_log), pos
    if mode == 1:  # RLE
        sym = data[pos]
        if sym > max_symbol:
            raise ZstdError(f"RLE sequence symbol {sym} out of range")
        return fse_table_from_rle(sym), pos + 1
    if mode == 2:  # FSE_Compressed
        counts, alog, used = read_fse_distribution(data[pos:])
        if len(counts) - 1 > max_symbol:
            raise ZstdError("FSE distribution has too many symbols")
        return FseTable(counts, alog), pos + used
    if prev is None:  # Repeat
        raise ZstdError("repeat sequence table with no previous table")
    return prev, pos


def _decode_sequences(
    data: bytes, literals: bytes, st: _FrameState, out: bytearray
) -> None:
    """Sequences section + execution, appending into the FRAME output
    buffer ``out`` (matches may reach back across blocks)."""
    if not data:
        raise ZstdError("missing sequences section")
    b0 = data[0]
    if b0 == 0:  # no sequences: block content = literals
        out += literals
        return
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) + data[1], 2
    else:
        nseq, pos = data[1] + (data[2] << 8) + 0x7F00, 3
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    st.ll, pos = _seq_table((modes >> 6) & 3, data, pos, st.ll,
                            _LL_DEFAULT, _LL_DEFAULT_LOG, 35)
    st.of, pos = _seq_table((modes >> 4) & 3, data, pos, st.of,
                            _OF_DEFAULT, _OF_DEFAULT_LOG, 31)
    st.ml, pos = _seq_table((modes >> 2) & 3, data, pos, st.ml,
                            _ML_DEFAULT, _ML_DEFAULT_LOG, 52)
    ll_t, of_t, ml_t = st.ll, st.of, st.ml
    br = _BackBits(data[pos:])
    ll_state = br.read(ll_t.accuracy_log)
    of_state = br.read(of_t.accuracy_log)
    ml_state = br.read(ml_t.accuracy_log)
    if br.bits < 0:
        raise ZstdError("sequence bitstream too short for initial states")
    lit_pos = 0
    rep = st.rep
    for i in range(nseq):
        of_code = of_t.symbol[of_state]
        ml_code = ml_t.symbol[ml_state]
        ll_code = ll_t.symbol[ll_state]
        # extra bits: offset, then match length, then literals length
        of_val = (1 << of_code) + br.read(of_code)
        ml = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        if br.bits < 0:
            raise ZstdError("sequence bitstream exhausted mid-sequence")
        # repeat-offset history (RFC 8878 §3.1.1.5)
        if of_val > 3:
            offset = of_val - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[:] = [offset, rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                rep[:] = [offset, rep[0], rep[1]]
            else:  # literals_length == 0 and offset_value == 3
                offset = rep[0] - 1
                if offset <= 0:
                    raise ZstdError("zero repeat offset")
                rep[:] = [offset, rep[0], rep[1]]
        if lit_pos + ll > len(literals):
            raise ZstdError("literals overrun")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        src = len(out) - offset
        if src < 0:
            raise ZstdError("match offset beyond window")
        if offset >= ml:  # non-overlapping: one slice copy
            out += out[src : src + ml]
        else:  # overlapping: grow by doubling slices
            todo = ml
            while todo > 0:
                take = min(todo, len(out) - src)
                out += out[src : src + take]
                todo -= take
        # update states (never after the last sequence): LL, ML, OF
        if i != nseq - 1:
            ll_state = ll_t.baseline[ll_state] + br.read(
                ll_t.nb_bits[ll_state])
            ml_state = ml_t.baseline[ml_state] + br.read(
                ml_t.nb_bits[ml_state])
            of_state = of_t.baseline[of_state] + br.read(
                of_t.nb_bits[of_state])
            if br.bits < 0:
                raise ZstdError("sequence bitstream exhausted in update")
    out += literals[lit_pos:]


def zstd_decompress(buf: bytes) -> bytes:
    """Decode one zstd frame (a TileDB chunk holds exactly one)."""
    if buf[:4] != ZSTD_MAGIC:
        raise ZstdError("not a zstd frame")
    pos = 4
    fhd = buf[pos]
    pos += 1
    dict_id_flag = fhd & 3
    checksum = (fhd >> 2) & 1
    single_segment = (fhd >> 5) & 1
    fcs_code = fhd >> 6
    if (fhd >> 3) & 1:
        raise ZstdError("reserved frame header bit set")
    if dict_id_flag:
        raise ZstdError("dictionary frames unsupported")
    if not single_segment:
        pos += 1  # window descriptor
    pos += {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_code]
    st = _FrameState()
    out = bytearray()
    while True:
        header = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = header & 1
        btype = (header >> 1) & 3
        size = header >> 3
        if btype == 0:  # Raw
            out += buf[pos : pos + size]
            pos += size
        elif btype == 1:  # RLE
            out += buf[pos : pos + 1] * size
            pos += 1
        elif btype == 2:  # Compressed
            block = buf[pos : pos + size]
            pos += size
            literals, used = _decode_literals(block, st)
            _decode_sequences(block[used:], literals, st, out)
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    return bytes(out)
