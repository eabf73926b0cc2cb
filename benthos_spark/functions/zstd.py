"""Pure-python Zstandard (RFC 8878) — full decoder + store-mode encoder.

Backs the `zstd` compress/decompress algorithm
(/root/reference/internal/impl/pure/extended/zstd.go) without the
zstandard package. Implemented from the public RFC:

- decoder: frame header, raw/RLE/compressed blocks, the full literals
  section (raw/RLE/Huffman 1- and 4-stream, FSE-compressed weight
  tables, treeless repeat), FSE-coded sequences (predefined/RLE/
  compressed/repeat table modes), the three-slot repeat-offset rules
  with the literals_length==0 remap, overlap-safe match copies, and
  xxHash64(low 32) content checksums;
- encoder, two tiers: ``compress_lz`` is a REAL compressor — greedy
  LZ77 matching into FSE-coded sequences over the RFC's predefined
  distributions (Predefined_Mode for all three codes, raw-literal
  sections, explicit offsets, raw-block fallback when a block doesn't
  shrink); ``compress`` remains the raw/RLE store-mode fallback.

Validation (tests/test_zstd.py): the decoder reads frames produced by
the REAL zstd (Spark's zstd-jni, com.github.luben.zstd) across levels
and data shapes, and zstd-jni decompresses BOTH encoders' frames
byte-exact (including multi-block frames with cross-block history
offsets and 2/3-byte nbSeq headers). Dictionaries and skippable frames
are rejected explicitly (the reference's bloblang methods don't expose
dictionaries either).
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528


class ZstdError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------------


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        out = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.buf):
                raise ZstdError("FSE description overruns its buffer")
            bit = (self.buf[byte] >> (self.bitpos & 7)) & 1
            out |= bit << i
            self.bitpos += 1
        return out

    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3


class _BackBits:
    """Backward bit reader (Huffman/FSE payload bitstreams): the last
    set bit of the last byte is the sentinel; bits are then consumed
    from high to low."""

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ZstdError("corrupted backward bitstream")
        self.value = int.from_bytes(buf, "little")
        self.bits = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1
        self.overread = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bits -= n
        if self.bits < 0:
            # final state flushes may zero-fill past the start
            self.overread -= self.bits
            pad = -self.bits
            self.bits = 0
            return (self.value & ((1 << n - pad) - 1)) << pad if n > pad else 0
        return (self.value >> self.bits) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _fse_read_distribution(buf: bytes, pos: int, max_sym: int) -> tuple[list[int], int, int]:
    """FSE table description (RFC §4.1.1): (counts, accuracy_log, next byte pos)."""
    br = _FwdBits(buf, pos)
    acc_log = br.read(4) + 5
    if acc_log > 9:
        raise ZstdError(f"FSE accuracy_log {acc_log} too large")
    remaining = (1 << acc_log) + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_sym:
            raise ZstdError("too many FSE symbols")
        nbits = remaining.bit_length()
        val = br.read(nbits - 1)
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        if val < threshold:
            pass  # nbits-1 bits suffice
        else:
            extra = br.read(1)
            val |= extra << (nbits - 1)
            if val > lower_mask:
                val -= threshold
        proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep < 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return counts, acc_log, br.byte_pos()


class _FseTable:
    __slots__ = ("symbol", "nbits", "base", "acc_log")

    def __init__(self, counts: list[int], acc_log: int):
        size = 1 << acc_log
        self.acc_log = acc_log
        self.symbol = [0] * size
        self.nbits = [0] * size
        self.base = [0] * size
        high = size - 1
        for s, p in enumerate(counts):
            if p == -1:
                self.symbol[high] = s
                high -= 1
        pos = 0
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        for s, p in enumerate(counts):
            if p <= 0:
                continue
            for _ in range(p):
                self.symbol[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spread did not terminate at 0")
        nxt = [p if p > 0 else 1 for p in counts]
        for i in range(size):
            s = self.symbol[i]
            x = nxt[s]
            nxt[s] += 1
            nb = acc_log - (x.bit_length() - 1)
            self.nbits[i] = nb
            self.base[i] = (x << nb) - size


class _FseState:
    def __init__(self, table: _FseTable, br: _BackBits):
        self.t = table
        self.state = br.read(table.acc_log)

    def symbol(self) -> int:
        return self.t.symbol[self.state]

    def update(self, br: _BackBits) -> None:
        self.state = self.t.base[self.state] + br.read(self.t.nbits[self.state])


def _fse_rle_table(symbol: int) -> _FseTable:
    t = _FseTable.__new__(_FseTable)
    t.acc_log = 0
    t.symbol = [symbol]
    t.nbits = [0]
    t.base = [0]
    return t


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HuffTable:
    __slots__ = ("symbols", "nbits", "max_bits")

    def __init__(self, weights: list[int]):
        # infer the final weight: explicit weights must leave a power-of-2 gap
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("empty Huffman weights")
        # the inferred last weight completes to the NEXT power of two
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left == 0 or left & (left - 1):
            raise ZstdError("Huffman weights do not complete a power of two")
        weights = weights + [left.bit_length()]
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbols = [0] * size
        self.nbits = [0] * size
        # canonical fill: ascending weight, then symbol order
        pos = 0
        for w in range(1, max_bits + 1):
            span = 1 << (w - 1)
            nb = max_bits + 1 - w
            for sym, sw in enumerate(weights):
                if sw == w:
                    for _ in range(span):
                        self.symbols[pos] = sym
                        self.nbits[pos] = nb
                        pos += 1
        if pos != size:
            raise ZstdError("Huffman table incomplete")

    def decode_stream(self, data: bytes, out_len: int) -> bytes:
        """Peek max_bits (zero-filled near the end), emit, consume the
        symbol's actual bit count; a valid stream lands exactly on 0."""
        if not data or data[-1] == 0:
            raise ZstdError("corrupted Huffman stream")
        value = int.from_bytes(data, "little")
        bits = (len(data) - 1) * 8 + data[-1].bit_length() - 1
        mb = self.max_bits
        mask = (1 << mb) - 1
        out = bytearray()
        while len(out) < out_len:
            if bits >= mb:
                idx = (value >> (bits - mb)) & mask
            else:
                idx = (value << (mb - bits)) & mask
            out.append(self.symbols[idx])
            bits -= self.nbits[idx]
            if bits < 0:
                raise ZstdError("Huffman stream over-consumed")
        if bits != 0:
            raise ZstdError("Huffman stream not fully consumed")
        return bytes(out)


def _read_huffman(buf: bytes, pos: int) -> tuple[_HuffTable, int]:
    header = buf[pos]
    pos += 1
    if header >= 128:
        n = header - 127
        weights = []
        for i in range(n):
            b = buf[pos + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += (n + 1) // 2
        return _HuffTable(weights), pos
    comp_size = header
    blob = buf[pos: pos + comp_size]
    counts, acc_log, after = _fse_read_distribution(blob, 0, 255)
    if acc_log > 6:
        raise ZstdError("Huffman weight FSE accuracy too large")
    table = _FseTable(counts, acc_log)
    stream = blob[after:]
    br = _BackBits(stream)
    s1 = _FseState(table, br)
    s2 = _FseState(table, br)
    weights: list[int] = []
    # RFC 4.2.1.2 / educational decoder: emit-then-update alternation;
    # when an update over-reads, the OTHER state's symbol is final
    while len(weights) <= 255:
        weights.append(s1.symbol())
        s1.update(br)
        if br.overread:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        s2.update(br)
        if br.overread:
            weights.append(s1.symbol())
            break
    else:
        raise ZstdError("too many Huffman weights")
    return _HuffTable(weights), pos + comp_size


# ---------------------------------------------------------------------------
# sequences: fixed code tables (RFC §3.1.1.3.2.1)
# ---------------------------------------------------------------------------

_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99,
                                 131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DEF_TABLE = _FseTable(_LL_DEFAULT, 6)
_ML_DEF_TABLE = _FseTable(_ML_DEFAULT, 6)
_OF_DEF_TABLE = _FseTable(_OF_DEFAULT, 5)

_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _FrameCtx:
    def __init__(self):
        self.huff: _HuffTable | None = None
        self.ll: _FseTable | None = None
        self.of: _FseTable | None = None
        self.ml: _FseTable | None = None
        self.reps = [1, 4, 8]


def _decode_literals(buf: bytes, pos: int, ctx: _FrameCtx) -> tuple[bytes, int]:
    b0 = buf[pos]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_fmt in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            regen = (b0 >> 4) | (buf[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (buf[pos + 1] << 4) | (buf[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            return bytes(buf[pos: pos + regen]), pos + regen
        return bytes([buf[pos]]) * regen, pos + 1
    # compressed (2) / treeless (3)
    if size_fmt == 0:
        regen = (b0 >> 4) | ((buf[pos + 1] & 0x3F) << 4)
        comp = (buf[pos + 1] >> 6) | (buf[pos + 2] << 2)
        pos += 3
        four = False
    elif size_fmt == 1:
        regen = (b0 >> 4) | ((buf[pos + 1] & 0x3F) << 4)
        comp = (buf[pos + 1] >> 6) | (buf[pos + 2] << 2)
        pos += 3
        four = True
    elif size_fmt == 2:
        regen = (b0 >> 4) | (buf[pos + 1] << 4) | ((buf[pos + 2] & 0x3) << 12)
        comp = (buf[pos + 2] >> 2) | (buf[pos + 3] << 6)
        pos += 4
        four = True
    else:
        regen = (b0 >> 4) | (buf[pos + 1] << 4) | ((buf[pos + 2] & 0x3F) << 12)
        comp = (buf[pos + 2] >> 6) | (buf[pos + 3] << 2) | (buf[pos + 4] << 10)
        pos += 5
        four = True
    end = pos + comp
    if ltype == 2:
        ctx.huff, pos = _read_huffman(buf, pos)
    elif ctx.huff is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table = ctx.huff
    payload = buf[pos:end]
    if not four:
        return table.decode_stream(payload, regen), end
    # 4 streams: 6-byte jump table
    s1 = int.from_bytes(payload[0:2], "little")
    s2 = int.from_bytes(payload[2:4], "little")
    s3 = int.from_bytes(payload[4:6], "little")
    body = payload[6:]
    sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
    if sizes[3] < 0:
        raise ZstdError("bad literals jump table")
    per = (regen + 3) // 4
    lens = [per, per, per, regen - 3 * per]
    out = bytearray()
    off = 0
    for sz, ln in zip(sizes, lens):
        out += table.decode_stream(body[off: off + sz], ln)
        off += sz
    return bytes(out), end


def _seq_table(buf: bytes, pos: int, mode: int, kind: str, ctx: _FrameCtx):
    prev = getattr(ctx, kind)
    if mode == 0:
        table = {"ll": _LL_DEF_TABLE, "of": _OF_DEF_TABLE, "ml": _ML_DEF_TABLE}[kind]
    elif mode == 1:
        table = _fse_rle_table(buf[pos])
        pos += 1
    elif mode == 2:
        counts, acc, after = _fse_read_distribution(buf, pos, _MAX_SYM[kind])
        limit = {"ll": 9, "of": 8, "ml": 9}[kind]
        if acc > limit:
            raise ZstdError(f"{kind} accuracy_log {acc} too large")
        table = _FseTable(counts, acc)
        pos = after
    else:
        if prev is None:
            raise ZstdError(f"repeat {kind} table with no previous table")
        table = prev
    setattr(ctx, kind, table)
    return table, pos


def _decode_block(buf: bytes, out: bytearray, ctx: _FrameCtx) -> None:
    lits, pos = _decode_literals(buf, 0, ctx)
    # sequences header
    b0 = buf[pos]
    pos += 1
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + buf[pos]
        pos += 1
    else:
        nseq = int.from_bytes(buf[pos: pos + 2], "little") + 0x7F00
        pos += 2
    modes = buf[pos]
    pos += 1
    ll_t, pos = _seq_table(buf, pos, (modes >> 6) & 3, "ll", ctx)
    of_t, pos = _seq_table(buf, pos, (modes >> 4) & 3, "of", ctx)
    ml_t, pos = _seq_table(buf, pos, (modes >> 2) & 3, "ml", ctx)
    br = _BackBits(buf[pos:])
    ll_s = _FseState(ll_t, br)
    of_s = _FseState(of_t, br)
    ml_s = _FseState(ml_t, br)
    lit_pos = 0
    reps = ctx.reps
    for i in range(nseq):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ZstdError("offset code too large")
        offset_val = (1 << of_code) + br.read(of_code)
        ml_code = ml_s.symbol()
        match_len = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol()
        lit_len = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        # repeat-offset resolution
        if offset_val > 3:
            offset = offset_val - 3
            reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_val + (1 if lit_len == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps = [offset, reps[0], reps[2]]
            elif idx == 3:
                offset = reps[2]
                reps = [offset, reps[0], reps[1]]
            else:  # idx == 4: rep1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("zero repeat offset")
                reps = [offset, reps[0], reps[1]]
        out += lits[lit_pos: lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("match offset beyond window")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start: start + match_len]
        else:
            for j in range(match_len):
                out.append(out[start + j])
        if i != nseq - 1:
            ll_s.update(br)
            ml_s.update(br)
            of_s.update(br)
    ctx.reps = reps
    out += lits[lit_pos:]


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    pos = 0
    out = bytearray()
    while pos < len(data):
        magic = int.from_bytes(data[pos: pos + 4], "little")
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            size = int.from_bytes(data[pos + 4: pos + 8], "little")
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ZstdError("not a zstd frame (bad magic)")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        dict_flag = fhd & 3
        if not single:
            pos += 1  # window descriptor (unused: we hold it all)
        if dict_flag:
            did_len = [0, 1, 2, 4][dict_flag]
            if int.from_bytes(data[pos: pos + did_len], "little") != 0:
                raise ZstdError("dictionaries are not supported")
            pos += did_len
        fcs_len = [1 if single else 0, 2, 4, 8][fcs_flag]
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[pos: pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        ctx = _FrameCtx()
        frame_start = len(out)
        while True:
            hdr = int.from_bytes(data[pos: pos + 3], "little")
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if btype == 0:  # raw
                out += data[pos: pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(data[pos: pos + bsize], out, ctx)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if last:
                break
        if checksum:
            from benthos_spark.bloblang.interp import _xxhash64

            got = int.from_bytes(data[pos: pos + 4], "little")
            pos += 4
            want = _xxhash64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ZstdError("content checksum mismatch")
        if fcs is not None and len(out) - frame_start != fcs:
            raise ZstdError("frame content size mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder (store mode: raw/RLE blocks)
# ---------------------------------------------------------------------------


def compress(data: bytes, level: int = 0) -> bytes:
    """Spec-valid zstd using raw/RLE blocks (level is accepted for API
    parity; entropy coding is not attempted)."""
    data = bytes(data)
    from benthos_spark.bloblang.interp import _xxhash64

    out = bytearray(_MAGIC.to_bytes(4, "little"))
    # single-segment + checksum + FCS (4-byte field => flag 2)
    out.append((2 << 6) | (1 << 5) | (1 << 2))
    out += len(data).to_bytes(4, "little")
    max_block = 128 * 1024
    blocks: list[tuple[int, bytes]] = []
    i = 0
    n = len(data)
    while i < n:
        # free RLE: extend a run if it covers the next chunk boundary
        run_byte = data[i]
        j = i
        while j < n and data[j] == run_byte and j - i < max_block:
            j += 1
        if j - i >= 32:
            blocks.append((1, data[i:j]))
            i = j
        else:
            end = min(i + max_block, n)
            blocks.append((0, data[i:end]))
            i = end
    if not blocks:
        blocks = [(0, b"")]
    for k, (btype, chunk) in enumerate(blocks):
        last = 1 if k == len(blocks) - 1 else 0
        hdr = (len(chunk) << 3) | (btype << 1) | last
        out += hdr.to_bytes(3, "little")
        out += bytes([chunk[0]]) if btype == 1 else chunk
    out += (_xxhash64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# real compressor: greedy LZ77 + FSE-coded sequences (predefined tables)
# ---------------------------------------------------------------------------


class _FwdBitWriter:
    """Forward bit accumulator for FSE/sequence bitstreams: values land
    LSB-first, so the backward reader (_BackBits) consumes them in
    reverse write order — exactly FSE's contract. ``close`` writes the
    1-bit sentinel and zero-pads to a byte boundary (RFC 8878 §4.1)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def add(self, v: int, nb: int) -> None:
        if nb == 0:
            return
        self.acc |= (v & ((1 << nb) - 1)) << self.n
        self.n += nb
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def close(self) -> bytes:
        self.add(1, 1)
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _FseEncTable:
    """FSE encoding tables from normalized counts — the exact mirror of
    ``_FseTable`` (same spread function), per the reference FSE
    construction: a state table keyed by cumulative symbol ranks and a
    per-symbol (deltaNbBits, deltaFindState) transform."""

    __slots__ = ("state_table", "delta_nb", "delta_fs", "acc_log")

    def __init__(self, counts: list[int], acc_log: int):
        size = 1 << acc_log
        dec = _FseTable(counts, acc_log)  # shares the spread exactly
        cumul = [0] * (len(counts) + 1)
        for s, c in enumerate(counts):
            cumul[s + 1] = cumul[s] + (1 if c == -1 else max(c, 0))
        self.state_table = [0] * size
        running = list(cumul[:-1])
        for u in range(size):
            s = dec.symbol[u]
            self.state_table[running[s]] = size + u
            running[s] += 1
        self.delta_nb = [0] * len(counts)
        self.delta_fs = [0] * len(counts)
        total = 0
        for s, c in enumerate(counts):
            if c == 0:
                self.delta_nb[s] = ((acc_log + 1) << 16) - size
                self.delta_fs[s] = 0
            elif c in (1, -1):
                self.delta_nb[s] = (acc_log << 16) - size
                self.delta_fs[s] = total - 1
                total += 1
            else:
                max_bits = acc_log - ((c - 1).bit_length() - 1)
                self.delta_nb[s] = (max_bits << 16) - (c << max_bits)
                self.delta_fs[s] = total - c
                total += c
        self.acc_log = acc_log


class _FseEncState:
    def __init__(self, t: _FseEncTable, first_sym: int):
        nb = (t.delta_nb[first_sym] + (1 << 15)) >> 16
        val = (nb << 16) - t.delta_nb[first_sym]
        self.value = t.state_table[(val >> nb) + t.delta_fs[first_sym]]
        self.t = t

    def encode(self, bw: _FwdBitWriter, sym: int) -> None:
        t = self.t
        nb = (self.value + t.delta_nb[sym]) >> 16
        bw.add(self.value, nb)
        self.value = t.state_table[(self.value >> nb) + t.delta_fs[sym]]

    def flush(self, bw: _FwdBitWriter) -> None:
        bw.add(self.value, self.t.acc_log)


_LL_ENC = _ML_ENC = _OF_ENC = None  # built lazily (import-time cost)


def _enc_tables():
    global _LL_ENC, _ML_ENC, _OF_ENC
    if _LL_ENC is None:
        _LL_ENC = _FseEncTable(_LL_DEFAULT, 6)
        _ML_ENC = _FseEncTable(_ML_DEFAULT, 6)
        _OF_ENC = _FseEncTable(_OF_DEFAULT, 5)
    return _LL_ENC, _ML_ENC, _OF_ENC


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    import bisect

    return bisect.bisect_right(_LL_BASE, v) - 1


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    import bisect

    return bisect.bisect_right(_ML_BASE, v) - 1


def _find_sequences(data: bytes, start: int, end: int, table: dict):
    """Greedy hash-table matcher over data[start:end]; earlier-frame
    history is reachable (offsets may cross block boundaries, as the
    format allows). Returns (sequences, literal bytes) where each
    sequence is (lit_len, offset, match_len)."""
    seqs = []
    lits = bytearray()
    i = start
    anchor = start
    n = end
    total = len(data)
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None:
            m = 4
            limit = n - i
            while m < limit and data[j + m] == data[i + m]:
                m += 1
            if data[j : j + 4] == key:
                lits += data[anchor:i]
                seqs.append((i - anchor, i - j, m))
                # index a couple of positions inside the match so long
                # runs stay discoverable without O(n*m) inserts
                if i + 1 + 4 <= total:
                    table[data[i + 1 : i + 5]] = i + 1
                mid = i + m - 2
                if mid > i and mid + 4 <= total:
                    table[data[mid : mid + 4]] = mid
                i += m
                anchor = i
                continue
        i += 1
    lits += data[anchor:n]
    return seqs, bytes(lits)


def _literals_header(n: int) -> bytes:
    if n < 32:
        return bytes([(n << 3) | 0])
    if n < 4096:
        return bytes([((n & 0xF) << 4) | (1 << 2), n >> 4])
    return bytes([((n & 0xF) << 4) | (3 << 2), (n >> 4) & 0xFF, n >> 12])


def _encode_sequences(seqs: list) -> bytes:
    ll_t, ml_t, of_t = _enc_tables()
    nseq = len(seqs)
    out = bytearray()
    if nseq < 128:
        out.append(nseq)
    elif nseq < 0x7F00:
        out.append(0x80 | (nseq >> 8))
        out.append(nseq & 0xFF)
    else:
        out.append(0xFF)
        out += (nseq - 0x7F00).to_bytes(2, "little")
    out.append(0x00)  # all three tables: Predefined_Mode
    codes = []
    for ll, off, ml in seqs:
        off_base = off + 3  # never a repcode
        ofc = off_base.bit_length() - 1
        codes.append(
            (
                _ll_code(ll),
                ll,
                ofc,
                off_base - (1 << ofc),
                _ml_code(ml),
                ml,
            )
        )
    bw = _FwdBitWriter()
    llc, ll, ofc, ofx, mlc, ml = codes[-1]
    ll_s = _FseEncState(ll_t, llc)
    of_s = _FseEncState(of_t, ofc)
    ml_s = _FseEncState(ml_t, mlc)
    bw.add(ll - _LL_BASE[llc], _LL_BITS[llc])
    bw.add(ml - _ML_BASE[mlc], _ML_BITS[mlc])
    bw.add(ofx, ofc)
    for k in range(nseq - 2, -1, -1):
        llc, ll, ofc, ofx, mlc, ml = codes[k]
        of_s.encode(bw, ofc)
        ml_s.encode(bw, mlc)
        ll_s.encode(bw, llc)
        bw.add(ll - _LL_BASE[llc], _LL_BITS[llc])
        bw.add(ml - _ML_BASE[mlc], _ML_BITS[mlc])
        bw.add(ofx, ofc)
    ml_s.flush(bw)
    of_s.flush(bw)
    ll_s.flush(bw)
    return bytes(out) + bw.close()


def compress_lz(data: bytes) -> bytes:
    """REAL zstd compression: greedy LZ77 matches, raw-literal
    sections, and FSE-coded sequences over the RFC's predefined
    distributions (Predefined_Mode for all three codes, offsets always
    explicit — no repcodes). Frames decompress with both this module's
    decoder and the real zstd (cross-validated against zstd-jni in
    tests/test_zstd.py)."""
    data = bytes(data)
    from benthos_spark.bloblang.interp import _xxhash64

    out = bytearray(_MAGIC.to_bytes(4, "little"))
    out.append((2 << 6) | (1 << 5) | (1 << 2))  # single-segment, checksum, 4B FCS
    out += len(data).to_bytes(4, "little")
    max_block = 128 * 1024
    n = len(data)
    bounds = list(range(0, n, max_block)) or [0]
    table: dict = {}
    for bi, start in enumerate(bounds):
        end = min(start + max_block, n)
        last = 1 if end >= n else 0
        seqs, lits = _find_sequences(data, start, end, table)
        if not seqs:
            hdr = ((end - start) << 3) | (0 << 1) | last  # raw block
            out += hdr.to_bytes(3, "little")
            out += data[start:end]
            continue
        body = _literals_header(len(lits)) + lits + _encode_sequences(seqs)
        if len(body) >= end - start:
            hdr = ((end - start) << 3) | (0 << 1) | last  # didn't shrink: raw
            out += hdr.to_bytes(3, "little")
            out += data[start:end]
            continue
        hdr = (len(body) << 3) | (2 << 1) | last  # compressed block
        out += hdr.to_bytes(3, "little")
        out += body
    out += (_xxhash64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
