"""From-scratch WebP **VP8L** (lossless) codec — decoder + encoder.

Implements the public "WebP Lossless Bitstream Specification" (Google;
container per the "WebP Container Specification"): RIFF/WEBP container,
VP8L bitstream — canonical-Huffman entropy images with meta-Huffman
groups, color cache, LZ77 backward references with the 120-code 2D
distance map, and all four inverse transforms (predictor /
color-transform / subtract-green / color-indexing with sub-byte pixel
packing). ``decode_alpha`` handles the headerless VP8L variant used by
ALPH (alpha-plane) chunks of lossy files, including the WebP alpha
prediction filters.

The encoder emits a deliberately simple, spec-valid stream: no
transforms, no color cache, one Huffman group whose literal codes are
the complete 256x8-bit canonical code (written via a 2-symbol
code-length code plus the max_symbol cap). Compression is not the
point; emitting bitstreams any conforming decoder reads back exactly
is.

Validation (tests/test_webp.py):
- round-trip exactness over random and structured RGB/RGBA images;
- a REAL libwebp-encoded stream: the ALPH chunk of CPython's
  ``test/imghdrdata/python.webp`` (PSF-distributed test asset) decodes
  through the full Huffman/LZ77/color-cache path — any bit misread
  desyncs immediately;
- spec vectors for the LZ77 prefix coding and the distance map
  (the map is GENERATED from the spec's construction — the 120 closest
  (dx, dy) neighbors, dy 0..7 / dx -7..8, ordered by squared distance
  then |dx| then sign — and pinned against known code assignments).

Reference parity: the reference routes image payloads through
codec-agnostic processors; this gives its ``webp`` surface a real
offline kernel (functions/multimodal.py codec="webp"), same pattern as
functions/png.py / gif.py / jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit IO (VP8L is LSB-first within bytes)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.d
        for i in range(n):
            byte = p >> 3
            if byte >= len(d):
                raise WebpError("bitstream truncated")
            v |= ((d[byte] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return v

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.d):
            raise WebpError("bitstream truncated")
        self.pos = p + 1
        return (self.d[byte] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        """n bits of v, LSB first."""
        for i in range(n):
            if self.bit == 0:
                self.bytes.append(0)
            if (v >> i) & 1:
                self.bytes[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """A canonical Huffman code, MSB of the code first (the order a
        tree-walking decoder consumes)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


class _Huffman:
    """Canonical Huffman decoder built from per-symbol code lengths. A
    single used symbol decodes with ZERO bits consumed (spec/libwebp
    behavior)."""

    __slots__ = ("single", "tree")

    def __init__(self, lengths):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise WebpError("huffman code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.tree = None
            return
        self.single = None
        used.sort()  # canonical: by (length, symbol)
        code = 0
        prev_len = used[0][0]
        tree: dict = {}
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            node = tree
            for i in range(ln - 1, 0, -1):
                b = (code >> i) & 1
                nxt = node.get(b)
                if not isinstance(nxt, dict):
                    nxt = {}
                    node[b] = nxt
                node = nxt
            node[code & 1] = -1 - sym  # leaf
            code += 1
        if code != (1 << prev_len):
            raise WebpError("huffman code lengths are not complete")
        self.tree = tree

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        node = self.tree
        while True:
            nxt = node.get(br.read_bit())
            if nxt is None:
                raise WebpError("invalid huffman code")
            if isinstance(nxt, int):
                return -1 - nxt
            node = nxt


_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read_bit() + 1
        first = br.read(8) if br.read_bit() else br.read(1)
        lengths = [0] * alphabet_size
        syms = [first]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise WebpError("simple-code symbol out of range")
            lengths[s] = 1
        return _Huffman(lengths)
    # normal: a code-length code over 19 symbols in the special order
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_huff = _Huffman(cl_lengths)
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_code_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_huff.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_code_len = code_len
        elif code_len == 16:
            repeat = 3 + br.read(2)
            if symbol + repeat > alphabet_size:
                raise WebpError("code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = prev_code_len
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise WebpError("code length run overflows alphabet")
    return _Huffman(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values and the 2D distance map
# ---------------------------------------------------------------------------


def _prefix_decode(code: int, br: _BitReader) -> int:
    """Length/distance prefix coding: codes 0..3 mean 1..4; beyond that
    each code pair doubles the range with (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _build_distance_map():
    """The spec's close-neighborhood table, generated from its
    construction rule: the 120 pixels with dy in 0..7, dx in -7..8
    (dy=0 rows only dx>0), ordered by squared euclidean distance, then
    |dx|, then positive-dx-first. Pinned in tests against known code
    assignments ((0,1)=1, (1,0)=2, (-1,1)=4, (5,0)=40, (8,0)=97, ...)."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cands) == 120
    return tuple(cands)


_DIST_MAP = _build_distance_map()


def _plane_code_to_distance(xsize: int, code: int) -> int:
    """Distance symbols 1..120 are neighborhood codes; >120 is the
    literal distance minus 120. Results clamp to >= 1."""
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


# ---------------------------------------------------------------------------
# entropy-coded image decode (the core shared by everything)
# ---------------------------------------------------------------------------

_GREEN_EXTRA = 24  # length prefix codes appended to the green alphabet
_ALPHABET = (256 + _GREEN_EXTRA, 256, 256, 256, 40)  # + cache at [0]


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _read_huffman_groups(br: _BitReader, n_groups: int, cache_size: int):
    groups = []
    for _ in range(n_groups):
        codes = []
        for i, base in enumerate(_ALPHABET):
            size = base + (cache_size if i == 0 else 0)
            codes.append(_read_huffman_code(br, size))
        groups.append(codes)
    return groups


def _decode_entropy_image(
    br: _BitReader, xsize: int, ysize: int, spatially_coded: bool
) -> np.ndarray:
    """Decode one entropy-coded ARGB image to a uint32 array of
    0xAARRGGBB values (flat, row-major). ``spatially_coded`` images (the
    top level and the alpha plane) may carry meta-Huffman groups;
    auxiliary sub-images (transform data, palettes) may not."""
    cache_size = 0
    cache = None
    if br.read_bit():  # color cache present
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"invalid color cache bits {cache_bits}")
        cache_size = 1 << cache_bits
        cache = np.zeros(cache_size, dtype=np.uint32)
    meta = None
    huffman_bits = 0
    n_groups = 1
    if spatially_coded and br.read_bit():  # meta huffman codes
        huffman_bits = 2 + br.read(3)
        mw, mh = _div_round_up(xsize, huffman_bits), _div_round_up(ysize, huffman_bits)
        meta_img = _decode_entropy_image(br, mw, mh, False)
        # group index = (red << 8) | green of the meta pixel
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1 if meta.size else 1
    groups = _read_huffman_groups(br, n_groups, cache_size)

    n = xsize * ysize
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    cur_tile = -1
    mw = _div_round_up(xsize, huffman_bits) if meta is not None else 0

    def insert_cache(argb: int) -> None:
        cache[(np.uint32(argb) * np.uint32(0x1E35A7BD)) >> np.uint32(32 - cache_bits)] = argb

    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            tile = (y >> huffman_bits) * mw + (x >> huffman_bits)
            if tile != cur_tile:
                cur_tile = tile
                g_green, g_red, g_blue, g_alpha, g_dist = groups[int(meta[tile])]
        s = g_green.read(br)
        if s < 256:  # literal
            red = g_red.read(br)
            blue = g_blue.read(br)
            alpha = g_alpha.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            pos += 1
            if cache is not None:
                insert_cache(argb)
        elif s < 256 + _GREEN_EXTRA:  # LZ77 backward reference
            length = _prefix_decode(s - 256, br)
            dist_code = _prefix_decode(g_dist.read(br), br)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise WebpError("backward reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                pos += 1
                if cache is not None:
                    insert_cache(argb)
            cur_tile = -1  # re-resolve the tile after a copy
        else:  # color cache lookup
            if cache is None:
                raise WebpError("cache symbol without a color cache")
            idx = s - 256 - _GREEN_EXTRA
            if idx >= cache_size:
                raise WebpError("color cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _channels(img: np.ndarray):
    a = (img >> 24) & 0xFF
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    return a, r, g, b


def _pack(a, r, g, b) -> np.ndarray:
    return (
        (a.astype(np.uint32) << 24)
        | ((r.astype(np.uint32) & 0xFF) << 16)
        | ((g.astype(np.uint32) & 0xFF) << 8)
        | (b.astype(np.uint32) & 0xFF)
    )


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _channels(img)
    return _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inv_color_transform(img, xsize, ysize, bits, tiles) -> np.ndarray:
    """Inverse cross-color transform: per-tile signed multipliers
    green_to_red (blue channel of the tile pixel), green_to_blue
    (green channel), red_to_blue (red channel); delta(t, c) =
    (int8(t) * int8(c)) >> 5."""
    out = img.reshape(ysize, xsize).copy()
    tw = _div_round_up(xsize, bits)
    t = tiles.reshape(-1, tw)

    def s8(v):
        v = v.astype(np.int32) & 0xFF
        return np.where(v >= 128, v - 256, v)

    for y in range(ysize):
        trow = t[y >> bits]
        tx = np.arange(xsize) >> bits
        g2r = s8((trow[tx] >> 0) & 0xFF)
        g2b = s8((trow[tx] >> 8) & 0xFF)
        r2b = s8((trow[tx] >> 16) & 0xFF)
        row = out[y]
        a, r, g, b = _channels(row)
        g_s = s8(g)
        r = (r + ((g2r * g_s) >> 5)) & 0xFF
        r_s = s8(r)
        b = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
        out[y] = _pack(a, r, g, b)
    return out.reshape(-1)


def _avg2(x, y):
    return (x + y) // 2


def _clamp_add_subtract_full(c1, c2, c3):
    return np.clip(c1 + c2 - c3, 0, 255)


def _clamp_add_subtract_half(c1, c2):
    t = c1 + (c1 - c2) // 2 if False else None  # unused guard
    raise AssertionError


def _inv_predictor(img, xsize, ysize, bits, tiles) -> np.ndarray:
    """Inverse spatial prediction: residuals add (mod 256, per channel)
    to a per-tile-selected predictor of already-reconstructed
    neighbors. Row-sequential by necessity (each pixel depends on
    reconstructed left/top)."""
    out = img.reshape(ysize, xsize)
    tw = _div_round_up(xsize, bits)
    tiles2 = tiles.reshape(-1, tw)

    def ch(v):
        return np.array(
            [(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
            dtype=np.int64,
        )

    def pk(c):
        return (
            (np.uint32(int(c[0]) & 0xFF) << np.uint32(24))
            | (np.uint32(int(c[1]) & 0xFF) << np.uint32(16))
            | (np.uint32(int(c[2]) & 0xFF) << np.uint32(8))
            | np.uint32(int(c[3]) & 0xFF)
        )

    for y in range(ysize):
        mrow = tiles2[y >> bits]
        for x in range(xsize):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = ch(int(out[0, x - 1]))  # L
            elif x == 0:
                pred = ch(int(out[y - 1, 0]))  # T
            else:
                mode = (int(mrow[x >> bits]) >> 8) & 0xFF
                L = ch(int(out[y, x - 1]))
                T = ch(int(out[y - 1, x]))
                TL = ch(int(out[y - 1, x - 1]))
                TR = ch(int(out[y - 1, x + 1])) if x + 1 < xsize else ch(int(out[y - 1, 0]))
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = _clamp_add_subtract_full(L, T, TL)
                elif mode == 13:  # ClampAddSubtractHalf
                    ave = _avg2(L, T)
                    pred = np.clip(ave + (ave - TL) // 2, 0, 255)
                else:
                    raise WebpError(f"invalid predictor mode {mode}")
            res = ch(int(out[y, x]))
            out[y, x] = pk((res + pred) & 0xFF)
    return out.reshape(-1)


def _inv_color_indexing(img, xsize_packed, ysize, xsize, palette) -> np.ndarray:
    """Palette lookup (+ sub-byte unpacking when the palette is small):
    indices live in the GREEN channel; out-of-range indices decode as
    transparent black per libwebp."""
    npal = len(palette)
    if npal <= 2:
        width_bits = 3
    elif npal <= 4:
        width_bits = 2
    elif npal <= 16:
        width_bits = 1
    else:
        width_bits = 0
    packed = img.reshape(ysize, xsize_packed)
    if width_bits == 0:
        idx = (packed >> 8) & 0xFF
    else:
        per = 1 << width_bits  # pixels per packed green byte
        bitd = 8 >> width_bits  # bits per index
        green = ((packed >> 8) & 0xFF).astype(np.uint32)
        cols = []
        for k in range(per):
            cols.append((green >> (k * bitd)) & ((1 << bitd) - 1))
        idx = np.stack(cols, axis=-1).reshape(ysize, -1)[:, :xsize]
    lut = np.zeros(256, dtype=np.uint32)
    lut[:npal] = palette
    return lut[np.minimum(idx, 255).astype(np.int64)].reshape(-1)


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def _decode_vp8l_stream(data: bytes):
    """VP8L chunk payload → (argb uint32 flat, xsize, ysize, has_alpha)."""
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise WebpError("bad VP8L signature")
    xsize = br.read(14) + 1
    ysize = br.read(14) + 1
    has_alpha = bool(br.read_bit())
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")
    img = _decode_argb(br, xsize, ysize)
    return img, xsize, ysize, has_alpha


def _decode_argb(br: _BitReader, xsize: int, ysize: int) -> np.ndarray:
    """Transforms + spatially-coded entropy image (the spec's
    'decode_image_stream' at level 0)."""
    transforms = []  # applied inverse in reverse read order
    seen = set()
    cur_xsize = xsize
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            tw, th = _div_round_up(cur_xsize, bits), _div_round_up(ysize, bits)
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(("predictor", bits, tiles))
        elif ttype == 1:  # color transform
            bits = 2 + br.read(3)
            tw, th = _div_round_up(cur_xsize, bits), _div_round_up(ysize, bits)
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            npal = br.read(8) + 1
            pal = _decode_entropy_image(br, npal, 1, False)
            # palette entries are delta-coded component-wise
            pa, pr, pg, pb = _channels(pal)
            pa, pr = np.cumsum(pa) & 0xFF, np.cumsum(pr) & 0xFF
            pg, pb = np.cumsum(pg) & 0xFF, np.cumsum(pb) & 0xFF
            palette = _pack(pa, pr, pg, pb)
            if npal <= 2:
                shift = 3
            elif npal <= 4:
                shift = 2
            elif npal <= 16:
                shift = 1
            else:
                shift = 0
            packed_xsize = _div_round_up(cur_xsize, shift) if shift else cur_xsize
            transforms.append(("palette", cur_xsize, palette))
            cur_xsize = packed_xsize
    img = _decode_entropy_image(br, cur_xsize, ysize, True)
    for t in reversed(transforms):
        if t[0] == "palette":
            full_xsize, palette = t[1], t[2]
            img = _inv_color_indexing(img, cur_xsize, ysize, full_xsize, palette)
            cur_xsize = full_xsize
        elif t[0] == "subtract_green":
            img = _inv_subtract_green(img)
        elif t[0] == "color":
            img = _inv_color_transform(img, cur_xsize, ysize, t[1], t[2])
        elif t[0] == "predictor":
            img = _inv_predictor(img, cur_xsize, ysize, t[1], t[2])
    return img


def _riff_chunks(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise WebpError("not a WebP (RIFF/WEBP) file")
    i = 12
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        n = struct.unpack("<I", b[i + 4 : i + 8])[0]
        yield tag, b[i + 8 : i + 8 + n]
        i += 8 + n + (n & 1)


def decode(b: bytes) -> np.ndarray:
    """WebP bytes → (H, W, 3|4) uint8 array. Lossless (VP8L) files
    only — VP8 lossy needs a full VP8 intra decoder and stays gated."""
    payload = None
    for tag, data in _riff_chunks(bytes(b)):
        if tag == b"VP8L":
            payload = data
            break
        if tag == b"VP8 ":
            raise WebpError("lossy VP8 webp not supported (VP8L lossless only)")
    if payload is None:
        raise WebpError("no VP8L chunk found")
    img, xsize, ysize, has_alpha = _decode_vp8l_stream(payload)
    a, r, g, bl = _channels(img.reshape(ysize, xsize))
    rgb = np.stack([r, g, bl], axis=-1).astype(np.uint8)
    if has_alpha:
        return np.concatenate([rgb, a.astype(np.uint8)[..., None]], axis=-1)
    return rgb


def decode_alpha(data: bytes, width: int, height: int) -> np.ndarray:
    """ALPH chunk payload of a lossy WebP → (H, W) uint8 alpha plane.
    Per the container spec: 1 header byte (2 reserved, 2 preprocessing,
    2 filtering, 2 compression bits); compression 1 = the VP8L
    bitstream WITHOUT the size/signature header, alpha in the GREEN
    channel; then one of 4 prediction filters un-applies."""
    head = data[0]
    compression = head & 0x3
    filtering = (head >> 2) & 0x3
    if compression == 0:
        plane = np.frombuffer(data[1 : 1 + width * height], dtype=np.uint8).astype(
            np.int64
        )
        plane = plane.reshape(height, width).copy()
    elif compression == 1:
        br = _BitReader(data[1:])
        img = _decode_argb(br, width, height)
        plane = ((img >> 8) & 0xFF).reshape(height, width).astype(np.int64)
    else:
        raise WebpError(f"alpha compression {compression} invalid")
    if filtering:
        for y in range(height):
            for x in range(width):
                if x == 0 and y == 0:
                    pred = 0
                elif filtering == 1:  # horizontal
                    pred = plane[y, x - 1] if x else plane[y - 1, 0]
                elif filtering == 2:  # vertical
                    pred = plane[y - 1, x] if y else plane[0, x - 1]
                else:  # gradient
                    if y == 0:
                        pred = plane[0, x - 1]
                    elif x == 0:
                        pred = plane[y - 1, 0]
                    else:
                        pred = int(
                            np.clip(
                                plane[y, x - 1] + plane[y - 1, x] - plane[y - 1, x - 1],
                                0,
                                255,
                            )
                        )
                plane[y, x] = (plane[y, x] + pred) & 0xFF
    return plane.astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (simple spec-valid stream: literal 8-bit codes, no transforms)
# ---------------------------------------------------------------------------


def _write_literal_code(bw: _BitWriter) -> None:
    """A complete 256x8-bit canonical code via a normal code: the
    code-length code uses two 1-bit symbols {0, 8}, then max_symbol
    caps the alphabet at 256 (the rest are zero-length)."""
    bw.write(0, 1)  # not simple
    # code-length order prefix: positions 0..11 cover 17,18,0,1,2,3,4,5,16,6,7,8
    bw.write(12 - 4, 4)  # num_code_lengths = 12
    for sym in _CODE_LENGTH_ORDER[:12]:
        bw.write(1 if sym in (0, 8) else 0, 3)
    # canonical over {0, 8} at length 1: '0'->0, '8'->1
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(256 - 2, 8)  # max_symbol = 256
    for _ in range(256):
        bw.write(1, 1)  # symbol '8' 256 times
    # symbols 256.. get length 0 via the max_symbol cap


def _write_single_symbol_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def _write_plain_image(bw: _BitWriter, argb: np.ndarray, spatially_coded: bool) -> None:
    """Emit one entropy-coded image of literal pixels (no cache, no
    meta, no backrefs) — also used to write transform sub-images."""
    bw.write(0, 1)  # no color cache
    if spatially_coded:
        bw.write(0, 1)  # no meta huffman codes
    _write_literal_code(bw)  # green
    _write_literal_code(bw)  # red
    _write_literal_code(bw)  # blue
    _write_literal_code(bw)  # alpha
    _write_single_symbol_code(bw, 0)  # distance (never used)
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    for i in range(len(argb)):
        # all-length-8 canonical codes: code value == symbol, MSB first
        bw.write_code(int(g[i]), 8)
        bw.write_code(int(r[i]), 8)
        bw.write_code(int(b[i]), 8)
        bw.write_code(int(a[i]), 8)


def _wrap_vp8l(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode(arr: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 → lossless WebP bytes (VP8L literal stream)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if w > 1 << 14 or h > 1 << 14:
        raise WebpError("image too large for VP8L (16384 max per side)")
    if c == 1:
        arr = np.repeat(arr, 3, axis=2)
        c = 3
    if c not in (3, 4):
        raise WebpError(f"{c}-channel images unsupported")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if c == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    a = (
        arr[:, :, 3].reshape(-1).astype(np.uint32)
        if c == 4
        else np.full(h * w, 255, dtype=np.uint32)
    )
    argb = (
        (a << 24)
        | (arr[:, :, 0].reshape(-1).astype(np.uint32) << 16)
        | (arr[:, :, 1].reshape(-1).astype(np.uint32) << 8)
        | arr[:, :, 2].reshape(-1).astype(np.uint32)
    )
    _write_plain_image(bw, argb, spatially_coded=True)
    return _wrap_vp8l(bw.getvalue())
