"""Pure-python Argon2 (RFC 9106) — argon2d / argon2i / argon2id.

Backs the Bloblang ``compare_argon2`` method
(/root/reference/internal/impl/crypto/argon2.go:110) without the
argon2-cffi package. From-scratch per the public RFC:

- H0 and the variable-length H' are built on hashlib.blake2b;
- the compression function G uses the BlaMka permutation
  (a + b + 2·lo32(a)·lo32(b)), numpy-vectorized across the 8
  independent quartets × 8 rows of the 1 KiB block (uint64 wraparound
  is the spec's mod 2^64);
- data-dependent and data-independent (G²-counter) indexing per §3.4,
  argon2id switching at pass 0 / slice 2.

Verified against the RFC 9106 §5 test vectors (argon2d/i/id, m=32,
t=3, p=4, with secret+AD) and the reference's doc example
($argon2id$v=19$m=4096,t=3,p=1$…). A verifier for pipeline password
columns — not a KDF service (no constant-time guarantees needed for
comparing stored hashes we already possess).
"""

from __future__ import annotations

import base64
import hashlib
import hmac

import numpy as np

_LO = np.uint64(0xFFFFFFFF)
_V = 0x13  # version 19

# row-step quartet indices (classic blake2 column+diagonal schedule over
# v0..v15), applied to each 16-word row of the 8x16 block matrix
_QUART = [
    ([0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]),
    ([0, 1, 2, 3], [5, 6, 7, 4], [10, 11, 8, 9], [15, 12, 13, 14]),
]

# column view: COLIDX[j] = the 16 flat word indices of column-group j
_COLIDX = np.array(
    [[16 * i + 2 * j + k for i in range(8) for k in (0, 1)] for j in range(8)],
    dtype=np.int64,
)


def _ror(x: np.ndarray, n: int) -> np.ndarray:
    n = np.uint64(n)
    return (x >> n) | (x << (np.uint64(64) - n))


def _g_quartet(v: np.ndarray, ia, ib, ic, id_) -> None:
    a, b, c, d = v[:, ia], v[:, ib], v[:, ic], v[:, id_]
    a = a + b + np.uint64(2) * (a & _LO) * (b & _LO)
    d = _ror(d ^ a, 32)
    c = c + d + np.uint64(2) * (c & _LO) * (d & _LO)
    b = _ror(b ^ c, 24)
    a = a + b + np.uint64(2) * (a & _LO) * (b & _LO)
    d = _ror(d ^ a, 16)
    c = c + d + np.uint64(2) * (c & _LO) * (d & _LO)
    b = _ror(b ^ c, 63)
    v[:, ia], v[:, ib], v[:, ic], v[:, id_] = a, b, c, d


def _permute(v: np.ndarray) -> None:
    """P over each 16-word row of an (8, 16) matrix, vectorized across
    the 8 rows (they are independent)."""
    for ia, ib, ic, id_ in _QUART:
        _g_quartet(v, ia, ib, ic, id_)


def _g_block(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Compression G: 128-word uint64 arrays → 128-word array."""
    r = x ^ y
    w = r.reshape(8, 16).copy()
    _permute(w)  # row-wise
    flat = w.reshape(128)
    cols = flat[_COLIDX].copy()  # (8 column-groups, 16 words)
    _permute(cols)
    out = np.empty(128, dtype=np.uint64)
    out[_COLIDX.reshape(-1)] = cols.reshape(-1)
    return out ^ r


def _h_prime(taglen: int, data: bytes) -> bytes:
    head = taglen.to_bytes(4, "little") + data
    if taglen <= 64:
        return hashlib.blake2b(head, digest_size=taglen).digest()
    out = bytearray()
    v = hashlib.blake2b(head, digest_size=64).digest()
    out += v[:32]
    remaining = taglen - 32
    while remaining > 64:
        v = hashlib.blake2b(v, digest_size=64).digest()
        out += v[:32]
        remaining -= 32
    out += hashlib.blake2b(v, digest_size=remaining).digest()
    return bytes(out)


def _block_from_bytes(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<u8").copy()


def _block_to_bytes(a: np.ndarray) -> bytes:
    return a.astype("<u8").tobytes()


def argon2(
    password: bytes,
    salt: bytes,
    t: int,
    m: int,
    p: int,
    taglen: int,
    kind: str = "id",
    secret: bytes = b"",
    ad: bytes = b"",
) -> bytes:
    y = {"d": 0, "i": 1, "id": 2}[kind]
    h = hashlib.blake2b(digest_size=64)
    for n in (p, taglen, m, t, _V, y):
        h.update(n.to_bytes(4, "little"))
    for blob in (password, salt, secret, ad):
        h.update(len(blob).to_bytes(4, "little"))
        h.update(blob)
    h0 = h.digest()

    m_prime = 4 * p * (m // (4 * p))
    q = m_prime // p  # columns per lane
    seg = q // 4  # slice length
    B = np.zeros((p, q, 128), dtype=np.uint64)
    for lane in range(p):
        B[lane][0] = _block_from_bytes(
            _h_prime(1024, h0 + (0).to_bytes(4, "little") + lane.to_bytes(4, "little"))
        )
        B[lane][1] = _block_from_bytes(
            _h_prime(1024, h0 + (1).to_bytes(4, "little") + lane.to_bytes(4, "little"))
        )

    zero = np.zeros(128, dtype=np.uint64)

    for rnd in range(t):
        for sl in range(4):
            di = (y == 1) or (y == 2 and rnd == 0 and sl < 2)
            for lane in range(p):
                # data-independent J stream for this segment: indexed by
                # the ABSOLUTE position in the segment (the two pre-filled
                # blocks of pass 0 / slice 0 still consume stream slots)
                addresses = None
                addr_block_no = -1
                start = 2 if rnd == 0 and sl == 0 else 0
                for idx in range(start, seg):
                    j = sl * seg + idx  # column in lane
                    prev = B[lane][(j - 1) % q]
                    if di:
                        if idx // 128 != addr_block_no:
                            addr_block_no = idx // 128
                            z = np.zeros(128, dtype=np.uint64)
                            for wi, val in enumerate(
                                (rnd, lane, sl, m_prime, t, y, addr_block_no + 1)
                            ):
                                z[wi] = val
                            addresses = _g_block(zero, _g_block(zero, z))
                        jword = int(addresses[idx % 128])
                    else:
                        jword = int(prev[0])
                    j1 = jword & 0xFFFFFFFF
                    j2 = (jword >> 32) & 0xFFFFFFFF

                    if rnd == 0 and sl == 0:
                        ref_lane = lane
                    else:
                        ref_lane = j2 % p
                    # reference set size |W| (RFC 9106 §3.4.1.2)
                    if rnd == 0:
                        if sl == 0 or ref_lane == lane:
                            w_size = j - 1  # up to prev block in this lane
                        else:
                            w_size = sl * seg - (1 if idx == 0 else 0)
                    else:
                        if ref_lane == lane:
                            w_size = q - seg + idx - 1
                        else:
                            w_size = q - seg - (1 if idx == 0 else 0)
                    # φ mapping: x = J1²/2³²; zz = |W|-1 - (|W|·x)/2³²
                    x = (j1 * j1) >> 32
                    yv = (w_size * x) >> 32
                    zz = w_size - 1 - yv
                    if rnd == 0:
                        ref_index = zz
                    else:
                        start_pos = (sl + 1) * seg % q
                        ref_index = (start_pos + zz) % q
                    new = _g_block(prev, B[ref_lane][ref_index])
                    if rnd > 0:
                        new ^= B[lane][j]
                    B[lane][j] = new

    final = B[0][q - 1].copy()
    for lane in range(1, p):
        final ^= B[lane][q - 1]
    return _h_prime(taglen, _block_to_bytes(final))


# -- PHC string verification -------------------------------------------------


def _b64d(s: str) -> bytes:
    return base64.b64decode(s + "=" * (-len(s) % 4))


def compare(password: bytes | str, phc: str) -> bool:
    """Verify against a PHC-format hash ($argon2id$v=19$m=..,t=..,p=..$
    salt$tag) — mirrors argon2.VerifyEncoded."""
    if isinstance(password, str):
        password = password.encode()
    parts = phc.split("$")
    if len(parts) != 6 or not parts[1].startswith("argon2"):
        raise ValueError(f"malformed argon2 hash {phc!r}")
    kind = parts[1][len("argon2"):]
    if kind not in ("d", "i", "id"):
        raise ValueError(f"unknown argon2 variant {parts[1]!r}")
    if parts[2] != "v=19":
        raise ValueError(f"unsupported argon2 version {parts[2]!r}")
    params = dict(kv.split("=") for kv in parts[3].split(","))
    salt = _b64d(parts[4])
    tag = _b64d(parts[5])
    got = argon2(
        password, salt,
        t=int(params["t"]), m=int(params["m"]), p=int(params["p"]),
        taglen=len(tag), kind=kind,
    )
    return hmac.compare_digest(got, tag)
