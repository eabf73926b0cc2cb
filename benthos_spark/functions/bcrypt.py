"""Pure-python bcrypt verification (OpenBSD Eksblowfish).

Backs the Bloblang ``compare_bcrypt`` method
(/root/reference/internal/impl/crypto/bcrypt.go:26) without the
`bcrypt` package. From-scratch per the public algorithm (Provos &
Mazières, "A Future-Adaptable Password Scheme"):

- Blowfish P-array/S-boxes are the fractional hexadecimal digits of π —
  generated here with the `decimal` module instead of embedding the
  1042 constants;
- EksBlowfishSetup(cost, salt, key): ExpandKey with salt, then 2^cost
  alternating keyed ExpandKeys;
- the 192-bit magic "OrpheanBeholderScryDoubt" is ECB-encrypted 64
  times; output is $2a/$2b/$2y$cost$ + crypt-base64(salt16) +
  crypt-base64(ct[:23]).

Verified against the published OpenWall/OpenBSD test vectors and the
reference's own doc example (cost 10). This is a VERIFIER for data
pipelines (filtering/validation of password columns, as the reference
method does); generation/salting belongs in an auth system, not here.
"""

from __future__ import annotations

import hmac
from functools import lru_cache

_MAGIC = b"OrpheanBeholderScryDoubt"
_B64_ALPHABET = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


# -- π-derived Blowfish constants -------------------------------------------


@lru_cache(maxsize=1)
def _pi_words(n_words: int = 18 + 4 * 256) -> list[int]:
    """First `n_words` 32-bit words of the fractional hex expansion of π
    (the Blowfish P/S initialization constants)."""
    from decimal import Decimal, getcontext

    n_hex = n_words * 8
    getcontext().prec = int(n_hex * 1.20412) + 30  # hex→dec digits + guard

    # Chudnovsky series (a_0 = 1; the recurrence applies from k = 1)
    one = Decimal(1)
    a_k, a_sum, b_sum = one, one, Decimal(0)
    C = 640320
    C3_OVER_24 = C**3 // 24
    eps = Decimal(10) ** (-getcontext().prec + 10)
    k = 1
    while True:
        a_k *= -(6 * k - 5) * (2 * k - 1) * (6 * k - 1)
        a_k /= k * k * k * C3_OVER_24
        a_sum += a_k
        b_sum += k * a_k
        if abs(a_k) < eps:
            break
        k += 1
    total = 13591409 * a_sum + 545140134 * b_sum
    pi = (426880 * Decimal(10005).sqrt()) / total

    frac = pi - 3
    words = []
    for _ in range(n_words):
        w = 0
        for _ in range(8):
            frac *= 16
            d = int(frac)
            frac -= d
            w = (w << 4) | d
        words.append(w)
    return words


class _Blowfish:
    def __init__(self):
        words = _pi_words()
        self.P = list(words[:18])
        self.S = [list(words[18 + i * 256: 18 + (i + 1) * 256]) for i in range(4)]

    def _f(self, x: int) -> int:
        S0, S1, S2, S3 = self.S
        return ((((S0[(x >> 24) & 0xFF] + S1[(x >> 16) & 0xFF]) & 0xFFFFFFFF)
                 ^ S2[(x >> 8) & 0xFF]) + S3[x & 0xFF]) & 0xFFFFFFFF

    def encrypt_words(self, left: int, right: int) -> tuple[int, int]:
        P = self.P
        f = self._f
        for i in range(16):
            left ^= P[i]
            right ^= f(left)
            left, right = right, left
        left, right = right, left
        right ^= P[16]
        left ^= P[17]
        return left, right

    def _cycled_words(self, data: bytes, n: int) -> list[int]:
        """n 32-bit words from `data` cycled byte-wise (bcrypt key/salt
        streaming)."""
        out, pos, ln = [], 0, len(data)
        for _ in range(n):
            w = 0
            for _ in range(4):
                w = ((w << 8) | data[pos % ln]) & 0xFFFFFFFF
                pos += 1
            out.append(w)
        return out

    def expand_key(self, salt: bytes, key: bytes) -> None:
        if key:
            kw = self._cycled_words(key, 18)
            for i in range(18):
                self.P[i] ^= kw[i]
        if salt:
            # salt is consumed as a rotating 2-word xor stream
            sw = self._cycled_words(salt, 4)
        l = r = 0
        j = 0
        for i in range(0, 18, 2):
            if salt:
                l ^= sw[j % 4]
                r ^= sw[(j + 1) % 4]
                j += 2
            l, r = self.encrypt_words(l, r)
            self.P[i], self.P[i + 1] = l, r
        for box in self.S:
            for i in range(0, 256, 2):
                if salt:
                    l ^= sw[j % 4]
                    r ^= sw[(j + 1) % 4]
                    j += 2
                l, r = self.encrypt_words(l, r)
                box[i], box[i + 1] = l, r


def _eks_setup(cost: int, salt: bytes, key: bytes) -> _Blowfish:
    bf = _Blowfish()
    bf.expand_key(salt, key)
    for _ in range(1 << cost):
        bf.expand_key(b"", key)
        bf.expand_key(b"", salt)
    return bf


def _crypt_b64_decode(s: str) -> bytes:
    bits = 0
    acc = 0
    out = bytearray()
    for ch in s:
        acc = (acc << 6) | _B64_ALPHABET.index(ch)
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def _crypt_b64_encode(b: bytes) -> str:
    out = []
    acc = 0
    bits = 0
    for byte in b:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append(_B64_ALPHABET[(acc >> bits) & 0x3F])
    if bits:
        out.append(_B64_ALPHABET[(acc << (6 - bits)) & 0x3F])
    return "".join(out)


def bcrypt_hash(password: bytes, cost: int, salt16: bytes, prefix: str = "2a") -> str:
    """The full bcrypt digest for a decoded 16-byte salt."""
    if not 4 <= cost <= 31:
        raise ValueError(f"invalid bcrypt cost {cost}")
    key = password[:72] + b"\x00"
    bf = _eks_setup(cost, salt16, key)
    words = [int.from_bytes(_MAGIC[i: i + 4], "big") for i in range(0, 24, 4)]
    for _ in range(64):
        for i in range(0, 6, 2):
            words[i], words[i + 1] = bf.encrypt_words(words[i], words[i + 1])
    ct = b"".join(w.to_bytes(4, "big") for w in words)[:23]
    return f"${prefix}${cost:02d}${_crypt_b64_encode(salt16)[:22]}{_crypt_b64_encode(ct)}"


def compare(password: bytes | str, hashed: str) -> bool:
    """CompareHashAndPassword: True on match, False on mismatch; raises
    ValueError on a malformed hash (mirrors Go's error split)."""
    if isinstance(password, str):
        password = password.encode()
    parts = hashed.split("$")
    if len(parts) != 4 or parts[1] not in ("2", "2a", "2b", "2x", "2y"):
        raise ValueError(f"malformed bcrypt hash {hashed!r}")
    try:
        cost = int(parts[2])
    except ValueError:
        raise ValueError(f"malformed bcrypt cost {parts[2]!r}")
    if len(parts[3]) < 22 + 31:
        raise ValueError("bcrypt hash too short")
    salt16 = _crypt_b64_decode(parts[3][:22])[:16]
    expect = bcrypt_hash(password, cost, salt16, prefix=parts[1])
    return hmac.compare_digest(expect, hashed)
