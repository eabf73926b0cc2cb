"""Pure-python AES-128/192/256 with CTR/OFB/CBC modes.

Backs the Bloblang ``encrypt_aes``/``decrypt_aes`` methods
(/root/reference/internal/bloblang/query/methods_strings.go:279,367)
without a crypto dependency — this sandbox has no `cryptography`
package, and the interpreter tier is Python anyway. Semantics match
the reference exactly: no padding anywhere, CBC requires the input to
be a multiple of the 16-byte block, the IV must be one block long, and
encrypt/decrypt return raw bytes.

From-scratch implementation of FIPS-197 (the public AES spec):
S-box generated from the GF(2^8) inverse + affine transform, standard
key expansion, 4x4 column-major state. Verified against the NIST
SP 800-38A test vectors in tests/test_bloblang_lang.py.

NOT a side-channel-hardened implementation — it is for data-pipeline
payload transforms, mirroring how the reference uses Go's crypto/aes
inside a message processor, not for key management.
"""

from __future__ import annotations

# -- S-box generation (GF(2^8) inverse + affine transform) -------------------


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def inv(b: int) -> int:
        return 0 if b == 0 else exp[255 - log[b]]

    sbox = bytearray(256)
    for i in range(256):
        c = inv(i)
        r = c
        for _ in range(4):
            c = ((c << 1) | (c >> 7)) & 0xFF
            r ^= c
        sbox[i] = r ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]

# precomputed multiplication tables for MixColumns / InvMixColumns
_M2 = bytes(_gmul(i, 2) for i in range(256))
_M3 = bytes(_gmul(i, 3) for i in range(256))
_M9 = bytes(_gmul(i, 9) for i in range(256))
_M11 = bytes(_gmul(i, 11) for i in range(256))
_M13 = bytes(_gmul(i, 13) for i in range(256))
_M14 = bytes(_gmul(i, 14) for i in range(256))


class AES:
    """The raw block cipher: 16-byte block encrypt/decrypt."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"invalid AES key size {len(key)}")
        self.nk = len(key) // 4
        self.nr = self.nk + 6
        self.rk = self._expand(key)

    def _expand(self, key: bytes) -> list[int]:
        # round keys as a list of 32-bit words
        w = [int.from_bytes(key[4 * i: 4 * i + 4], "big") for i in range(self.nk)]
        for i in range(self.nk, 4 * (self.nr + 1)):
            t = w[i - 1]
            if i % self.nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = int.from_bytes(bytes(_SBOX[b] for b in t.to_bytes(4, "big")), "big")
                t ^= _RCON[i // self.nk - 1] << 24
            elif self.nk > 6 and i % self.nk == 4:
                t = int.from_bytes(bytes(_SBOX[b] for b in t.to_bytes(4, "big")), "big")
            w.append(w[i - self.nk] ^ t)
        return w

    def _round_key(self, r: int) -> bytes:
        return b"".join(self.rk[4 * r + c].to_bytes(4, "big") for c in range(4))

    def encrypt_block(self, block: bytes) -> bytes:
        s = bytearray(x ^ k for x, k in zip(block, self._round_key(0)))
        for rnd in range(1, self.nr + 1):
            # SubBytes
            s = bytearray(_SBOX[b] for b in s)
            # ShiftRows (state is column-major: byte index = 4*col + row)
            t = bytearray(16)
            for col in range(4):
                for row in range(4):
                    t[4 * col + row] = s[4 * ((col + row) % 4) + row]
            s = t
            # MixColumns (skipped in the final round)
            if rnd != self.nr:
                m = bytearray(16)
                for col in range(4):
                    a0, a1, a2, a3 = s[4 * col: 4 * col + 4]
                    m[4 * col + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
                    m[4 * col + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
                    m[4 * col + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
                    m[4 * col + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
                s = m
            rk = self._round_key(rnd)
            s = bytearray(x ^ k for x, k in zip(s, rk))
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = bytearray(x ^ k for x, k in zip(block, self._round_key(self.nr)))
        for rnd in range(self.nr - 1, -1, -1):
            # InvShiftRows
            t = bytearray(16)
            for col in range(4):
                for row in range(4):
                    t[4 * ((col + row) % 4) + row] = s[4 * col + row]
            s = t
            # InvSubBytes
            s = bytearray(_INV_SBOX[b] for b in s)
            rk = self._round_key(rnd)
            s = bytearray(x ^ k for x, k in zip(s, rk))
            # InvMixColumns (skipped after the last, i.e. round 0, xor)
            if rnd != 0:
                m = bytearray(16)
                for col in range(4):
                    a0, a1, a2, a3 = s[4 * col: 4 * col + 4]
                    m[4 * col + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
                    m[4 * col + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
                    m[4 * col + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
                    m[4 * col + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
                s = m
        return bytes(s)


def _check_iv(cipher: AES, iv: bytes) -> None:
    if len(iv) != 16:
        raise ValueError("the key must match the initialisation vector size")


def ctr_xcrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CTR keystream xor (encrypt == decrypt); big-endian full-block
    counter increment, like Go's cipher.NewCTR."""
    c = AES(key)
    _check_iv(c, iv)
    ctr = int.from_bytes(iv, "big")
    out = bytearray()
    for off in range(0, len(data), 16):
        ks = c.encrypt_block(ctr.to_bytes(16, "big"))
        chunk = data[off: off + 16]
        out.extend(x ^ k for x, k in zip(chunk, ks))
        ctr = (ctr + 1) % (1 << 128)
    return bytes(out)


def ofb_xcrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = AES(key)
    _check_iv(c, iv)
    feedback = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        feedback = c.encrypt_block(feedback)
        chunk = data[off: off + 16]
        out.extend(x ^ k for x, k in zip(chunk, feedback))
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16 != 0:
        raise ValueError("plaintext is not a multiple of the block size")
    c = AES(key)
    _check_iv(c, iv)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        block = bytes(x ^ p for x, p in zip(data[off: off + 16], prev))
        prev = c.encrypt_block(block)
        out.extend(prev)
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16 != 0:
        raise ValueError("ciphertext is not a multiple of the block size")
    c = AES(key)
    _check_iv(c, iv)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        block = data[off: off + 16]
        out.extend(x ^ p for x, p in zip(c.decrypt_block(block), prev))
        prev = block
    return bytes(out)


_ENC = {"ctr": ctr_xcrypt, "ofb": ofb_xcrypt, "cbc": cbc_encrypt}
_DEC = {"ctr": ctr_xcrypt, "ofb": ofb_xcrypt, "cbc": cbc_decrypt}


def encrypt(scheme: str, key: bytes, iv: bytes, data: bytes) -> bytes:
    fn = _ENC.get(scheme.lower())
    if fn is None:
        raise ValueError(f"unrecognized encryption type: {scheme}")
    return fn(key, iv, data)


def decrypt(scheme: str, key: bytes, iv: bytes, data: bytes) -> bytes:
    fn = _DEC.get(scheme.lower())
    if fn is None:
        raise ValueError(f"unrecognized encryption type: {scheme}")
    return fn(key, iv, data)
