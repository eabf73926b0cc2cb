"""Minimal from-scratch PKI: DER/PEM parsing, RSA PKCS#1 v1.5 and
ECDSA (P-256/P-384/P-521) signatures.

Backs the RS*/ES* JWT methods
(/root/reference/internal/impl/crypto/jwt_sign.go:113-151,
jwt_parse.go:123-180) without an RSA/ECDSA library. Everything here is
built from the public specs:

- DER: the subset of ASN.1 BER/DER needed for key files (SEQUENCE,
  INTEGER, BIT STRING, OCTET STRING, OID, context tags);
- RSA: RSASSA-PKCS1-v1_5 (RFC 8017 §8.2) with the SHA-2 DigestInfo
  prefixes; keys from PKCS#1, PKCS#8 or SubjectPublicKeyInfo PEM;
- ECDSA: NIST curves over affine coordinates with
  `pow(x, -1, p)` inversions; SIGNING uses RFC 6979 deterministic
  nonces so results are reproducible (verified against the RFC's own
  test vectors); JWT signatures are the fixed-width r||s form.

Verified against the reference's own jwt_parse_test.go tokens for all
six RS/ES algorithms. Not constant-time — pipeline-side verification
and test signing, not an HSM.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# PEM + DER
# ---------------------------------------------------------------------------


def pem_body(pem: str, expect: str | None = None) -> tuple[str, bytes]:
    lines = [ln.strip() for ln in pem.strip().splitlines()]
    if not lines or not lines[0].startswith("-----BEGIN "):
        raise ValueError("not a PEM block")
    label = lines[0][len("-----BEGIN "):-len("-----")]
    if expect and label != expect:
        raise ValueError(f"expected {expect} PEM, got {label}")
    body = "".join(ln for ln in lines[1:] if not ln.startswith("-----"))
    return label, base64.b64decode(body)


def der_parse(b: bytes, pos: int = 0) -> tuple[int, bytes, int]:
    """One TLV: returns (tag, value_bytes, next_pos)."""
    tag = b[pos]
    pos += 1
    ln = b[pos]
    pos += 1
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(b[pos: pos + n], "big")
        pos += n
    return tag, b[pos: pos + ln], pos + ln


def der_children(b: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(b):
        tag, val, pos = der_parse(b, pos)
        out.append((tag, val))
    return out


def _int(v: bytes) -> int:
    return int.from_bytes(v, "big")


_OID_RSA = bytes.fromhex("2a864886f70d010101")  # 1.2.840.113549.1.1.1
_OID_EC = bytes.fromhex("2a8648ce3d0201")  # 1.2.840.10045.2.1
_OID_CURVE = {
    bytes.fromhex("2a8648ce3d030107"): "P-256",  # prime256v1
    bytes.fromhex("2b81040022"): "P-384",  # secp384r1
    bytes.fromhex("2b81040023"): "P-521",  # secp521r1
}


# ---------------------------------------------------------------------------
# key containers
# ---------------------------------------------------------------------------


@dataclass
class RsaPublic:
    n: int
    e: int


@dataclass
class RsaPrivate:
    n: int
    e: int
    d: int


@dataclass
class EcPublic:
    curve: str
    x: int
    y: int


@dataclass
class EcPrivate:
    curve: str
    d: int


def load_public_key(pem: str):
    """PEM "PUBLIC KEY" (SubjectPublicKeyInfo) or "RSA PUBLIC KEY"."""
    label, der = pem_body(pem)
    if label == "RSA PUBLIC KEY":  # PKCS#1
        _, seq, _ = der_parse(der)
        ints = der_children(seq)
        return RsaPublic(_int(ints[0][1]), _int(ints[1][1]))
    _, spki, _ = der_parse(der)
    (alg_tag, alg), (bits_tag, bits) = der_children(spki)[:2]
    alg_children = der_children(alg)
    oid = alg_children[0][1]
    keybits = bits[1:]  # skip unused-bits octet
    if oid == _OID_RSA:
        _, seq, _ = der_parse(keybits)
        ints = der_children(seq)
        return RsaPublic(_int(ints[0][1]), _int(ints[1][1]))
    if oid == _OID_EC:
        curve = _OID_CURVE.get(alg_children[1][1])
        if curve is None:
            raise ValueError("unsupported EC curve")
        if keybits[0] != 4:
            raise ValueError("compressed EC points unsupported")
        ln = (len(keybits) - 1) // 2
        return EcPublic(curve, _int(keybits[1: 1 + ln]), _int(keybits[1 + ln:]))
    raise ValueError("unsupported key algorithm")


def load_private_key(pem: str):
    """PKCS#1 "RSA PRIVATE KEY", SEC1 "EC PRIVATE KEY", or PKCS#8."""
    label, der = pem_body(pem)
    _, seq, _ = der_parse(der)
    kids = der_children(seq)
    if label == "RSA PRIVATE KEY":
        return RsaPrivate(_int(kids[1][1]), _int(kids[2][1]), _int(kids[3][1]))
    if label == "EC PRIVATE KEY":
        d = _int(kids[1][1])
        curve = None
        for tag, val in kids[2:]:
            if tag == 0xA0:  # [0] parameters — curve OID
                curve = _OID_CURVE.get(der_children(val)[0][1] if val[0] == 6 else val)
                if curve is None:
                    _, oid, _ = der_parse(val)
                    curve = _OID_CURVE.get(oid)
        if curve is None:
            raise ValueError("EC key without curve parameters")
        return EcPrivate(curve, d)
    if label == "PRIVATE KEY":  # PKCS#8
        alg = der_children(kids[1][1])
        oid = alg[0][1]
        inner = kids[2][1]
        _, innerseq, _ = der_parse(inner)
        ik = der_children(innerseq)
        if oid == _OID_RSA:
            return RsaPrivate(_int(ik[1][1]), _int(ik[2][1]), _int(ik[3][1]))
        if oid == _OID_EC:
            curve = _OID_CURVE.get(alg[1][1])
            return EcPrivate(curve, _int(ik[1][1]))
    raise ValueError(f"unsupported private key PEM {label!r}")


# ---------------------------------------------------------------------------
# RSA PKCS#1 v1.5 (RFC 8017 §8.2 / §9.2)
# ---------------------------------------------------------------------------

_DIGEST_INFO = {
    "sha256": bytes.fromhex("3031300d060960864801650304020105000420"),
    "sha384": bytes.fromhex("3041300d060960864801650304020205000430"),
    "sha512": bytes.fromhex("3051300d060960864801650304020305000440"),
}


def _emsa_pkcs1(msg: bytes, halg: str, em_len: int) -> bytes:
    t = _DIGEST_INFO[halg] + getattr(hashlib, halg)(msg).digest()
    if em_len < len(t) + 11:
        raise ValueError("RSA key too small for digest")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def rsa_sign(key: RsaPrivate, msg: bytes, halg: str) -> bytes:
    k = (key.n.bit_length() + 7) // 8
    em = int.from_bytes(_emsa_pkcs1(msg, halg, k), "big")
    return pow(em, key.d, key.n).to_bytes(k, "big")


def rsa_verify(key: RsaPublic, msg: bytes, sig: bytes, halg: str) -> bool:
    k = (key.n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    em = pow(int.from_bytes(sig, "big"), key.e, key.n).to_bytes(k, "big")
    return hmac.compare_digest(em, _emsa_pkcs1(msg, halg, k))


# ---------------------------------------------------------------------------
# ECDSA over the NIST prime curves (FIPS 186-4 / SEC 2 parameters)
# ---------------------------------------------------------------------------

_CURVES = {
    "P-256": dict(
        p=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
        a=-3,
        b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        n=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
        gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
    ),
    "P-384": dict(
        p=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFFFF0000000000000000FFFFFFFF,
        a=-3,
        b=0xB3312FA7E23EE7E4988E056BE3F82D19181D9C6EFE8141120314088F5013875AC656398D8A2ED19D2A85C8EDD3EC2AEF,
        n=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC7634D81F4372DDF581A0DB248B0A77AECEC196ACCC52973,
        gx=0xAA87CA22BE8B05378EB1C71EF320AD746E1D3B628BA79B9859F741E082542A385502F25DBF55296C3A545E3872760AB7,
        gy=0x3617DE4A96262C6F5D9E98BF9292DC29F8F41DBD289A147CE9DA3113B5F0B8C00A60B1CE1D7E819D7A431D7C90EA0E5F,
    ),
    "P-521": dict(
        p=(1 << 521) - 1,
        a=-3,
        b=0x0051953EB9618E1C9A1F929A21A0B68540EEA2DA725B99B315F3B8B489918EF109E156193951EC7E937B1652C0BD3BB1BF073573DF883D2C34F1EF451FD46B503F00,
        n=0x01FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFA51868783BF2F966B7FCC0148F709A5D03BB5C9B8899C47AEBB6FB71E91386409,
        gx=0x00C6858E06B70404E9CD9E3ECB662395B4429C648139053FB521F828AF606B4D3DBAA14B5E77EFE75928FE1DC127A2FFA8DE3348B3C1856A429BF97E7E31C2E5BD66,
        gy=0x011839296A789A3BC0045C8A5FB42C7D1BD998F54449579B446817AFBD17273E662C97EE72995EF42640C550B9013FAD0761353C7086A272C24088BE94769FD16650,
    ),
}

_CURVE_HASH = {"P-256": "sha256", "P-384": "sha384", "P-521": "sha512"}


def _ec_add(P, Q, p, a):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return x3, (lam * (x1 - x3) - y1) % p


def _ec_mul(k: int, P, p, a):
    R = None
    while k:
        if k & 1:
            R = _ec_add(R, P, p, a)
        P = _ec_add(P, P, p, a)
        k >>= 1
    return R


def _bits2int(b: bytes, qlen: int) -> int:
    v = int.from_bytes(b, "big")
    blen = len(b) * 8
    return v >> (blen - qlen) if blen > qlen else v


def _rfc6979_k(d: int, h1: bytes, q: int, halg: str) -> int:
    """Deterministic nonce (RFC 6979 §3.2) — reproducible ES signing."""
    qlen = q.bit_length()
    holen = getattr(hashlib, halg)().digest_size
    rolen = (qlen + 7) // 8
    bx = d.to_bytes(rolen, "big") + (
        (_bits2int(h1, qlen) % q).to_bytes(rolen, "big")
    )
    V = b"\x01" * holen
    K = b"\x00" * holen
    K = hmac.new(K, V + b"\x00" + bx, halg).digest()
    V = hmac.new(K, V, halg).digest()
    K = hmac.new(K, V + b"\x01" + bx, halg).digest()
    V = hmac.new(K, V, halg).digest()
    while True:
        t = b""
        while len(t) < rolen:
            V = hmac.new(K, V, halg).digest()
            t += V
        k = _bits2int(t[:rolen], qlen)
        if 1 <= k < q:
            return k
        K = hmac.new(K, V + b"\x00", halg).digest()
        V = hmac.new(K, V, halg).digest()


def ecdsa_sign(key: EcPrivate, msg: bytes, halg: str) -> tuple[int, int]:
    c = _CURVES[key.curve]
    p, a, q = c["p"], c["a"], c["n"]
    G = (c["gx"], c["gy"])
    h1 = getattr(hashlib, halg)(msg).digest()
    z = _bits2int(h1, q.bit_length()) % q
    while True:
        k = _rfc6979_k(key.d, h1, q, halg)
        R = _ec_mul(k, G, p, a)
        r = R[0] % q
        if r == 0:
            continue
        s = pow(k, -1, q) * (z + r * key.d) % q
        if s == 0:
            continue
        return r, s


def ecdsa_verify(key: EcPublic, msg: bytes, r: int, s: int, halg: str) -> bool:
    c = _CURVES[key.curve]
    p, a, q = c["p"], c["a"], c["n"]
    if not (1 <= r < q and 1 <= s < q):
        return False
    h1 = getattr(hashlib, halg)(msg).digest()
    z = _bits2int(h1, q.bit_length()) % q
    w = pow(s, -1, q)
    u1 = z * w % q
    u2 = r * w % q
    G = (c["gx"], c["gy"])
    Q = (key.x, key.y)
    R = _ec_add(_ec_mul(u1, G, p, a), _ec_mul(u2, Q, p, a), p, a)
    if R is None:
        return False
    return R[0] % q == r


def ec_coord_len(curve: str) -> int:
    return (_CURVES[curve]["n"].bit_length() + 7) // 8
