"""SSH-2 transport + SFTP v3 — from scratch off the public RFCs:
RFC 4253 (binary packet protocol, algorithm negotiation, DH key
exchange), RFC 3526 (the 2048-bit MODP group-14 prime), RFC 4252
(password userauth), RFC 4254 (channels + the subsystem request) and
draft-ietf-secsh-filexfer-02 (the SFTP v3 packet set every OpenSSH
server speaks). Crypto is the repo's own: AES-128-CTR
(functions/aes.py), RSA host keys + rsa-sha2-256 signatures
(functions/pki.py), HMAC-SHA2-256 and SHA-256 from the stdlib.

Negotiated suite (one of each — the modern-OpenSSH overlap):
``diffie-hellman-group14-sha256`` kex, ``rsa-sha2-256`` host key
signature over an ``ssh-rsa`` key blob, ``aes128-ctr`` both ways,
``hmac-sha2-256`` both ways, no compression.

The reference's sftp connectors (internal/impl/sftp/input.go,
output.go) use pkg/sftp over golang.org/x/crypto/ssh; here both the
client and :class:`MiniSftpServer` speak the same hand-written wire —
the server runs REAL kex (its own DH exponent, its own RSA host-key
signature that the client VERIFIES against the key blob in
KEXDH_REPLY), enforces the password, and checks every packet's MAC,
so the client is tested against an independent implementation of the
published math, not an echo."""

from __future__ import annotations

import hashlib
import hmac
import os
import socket
import struct
import threading
from typing import Any, Optional

from benthos_spark.functions import pki
from benthos_spark.functions.aes import AES

# RFC 3526 §3 — 2048-bit MODP group 14 prime, generator 2
GROUP14_P = int(
    "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD1"
    "29024E088A67CC74020BBEA63B139B22514A08798E3404DD"
    "EF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245"
    "E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
    "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3D"
    "C2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F"
    "83655D23DCA3AD961C62F356208552BB9ED529077096966D"
    "670C354E4ABC9804F1746C08CA18217C32905E462E36CE3B"
    "E39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9"
    "DE2BCBF6955817183995497CEA956AE515D2261898FA0510"
    "15728E5A8AACAA68FFFFFFFFFFFFFFFF", 16)
GROUP14_G = 2

# message numbers
MSG_DISCONNECT, MSG_SERVICE_REQUEST, MSG_SERVICE_ACCEPT = 1, 5, 6
MSG_KEXINIT, MSG_NEWKEYS = 20, 21
MSG_KEXDH_INIT, MSG_KEXDH_REPLY = 30, 31
MSG_USERAUTH_REQUEST, MSG_USERAUTH_FAILURE, MSG_USERAUTH_SUCCESS = 50, 51, 52
MSG_CHANNEL_OPEN, MSG_CHANNEL_OPEN_CONFIRM = 90, 91
MSG_CHANNEL_WINDOW_ADJUST, MSG_CHANNEL_DATA = 93, 94
MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE = 96, 97
MSG_CHANNEL_REQUEST, MSG_CHANNEL_SUCCESS, MSG_CHANNEL_FAILURE = 98, 99, 100

# SFTP v3 packet types (draft-ietf-secsh-filexfer-02)
FXP_INIT, FXP_VERSION = 1, 2
FXP_OPEN, FXP_CLOSE, FXP_READ, FXP_WRITE = 3, 4, 5, 6
FXP_OPENDIR, FXP_READDIR, FXP_REMOVE, FXP_MKDIR = 11, 12, 13, 14
FXP_STAT = 17
FXP_STATUS, FXP_HANDLE, FXP_DATA, FXP_NAME, FXP_ATTRS = 101, 102, 103, 104, 105

FX_OK, FX_EOF, FX_NO_SUCH_FILE, FX_FAILURE = 0, 1, 2, 4
FXF_READ, FXF_WRITE, FXF_CREAT, FXF_TRUNC = 0x01, 0x02, 0x08, 0x10

VERSION_STRING = "SSH-2.0-benthosspark_1.0"


class SshError(RuntimeError):
    pass


# -- wire scalars (RFC 4251 §5) ----------------------------------------------


def _u32(n: int) -> bytes:
    return struct.pack(">I", n)


def _string(b: bytes | str) -> bytes:
    if isinstance(b, str):
        b = b.encode()
    return _u32(len(b)) + b


def _mpint(n: int) -> bytes:
    if n == 0:
        return _u32(0)
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return _string(b)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def u8(self) -> int:
        self.pos += 1
        return self.buf[self.pos - 1]

    def u32(self) -> int:
        self.pos += 4
        return struct.unpack(">I", self.buf[self.pos - 4:self.pos])[0]

    def u64(self) -> int:
        self.pos += 8
        return struct.unpack(">Q", self.buf[self.pos - 8:self.pos])[0]

    def string(self) -> bytes:
        n = self.u32()
        self.pos += n
        return self.buf[self.pos - n:self.pos]

    def mpint(self) -> int:
        return int.from_bytes(self.string(), "big")

    def bool(self) -> bool:
        return self.u8() != 0


def host_key_blob(pub: pki.RsaPublic) -> bytes:
    """ssh-rsa public key blob (RFC 4253 §6.6)."""
    return _string("ssh-rsa") + _mpint(pub.e) + _mpint(pub.n)


def parse_host_key_blob(blob: bytes) -> pki.RsaPublic:
    r = _Reader(blob)
    if r.string() != b"ssh-rsa":
        raise SshError("unsupported host key type")
    e, n = r.mpint(), r.mpint()
    return pki.RsaPublic(n, e)


def _sig_blob(sig: bytes) -> bytes:
    return _string("rsa-sha2-256") + _string(sig)


def _kexinit_payload(cookie: bytes) -> bytes:
    lists = ["diffie-hellman-group14-sha256", "rsa-sha2-256",
             "aes128-ctr", "aes128-ctr", "hmac-sha2-256", "hmac-sha2-256",
             "none", "none", "", ""]
    out = bytes([MSG_KEXINIT]) + cookie
    for l in lists:
        out += _string(l)
    return out + b"\x00" + _u32(0)


class _HalfKeys:
    """One direction's cipher + mac state. CTR counter continues
    across packets (RFC 4344 semantics for aes128-ctr)."""

    def __init__(self, iv: bytes, enc_key: bytes, mac_key: bytes):
        self.aes = AES(enc_key)
        self.ctr = int.from_bytes(iv, "big")
        self.mac_key = mac_key
        self._ks = b""

    def xcrypt(self, data: bytes) -> bytes:
        while len(self._ks) < len(data):
            self._ks += self.aes.encrypt_block(self.ctr.to_bytes(16, "big"))
            self.ctr = (self.ctr + 1) % (1 << 128)
        out = bytes(a ^ b for a, b in zip(data, self._ks))
        self._ks = self._ks[len(data):]
        return out

    def mac(self, seq: int, clear: bytes) -> bytes:
        return hmac.new(self.mac_key, _u32(seq) + clear,
                        hashlib.sha256).digest()


class PacketConn:
    """RFC 4253 §6 binary packets; plaintext until NEWKEYS."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.tx: Optional[_HalfKeys] = None
        self.rx: Optional[_HalfKeys] = None
        self.tx_seq = 0
        self.rx_seq = 0

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return buf

    def send(self, payload: bytes) -> None:
        block = 16 if self.tx else 8
        pad = block - ((len(payload) + 5) % block)
        if pad < 4:
            pad += block
        clear = _u32(len(payload) + pad + 1) + bytes([pad]) + payload + os.urandom(pad)
        if self.tx:
            out = self.tx.xcrypt(clear) + self.tx.mac(self.tx_seq, clear)
        else:
            out = clear
        self.sock.sendall(out)
        self.tx_seq += 1

    def recv(self) -> bytes:
        if self.rx:
            first = self.rx.xcrypt(self._read_exact(16))
            plen = struct.unpack(">I", first[:4])[0]
            rest = self.rx.xcrypt(self._read_exact(plen - 12))
            clear = first + rest
            mac = self._read_exact(32)
            if not hmac.compare_digest(mac, self.rx.mac(self.rx_seq, clear)):
                raise SshError("MAC verification failed")
        else:
            head = self._read_exact(4)
            plen = struct.unpack(">I", head)[0]
            clear = head + self._read_exact(plen)
        self.rx_seq += 1
        pad = clear[4]
        return clear[5:5 + plen - pad - 1]


def derive_keys(K: int, H: bytes, session_id: bytes, letter: str,
                length: int) -> bytes:
    """RFC 4253 §7.2 key derivation with extension."""
    k = _mpint(K)
    out = hashlib.sha256(k + H + letter.encode() + session_id).digest()
    while len(out) < length:
        out += hashlib.sha256(k + H + out).digest()
    return out[:length]


def _exchange_hash(v_c: bytes, v_s: bytes, i_c: bytes, i_s: bytes,
                   k_s: bytes, e: int, f: int, K: int) -> bytes:
    return hashlib.sha256(
        _string(v_c) + _string(v_s) + _string(i_c) + _string(i_s)
        + _string(k_s) + _mpint(e) + _mpint(f) + _mpint(K)).digest()


def _apply_keys(conn: PacketConn, K: int, H: bytes, session_id: bytes,
                client_side: bool) -> None:
    iv_c2s = derive_keys(K, H, session_id, "A", 16)
    iv_s2c = derive_keys(K, H, session_id, "B", 16)
    key_c2s = derive_keys(K, H, session_id, "C", 16)
    key_s2c = derive_keys(K, H, session_id, "D", 16)
    mac_c2s = derive_keys(K, H, session_id, "E", 32)
    mac_s2c = derive_keys(K, H, session_id, "F", 32)
    if client_side:
        conn.tx = _HalfKeys(iv_c2s, key_c2s, mac_c2s)
        conn.rx = _HalfKeys(iv_s2c, key_s2c, mac_s2c)
    else:
        conn.tx = _HalfKeys(iv_s2c, key_s2c, mac_s2c)
        conn.rx = _HalfKeys(iv_c2s, key_c2s, mac_c2s)


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class SftpClient:
    """SSH transport + password auth + one sftp-subsystem channel."""

    def __init__(self, address: str, username: str, password: str,
                 timeout_s: float = 30.0):
        host, _, port = address.rpartition(":")
        self.sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                             timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.conn = PacketConn(self.sock)
        self._req_id = 0
        self._sftp_buf = b""
        self._handshake(username, password)

    # -- transport ----------------------------------------------------------
    def _handshake(self, username: str, password: str) -> None:
        self.sock.sendall(VERSION_STRING.encode() + b"\r\n")
        banner = b""
        while not banner.endswith(b"\n"):
            c = self.sock.recv(1)
            if not c:
                raise ConnectionError("no banner")
            banner += c
        v_s = banner.strip()
        if not v_s.startswith(b"SSH-2.0-"):
            raise SshError(f"bad server banner {v_s!r}")
        i_c = _kexinit_payload(os.urandom(16))
        self.conn.send(i_c)
        i_s = self.conn.recv()
        if i_s[0] != MSG_KEXINIT:
            raise SshError("expected KEXINIT")
        x = int.from_bytes(os.urandom(32), "big") % (GROUP14_P - 2) + 1
        e = pow(GROUP14_G, x, GROUP14_P)
        self.conn.send(bytes([MSG_KEXDH_INIT]) + _mpint(e))
        reply = self.conn.recv()
        if reply[0] != MSG_KEXDH_REPLY:
            raise SshError("expected KEXDH_REPLY")
        r = _Reader(reply[1:])
        k_s = r.string()
        f = r.mpint()
        sig_blob = r.string()
        K = pow(f, x, GROUP14_P)
        H = _exchange_hash(VERSION_STRING.encode(), v_s, i_c, i_s, k_s, e, f, K)
        # verify the server's rsa-sha2-256 signature over H
        sr = _Reader(sig_blob)
        if sr.string() != b"rsa-sha2-256":
            raise SshError("unexpected signature algorithm")
        host_pub = parse_host_key_blob(k_s)
        if not pki.rsa_verify(host_pub, H, sr.string(), "sha256"):
            raise SshError("host key signature verification failed")
        self.session_id = H
        self.conn.send(bytes([MSG_NEWKEYS]))
        if self.conn.recv() != bytes([MSG_NEWKEYS]):
            raise SshError("expected NEWKEYS")
        _apply_keys(self.conn, K, H, H, client_side=True)
        # userauth (RFC 4252 password)
        self.conn.send(bytes([MSG_SERVICE_REQUEST]) + _string("ssh-userauth"))
        if self.conn.recv()[0] != MSG_SERVICE_ACCEPT:
            raise SshError("service request rejected")
        self.conn.send(bytes([MSG_USERAUTH_REQUEST]) + _string(username)
                       + _string("ssh-connection") + _string("password")
                       + b"\x00" + _string(password))
        resp = self.conn.recv()
        if resp[0] != MSG_USERAUTH_SUCCESS:
            raise SshError("authentication failed")
        # session channel + sftp subsystem (RFC 4254)
        self.conn.send(bytes([MSG_CHANNEL_OPEN]) + _string("session")
                       + _u32(0) + _u32(1 << 24) + _u32(1 << 15))
        resp = self.conn.recv()
        if resp[0] != MSG_CHANNEL_OPEN_CONFIRM:
            raise SshError("channel open rejected")
        self.peer_channel = _Reader(resp[1:]).u32()
        self.conn.send(bytes([MSG_CHANNEL_REQUEST]) + _u32(self.peer_channel)
                       + _string("subsystem") + b"\x01" + _string("sftp"))
        if self._recv_skipping_window()[0] != MSG_CHANNEL_SUCCESS:
            raise SshError("sftp subsystem rejected")
        # SFTP INIT/VERSION
        self._sftp_send(bytes([FXP_INIT]) + _u32(3))
        pkt = self._sftp_recv()
        if pkt[0] != FXP_VERSION:
            raise SshError("expected FXP_VERSION")

    def _recv_skipping_window(self) -> bytes:
        while True:
            p = self.conn.recv()
            if p[0] != MSG_CHANNEL_WINDOW_ADJUST:
                return p

    # -- sftp framing over channel data --------------------------------------
    def _sftp_send(self, body: bytes) -> None:
        data = _u32(len(body)) + body
        self.conn.send(bytes([MSG_CHANNEL_DATA]) + _u32(self.peer_channel)
                       + _string(data))

    def _sftp_recv(self) -> bytes:
        while True:
            if len(self._sftp_buf) >= 4:
                n = struct.unpack(">I", self._sftp_buf[:4])[0]
                if len(self._sftp_buf) >= 4 + n:
                    body = self._sftp_buf[4:4 + n]
                    self._sftp_buf = self._sftp_buf[4 + n:]
                    return body
            p = self._recv_skipping_window()
            if p[0] == MSG_CHANNEL_DATA:
                r = _Reader(p[1:])
                r.u32()
                self._sftp_buf += r.string()
            elif p[0] in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
                raise ConnectionError("channel closed")

    def _call(self, ptype: int, body: bytes) -> bytes:
        self._req_id += 1
        self._sftp_send(bytes([ptype]) + _u32(self._req_id) + body)
        return self._sftp_recv()

    @staticmethod
    def _status(pkt: bytes) -> int:
        r = _Reader(pkt[1:])
        r.u32()
        return r.u32()

    def _expect_handle(self, pkt: bytes) -> bytes:
        if pkt[0] == FXP_STATUS:
            raise SshError(f"sftp status {self._status(pkt)}")
        r = _Reader(pkt[1:])
        r.u32()
        return r.string()

    # -- public verbs (the pkg/sftp subset the connectors use) ----------------
    def read_file(self, path: str) -> bytes:
        h = self._expect_handle(self._call(
            FXP_OPEN, _string(path) + _u32(FXF_READ) + _u32(0)))
        out, offset = b"", 0
        try:
            while True:
                pkt = self._call(FXP_READ, _string(h) + struct.pack(">Q", offset)
                                 + _u32(32768))
                if pkt[0] == FXP_STATUS:
                    if self._status(pkt) == FX_EOF:
                        return out
                    raise SshError(f"read status {self._status(pkt)}")
                r = _Reader(pkt[1:])
                r.u32()
                chunk = r.string()
                out += chunk
                offset += len(chunk)
        finally:
            self._call(FXP_CLOSE, _string(h))

    def write_file(self, path: str, data: bytes) -> None:
        h = self._expect_handle(self._call(
            FXP_OPEN, _string(path)
            + _u32(FXF_WRITE | FXF_CREAT | FXF_TRUNC) + _u32(0)))
        try:
            offset = 0
            for i in range(0, len(data) or 1, 32768):
                chunk = data[i:i + 32768]
                pkt = self._call(FXP_WRITE, _string(h)
                                 + struct.pack(">Q", offset) + _string(chunk))
                if self._status(pkt) != FX_OK:
                    raise SshError(f"write status {self._status(pkt)}")
                offset += len(chunk)
        finally:
            self._call(FXP_CLOSE, _string(h))

    def listdir(self, path: str) -> list[dict]:
        h = self._expect_handle(self._call(FXP_OPENDIR, _string(path)))
        out: list[dict] = []
        try:
            while True:
                pkt = self._call(FXP_READDIR, _string(h))
                if pkt[0] == FXP_STATUS:
                    if self._status(pkt) == FX_EOF:
                        return out
                    raise SshError(f"readdir status {self._status(pkt)}")
                r = _Reader(pkt[1:])
                r.u32()
                count = r.u32()
                for _ in range(count):
                    name = r.string().decode()
                    r.string()  # longname
                    flags = r.u32()
                    size = r.u64() if flags & 1 else 0
                    out.append({"name": name, "size": size})
        finally:
            self._call(FXP_CLOSE, _string(h))

    def mkdir(self, path: str) -> None:
        self._call(FXP_MKDIR, _string(path) + _u32(0))

    def remove(self, path: str) -> None:
        pkt = self._call(FXP_REMOVE, _string(path))
        if self._status(pkt) != FX_OK:
            raise SshError(f"remove status {self._status(pkt)}")

    def stat_entry(self, path: str) -> Optional[dict]:
        """-> {"type": "file"|"dir", "size"} or None when absent.
        SFTP v3 attrs carry the type in the PERMISSIONS flag's
        S_IFDIR/S_IFREG mode bits (draft -02 §5)."""
        pkt = self._call(FXP_STAT, _string(path))
        if pkt[0] == FXP_STATUS:
            return None
        r = _Reader(pkt[1:])
        r.u32()
        flags = r.u32()
        size = r.u64() if flags & 1 else 0
        mode = 0
        if flags & 4:  # SSH_FILEXFER_ATTR_PERMISSIONS
            if flags & 2:  # uid/gid precede permissions when present
                r.u32()
                r.u32()
            mode = r.u32()
        is_dir = bool(mode & 0o40000)
        return {"type": "dir" if is_dir else "file", "size": size}

    def stat(self, path: str) -> Optional[int]:
        """File size, or None when absent OR a directory."""
        e = self.stat_entry(path)
        return e["size"] if e is not None and e["type"] == "file" else None

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Mini server
# ---------------------------------------------------------------------------


def _gen_host_key(seed: int = 1338) -> pki.RsaPrivate:
    """Deterministic 1024-bit host key (Miller-Rabin over a seeded RNG
    — test infrastructure, not production key hygiene)."""
    import random

    rng = random.Random(seed)

    def mr(n: int) -> bool:
        if n % 2 == 0:
            return False
        d, r = n - 1, 0
        while d % 2 == 0:
            d //= 2
            r += 1
        for _ in range(24):
            a = rng.randrange(2, n - 1)
            x = pow(a, d, n)
            if x in (1, n - 1):
                continue
            for _ in range(r - 1):
                x = pow(x, 2, n)
                if x == n - 1:
                    break
            else:
                return False
        return True

    def prime(bits: int) -> int:
        while True:
            c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
            if mr(c):
                return c

    p, q = prime(512), prime(512)
    n, e = p * q, 65537
    return pki.RsaPrivate(n, e, pow(e, -1, (p - 1) * (q - 1)))


class MiniSftpServer:
    """Thread-per-connection SSH+SFTP server over an in-memory FS."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 username: str = "worker", password: str = "secret",
                 host_key: Optional[pki.RsaPrivate] = None):
        self.host, self.port = host, port
        self.username, self.password = username, password
        self.host_key = host_key or _gen_host_key()
        self.files: dict[str, bytes] = {}
        self.dirs: set[str] = {"/"}
        self._lock = threading.Lock()
        self._stop = threading.Event()

    def start(self) -> "MiniSftpServer":
        self._srv = socket.create_server((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"

    def stop(self) -> None:
        self._stop.set()
        self._srv.close()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._conn_loop, args=(sock,),
                             daemon=True).start()

    def _conn_loop(self, sock: socket.socket) -> None:
        try:
            self._serve(sock)
        except (ConnectionError, OSError, SshError):
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _serve(self, sock: socket.socket) -> None:
        conn = PacketConn(sock)
        banner = b""
        while not banner.endswith(b"\n"):
            c = sock.recv(1)
            if not c:
                return
            banner += c
        v_c = banner.strip()
        sock.sendall(VERSION_STRING.encode() + b"\r\n")
        i_c = conn.recv()
        if i_c[0] != MSG_KEXINIT:
            raise SshError("expected client KEXINIT")
        i_s = _kexinit_payload(os.urandom(16))
        conn.send(i_s)
        pkt = conn.recv()
        if pkt[0] != MSG_KEXDH_INIT:
            raise SshError("expected KEXDH_INIT")
        e = _Reader(pkt[1:]).mpint()
        y = int.from_bytes(os.urandom(32), "big") % (GROUP14_P - 2) + 1
        f = pow(GROUP14_G, y, GROUP14_P)
        K = pow(e, y, GROUP14_P)
        pub = pki.RsaPublic(self.host_key.n, self.host_key.e)
        k_s = host_key_blob(pub)
        H = _exchange_hash(v_c, VERSION_STRING.encode(), i_c, i_s, k_s, e, f, K)
        sig = pki.rsa_sign(self.host_key, H, "sha256")
        conn.send(bytes([MSG_KEXDH_REPLY]) + _string(k_s) + _mpint(f)
                  + _string(_sig_blob(sig)))
        conn.send(bytes([MSG_NEWKEYS]))
        if conn.recv() != bytes([MSG_NEWKEYS]):
            raise SshError("expected NEWKEYS")
        _apply_keys(conn, K, H, H, client_side=False)
        # userauth
        pkt = conn.recv()
        if pkt[0] != MSG_SERVICE_REQUEST:
            raise SshError("expected SERVICE_REQUEST")
        conn.send(bytes([MSG_SERVICE_ACCEPT]) + _string("ssh-userauth"))
        pkt = conn.recv()
        r = _Reader(pkt[1:])
        user, _svc, method = r.string(), r.string(), r.string()
        ok = False
        if method == b"password":
            r.bool()
            ok = (user.decode() == self.username
                  and r.string().decode() == self.password)
        if not ok:
            conn.send(bytes([MSG_USERAUTH_FAILURE]) + _string("password")
                      + b"\x00")
            return
        conn.send(bytes([MSG_USERAUTH_SUCCESS]))
        # channel + subsystem
        pkt = conn.recv()
        if pkt[0] != MSG_CHANNEL_OPEN:
            raise SshError("expected CHANNEL_OPEN")
        r = _Reader(pkt[1:])
        r.string()
        sender = r.u32()
        conn.send(bytes([MSG_CHANNEL_OPEN_CONFIRM]) + _u32(sender) + _u32(0)
                  + _u32(1 << 24) + _u32(1 << 15))
        pkt = conn.recv()
        r = _Reader(pkt[1:])
        r.u32()
        if pkt[0] != MSG_CHANNEL_REQUEST or r.string() != b"subsystem":
            raise SshError("expected subsystem request")
        r.bool()
        if r.string() != b"sftp":
            conn.send(bytes([MSG_CHANNEL_FAILURE]) + _u32(sender))
            return
        conn.send(bytes([MSG_CHANNEL_SUCCESS]) + _u32(sender))
        self._sftp_loop(conn, sender)

    # -- sftp server side -----------------------------------------------------
    def _sftp_loop(self, conn: PacketConn, channel: int) -> None:
        buf = b""
        handles: dict[bytes, dict] = {}
        hseq = [0]

        def send_pkt(body: bytes) -> None:
            data = _u32(len(body)) + body
            conn.send(bytes([MSG_CHANNEL_DATA]) + _u32(channel) + _string(data))

        def status(rid: int, code: int, msg: str = "") -> None:
            send_pkt(bytes([FXP_STATUS]) + _u32(rid) + _u32(code)
                     + _string(msg) + _string(""))

        def new_handle(info: dict) -> bytes:
            hseq[0] += 1
            h = f"h{hseq[0]}".encode()
            handles[h] = info
            return h

        while not self._stop.is_set():
            pkt = conn.recv()
            if pkt[0] in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
                return
            if pkt[0] != MSG_CHANNEL_DATA:
                continue
            r = _Reader(pkt[1:])
            r.u32()
            buf += r.string()
            while len(buf) >= 4:
                n = struct.unpack(">I", buf[:4])[0]
                if len(buf) < 4 + n:
                    break
                body = buf[4:4 + n]
                buf = buf[4 + n:]
                self._sftp_dispatch(body, handles, new_handle, send_pkt, status)

    def _sftp_dispatch(self, body, handles, new_handle, send_pkt, status):
        ptype = body[0]
        r = _Reader(body[1:])
        if ptype == FXP_INIT:
            send_pkt(bytes([FXP_VERSION]) + _u32(3))
            return
        rid = r.u32()
        with self._lock:
            if ptype == FXP_OPEN:
                path = r.string().decode()
                pflags = r.u32()
                if pflags & FXF_READ and path not in self.files:
                    status(rid, FX_NO_SUCH_FILE, path)
                    return
                if pflags & FXF_TRUNC:
                    self.files[path] = b""
                elif pflags & FXF_CREAT:
                    self.files.setdefault(path, b"")
                h = new_handle({"path": path, "dir": False})
                send_pkt(bytes([FXP_HANDLE]) + _u32(rid) + _string(h))
            elif ptype == FXP_OPENDIR:
                path = r.string().decode().rstrip("/") or "/"
                prefix = path if path.endswith("/") else path + "/"
                names = []
                for f, data in sorted(self.files.items()):
                    if f.startswith(prefix) and "/" not in f[len(prefix):]:
                        names.append((f[len(prefix):], len(data)))
                h = new_handle({"dir": True, "names": names, "served": False})
                send_pkt(bytes([FXP_HANDLE]) + _u32(rid) + _string(h))
            elif ptype == FXP_READDIR:
                h = r.string()
                info = handles.get(h)
                if info is None or not info["dir"] or info["served"]:
                    status(rid, FX_EOF)
                    return
                info["served"] = True
                out = bytes([FXP_NAME]) + _u32(rid) + _u32(len(info["names"]))
                for name, size in info["names"]:
                    out += (_string(name) + _string(name)
                            + _u32(1) + struct.pack(">Q", size))
                send_pkt(out)
            elif ptype == FXP_READ:
                h, offset, length = r.string(), r.u64(), r.u32()
                info = handles.get(h)
                data = self.files.get(info["path"], b"") if info else b""
                chunk = data[offset:offset + length]
                if not chunk:
                    status(rid, FX_EOF)
                else:
                    send_pkt(bytes([FXP_DATA]) + _u32(rid) + _string(chunk))
            elif ptype == FXP_WRITE:
                h, offset, chunk = r.string(), r.u64(), r.string()
                info = handles.get(h)
                if info is None:
                    status(rid, FX_FAILURE)
                    return
                data = self.files.get(info["path"], b"")
                if len(data) < offset:
                    data += b"\x00" * (offset - len(data))
                self.files[info["path"]] = (data[:offset] + chunk
                                            + data[offset + len(chunk):])
                status(rid, FX_OK)
            elif ptype == FXP_CLOSE:
                handles.pop(r.string(), None)
                status(rid, FX_OK)
            elif ptype == FXP_REMOVE:
                path = r.string().decode()
                if self.files.pop(path, None) is None:
                    status(rid, FX_NO_SUCH_FILE, path)
                else:
                    status(rid, FX_OK)
            elif ptype == FXP_MKDIR:
                self.dirs.add(r.string().decode().rstrip("/") or "/")
                status(rid, FX_OK)
            elif ptype == FXP_STAT:
                path = r.string().decode()
                if path in self.files:
                    send_pkt(bytes([FXP_ATTRS]) + _u32(rid) + _u32(1 | 4)
                             + struct.pack(">Q", len(self.files[path]))
                             + _u32(0o100644))  # S_IFREG
                elif path.rstrip("/") in self.dirs:
                    send_pkt(bytes([FXP_ATTRS]) + _u32(rid) + _u32(4)
                             + _u32(0o40755))  # S_IFDIR
                else:
                    status(rid, FX_NO_SUCH_FILE, path)
            else:
                status(rid, FX_FAILURE, f"unsupported type {ptype}")
