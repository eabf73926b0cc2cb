"""sftp connectors over the from-scratch SSH-2 + SFTP v3 stack
(functions/ssh_proto.py, operators/sftpio.py). The handshake runs
REAL crypto both ways — the server's host-key signature is verified
by the client and every packet's HMAC by both ends — and the wire
scalars are pinned against RFC 4251, so the two ends aren't merely
tested against each other."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import pki
from benthos_spark.functions.ssh_proto import (GROUP14_G, GROUP14_P,
                                               MiniSftpServer, SftpClient,
                                               SshError, _kexinit_payload,
                                               _mpint, _string, derive_keys,
                                               host_key_blob,
                                               parse_host_key_blob)
from benthos_spark.operators.sftpio import SftpSink, SftpSource


@pytest.fixture(scope="module")
def srv():
    s = MiniSftpServer().start()
    yield s
    s.stop()


def _client(srv) -> SftpClient:
    return SftpClient(srv.address, srv.username, srv.password)


# ---------------------------------------------------------------------------
# wire pins
# ---------------------------------------------------------------------------


def test_rfc4251_scalar_encodings():
    assert _string("abc") == b"\x00\x00\x00\x03abc"
    assert _mpint(0) == b"\x00\x00\x00\x00"
    # RFC 4251 §5 example: 0x80 encodes with a leading zero octet
    assert _mpint(0x80) == b"\x00\x00\x00\x02\x00\x80"
    assert _mpint(0x9A378F9B2E332A7) == \
        b"\x00\x00\x00\x08\x09\xa3\x78\xf9\xb2\xe3\x32\xa7"


def test_group14_prime_pinned():
    # RFC 3526 §3: 2048-bit MODP group, generator 2
    assert GROUP14_P.bit_length() == 2048 and GROUP14_G == 2
    assert GROUP14_P % 2 == 1
    assert hex(GROUP14_P).endswith("ffffffffffffffff")


def test_kexinit_shape():
    p = _kexinit_payload(b"\x00" * 16)
    assert p[0] == 20 and p[1:17] == b"\x00" * 16
    assert b"diffie-hellman-group14-sha256" in p
    assert b"aes128-ctr" in p and b"hmac-sha2-256" in p


def test_host_key_blob_roundtrip():
    pub = pki.RsaPublic(0xC0FFEE, 65537)
    blob = host_key_blob(pub)
    assert blob.startswith(b"\x00\x00\x00\x07ssh-rsa")
    back = parse_host_key_blob(blob)
    assert (back.n, back.e) == (pub.n, pub.e)


def test_key_derivation_extends():
    k1 = derive_keys(12345, b"H" * 32, b"S" * 32, "A", 16)
    k2 = derive_keys(12345, b"H" * 32, b"S" * 32, "A", 80)
    assert k2[:16] == k1 and len(k2) == 80
    assert derive_keys(12345, b"H" * 32, b"S" * 32, "B", 16) != k1


# ---------------------------------------------------------------------------
# handshake + sftp verbs
# ---------------------------------------------------------------------------


def test_auth_and_host_key_enforced(srv):
    with pytest.raises(SshError, match="authentication failed"):
        SftpClient(srv.address, srv.username, "wrong")
    c = _client(srv)
    c.close()


def test_file_verbs_multi_chunk(srv):
    c = _client(srv)
    try:
        c.mkdir("/big")
        payload = bytes(range(256)) * 500  # 128000B -> multiple READ/WRITEs
        c.write_file("/big/blob.bin", payload)
        assert c.stat("/big/blob.bin") == len(payload)
        assert c.read_file("/big/blob.bin") == payload
        assert c.listdir("/big") == [{"name": "blob.bin",
                                      "size": len(payload)}]
        c.remove("/big/blob.bin")
        assert c.stat("/big/blob.bin") is None
        with pytest.raises(SshError):
            c.read_file("/big/blob.bin")
    finally:
        c.close()


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def test_sink_then_source_roundtrip(srv, spark):
    df = spark.createDataFrame(
        [("a.json", b'{"n": 1}'), ("b.json", b'{"n": 2}')],
        "path string, value binary")
    SftpSink(srv.address, srv.username, srv.password,
             directory="/drop", path_col="path")(df, 0)
    # replay overwrites the same paths (idempotent redelivery)
    SftpSink(srv.address, srv.username, srv.password,
             directory="/drop", path_col="path")(df, 0)
    src = SftpSource(address=srv.address, username=srv.username,
                     password=srv.password, paths=["/drop"])
    rows = {r.key: bytes(r.value) for r in src.read(spark).collect()}
    assert rows == {"/drop/a.json": b'{"n": 1}', "/drop/b.json": b'{"n": 2}'}


def test_source_delete_on_finish(srv, spark):
    c = _client(srv)
    c.write_file("/once/x.txt", b"data")
    c.close()
    src = SftpSource(address=srv.address, username=srv.username,
                     password=srv.password, paths=["/once/x.txt"],
                     delete_on_finish=True)
    assert [bytes(r.value) for r in src.read(spark).collect()] == [b"data"]
    c = _client(srv)
    assert c.stat("/once/x.txt") is None
    c.close()


def test_config_wiring(srv, spark):
    from benthos_spark.config import _input, _output

    sink = _output({"sftp": {
        "address": srv.address,
        "credentials": {"username": srv.username, "password": srv.password},
        "directory": "/cfg"}})
    sink(spark.createDataFrame([("payload",)], "value string").coalesce(1), 0)
    src = _input({"sftp": {
        "address": srv.address,
        "credentials": {"username": srv.username, "password": srv.password},
        "paths": ["/cfg"], "codec": "lines"}})
    assert [bytes(r.value) for r in src.read(spark).collect()] == [b"payload"]
