"""snowflake_put over the from-scratch keypair-JWT + Snowpipe stack
(functions/snowflake_proto.py, operators/snowflake.py). The mini
server verifies the RS256 JWT — signature recomputed over our own RSA,
issuer checked against the SHA256 public-key fingerprint the published
auth scheme mandates."""

from __future__ import annotations

import gzip
import random

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import pki
from benthos_spark.functions.snowflake_proto import (MiniSnowflakeServer,
                                                     SnowflakeClient,
                                                     key_fingerprint,
                                                     make_jwt, rsa_spki_der,
                                                     verify_jwt)
from benthos_spark.operators.snowflake import SnowflakePutSink


def _miller_rabin(n: int, rng: random.Random, rounds: int = 24) -> bool:
    if n % 2 == 0:
        return False
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
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


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _miller_rabin(c, rng):
            return c


@pytest.fixture(scope="module")
def keypair():
    rng = random.Random(7)
    p, q = _gen_prime(512, rng), _gen_prime(512, rng)
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return pki.RsaPrivate(n, e, d), pki.RsaPublic(n, e)


@pytest.fixture()
def sf(keypair):
    _, pub = keypair
    srv = MiniSnowflakeServer(public_key=pub).start()
    yield srv
    srv.stop()


def test_spki_der_shape(keypair):
    _, pub = keypair
    der = rsa_spki_der(pub)
    # SEQUENCE { AlgorithmIdentifier{rsaEncryption, NULL}, BIT STRING }
    assert der[0] == 0x30
    assert bytes.fromhex("06092a864886f70d010101") in der  # rsaEncryption OID
    assert key_fingerprint(pub).startswith("SHA256:")


def test_jwt_roundtrip_and_rejections(keypair):
    priv, pub = keypair
    tok = make_jwt("acct", "worker", priv)
    assert verify_jwt(tok, "acct", "worker", pub)
    assert not verify_jwt(tok, "acct", "other", pub)       # wrong sub
    assert not verify_jwt(tok + "x", "acct", "worker", pub)  # bad sig
    expired = make_jwt("acct", "worker", priv, lifetime_s=-120)
    assert not verify_jwt(expired, "acct", "worker", pub)


def test_server_rejects_foreign_key(sf):
    rng = random.Random(99)
    p, q = _gen_prime(512, rng), _gen_prime(512, rng)
    n = p * q
    d = pow(65537, -1, (p - 1) * (q - 1))
    rogue = SnowflakeClient(sf.endpoint, sf.account, sf.user,
                            pki.RsaPrivate(n, 65537, d))
    with pytest.raises(IOError):
        rogue.put_stage_file("s", "f", b"x")


def test_stage_put_and_snowpipe(sf, keypair):
    priv, _ = keypair
    c = SnowflakeClient(sf.endpoint, sf.account, sf.user, priv)
    c.put_stage_file("@%BENTHOS_TBL", "a/one.json", b"r1\nr2")
    out = c.insert_files("BENTHOS_PIPE", ["a/one.json", "a/missing.json"])
    assert out["responseCode"] == "SUCCESS"
    report = c.insert_report("BENTHOS_PIPE")
    assert [(f["path"], f["status"], f.get("rowsInserted", 0))
            for f in report] == [("a/one.json", "LOADED", 2),
                                 ("a/missing.json", "LOAD_FAILED", 0)]


def test_put_sink_gzip_and_replay_idempotent(sf, keypair, spark):
    priv, _ = keypair
    df = spark.range(10).select(
        F.to_json(F.struct(F.col("id").alias("n"))).alias("value")
    ).repartition(2)
    sink = SnowflakePutSink(sf.endpoint, sf.account, sf.user,
                            private_key=priv, stage="@%T", path="load",
                            snowpipe="PIPE")
    sink(df, 3)
    files = sf.stages["%T"]
    assert all(name.startswith("load/00000003-") and name.endswith(".json.gz")
               for name in files)
    rows = []
    for data in files.values():
        rows.extend(gzip.decompress(data).decode().split("\n"))
    assert len(rows) == 10
    report1 = {f["path"] for f in sf.pipes["PIPE"]}
    assert report1 == set(files)
    sink(df, 3)  # replay: same deterministic names overwrite in place
    assert set(sf.stages["%T"]) == set(files)


def test_compression_none(sf, keypair, spark):
    priv, _ = keypair
    df = spark.createDataFrame([("plain",)], "value string").coalesce(1)
    SnowflakePutSink(sf.endpoint, sf.account, sf.user, private_key=priv,
                     stage="raw", path="p", compression="NONE")(df, 0)
    (name, data), = sf.stages["raw"].items()
    assert name.endswith(".json") and data == b"plain"


def test_config_wiring(sf, keypair, spark):
    from benthos_spark.config import _output

    priv, _ = keypair
    sink = _output({"snowflake_put": {
        "endpoint": sf.endpoint, "account": sf.account, "user": sf.user,
        "private_key_obj": priv, "stage": "cfg", "path": "x",
        "compression": "NONE"}})
    sink(spark.createDataFrame([("v",)], "value string").coalesce(1), 0)
    assert list(sf.stages["cfg"].values()) == [b"v"]
