"""zmq4 / nanomsg connectors over the from-scratch ZMTP 3.0 and SP
wire codecs (functions/zmtp.py, operators/zmqio.py). Wire shapes are
pinned against the published specs (ZMTP greeting/READY bytes from
rfc.zeromq.org/spec/23; SP protocol numbers from the sp-tcp-mapping
RFC), so the two ends aren't merely tested against each other."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import zmtp as Z
from benthos_spark.operators.zmqio import (NanomsgSink, NanomsgSource,
                                           ZmqSink, ZmqSource)


# ---------------------------------------------------------------------------
# wire pins
# ---------------------------------------------------------------------------


def test_zmtp_greeting_spec_bytes():
    g = Z.zmtp_greeting()
    assert len(g) == 64
    assert g[0] == 0xFF and g[9] == 0x7F          # signature frame
    assert g[10:12] == b"\x03\x00"                 # version 3.0
    assert g[12:32] == b"NULL" + b"\x00" * 16      # mechanism, padded
    assert g[32] == 0                               # as-server


def test_zmtp_ready_command_encoding():
    f = Z.zmtp_ready("PUSH")
    # command frame: flags=0x04, size, then \x05READY + metadata
    assert f[0] == 0x04
    body = f[2:]
    assert body[:6] == b"\x05READY"
    meta = Z.parse_ready(body)
    assert meta["socket-type"] == b"PUSH"


def test_zmtp_frame_encoding_short_and_long():
    assert Z.encode_frame(b"abc") == b"\x00\x03abc"
    assert Z.encode_frame(b"abc", more=True)[0] == 0x01
    long = Z.encode_frame(b"x" * 300)
    assert long[0] == 0x02 and long[1:9] == (300).to_bytes(8, "big")


def test_sp_protocol_numbers_pinned():
    # nanomsg: protocol number = 16*family + role
    assert Z.SP_PROTO == {"PAIR": 16, "PUB": 32, "SUB": 33, "REQ": 48,
                          "REP": 49, "PUSH": 80, "PULL": 81}
    assert Z.sp_header("PULL") == b"\x00SP\x00\x00\x51\x00\x00"


def test_zmtp_incompatible_socket_types_rejected():
    lst = Z.ZmtpListener("127.0.0.1:0", "PULL")
    try:
        with pytest.raises(ConnectionError):
            Z.zmtp_connect(lst.address, "SUB")  # SUB cannot talk to PULL
    finally:
        lst.close()


def test_sp_incompatible_rejected():
    lst = Z.SpListener("127.0.0.1:0", "PULL")
    try:
        with pytest.raises(ConnectionError):
            Z.sp_connect(lst.address, "PUB")
    finally:
        lst.close()


def test_zmtp_pub_prefix_filtering():
    got: list[bytes] = []
    lst = Z.ZmtpListener("127.0.0.1:0", "PUB")
    try:
        sub = Z.zmtp_connect(lst.address, "SUB")
        sub.subscribe(b"topic.a")
        deadline = time.monotonic() + 5
        while lst.peer_count() < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        time.sleep(0.1)  # let the subscription frame land
        lst.publish([b"topic.a hit"])
        lst.publish([b"topic.b miss"])
        lst.publish([b"topic.a again"])
        got.append(b"".join(sub.recv_message()))
        got.append(b"".join(sub.recv_message()))
        assert got == [b"topic.a hit", b"topic.a again"]
        sub.close()
    finally:
        lst.close()


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def _wait_peers(end, n: int) -> None:
    deadline = time.monotonic() + 10
    while end.peer_count() < n:
        assert time.monotonic() < deadline, "peer never connected"
        time.sleep(0.01)


def test_zmq_push_to_bound_pull_input(spark, tmp_path):
    src = ZmqSource(urls=["tcp://127.0.0.1:0"], socket_type="PULL",
                    spool_dir=str(tmp_path / "spool")).start()
    try:
        sink = ZmqSink(urls=src.urls, socket_type="PUSH")
        df = spark.range(8).select(F.concat(F.lit("z-"), F.col("id")).alias("value"))
        sink(df, 0)
        deadline = time.monotonic() + 10
        while True:
            out = sorted(r.value for r in src.read(spark).collect())
            if len(out) == 8 or time.monotonic() > deadline:
                break
        assert out == sorted(f"z-{i}" for i in range(8))
    finally:
        src.stop()


def test_zmq_bound_pub_output_to_sub_input(spark, tmp_path):
    sink = ZmqSink(urls=["tcp://127.0.0.1:0"], socket_type="PUB", bind=True)
    src = ZmqSource(urls=sink.urls, socket_type="SUB", bind=False,
                    sub_filters=["keep."],
                    spool_dir=str(tmp_path / "spool")).start()
    try:
        _wait_peers(sink, 1)
        time.sleep(0.1)
        df = spark.createDataFrame(
            [("keep.one",), ("drop.two",), ("keep.three",)], "value string")
        sink(df, 0)
        deadline = time.monotonic() + 10
        while True:
            out = sorted(r.value for r in src.read(spark).collect())
            if len(out) == 2 or time.monotonic() > deadline:
                break
        assert out == ["keep.one", "keep.three"]
    finally:
        src.stop()


def test_nanomsg_push_pull_roundtrip(spark, tmp_path):
    src = NanomsgSource(urls=["tcp://127.0.0.1:0"], socket_type="PULL",
                        spool_dir=str(tmp_path / "spool")).start()
    try:
        sink = NanomsgSink(urls=src.urls, socket_type="PUSH")
        df = spark.range(6).select(F.concat(F.lit("n-"), F.col("id")).alias("value"))
        sink(df, 0)
        deadline = time.monotonic() + 10
        while True:
            out = sorted(r.value for r in src.read(spark).collect())
            if len(out) == 6 or time.monotonic() > deadline:
                break
        assert out == sorted(f"n-{i}" for i in range(6))
    finally:
        src.stop()


def test_nanomsg_sub_client_side_filter(spark, tmp_path):
    sink = NanomsgSink(urls=["tcp://127.0.0.1:0"], socket_type="PUB", bind=True)
    src = NanomsgSource(urls=sink.urls, socket_type="SUB", bind=False,
                        sub_filters=["a."],
                        spool_dir=str(tmp_path / "spool")).start()
    try:
        _wait_peers(sink, 1)
        df = spark.createDataFrame([("a.x",), ("b.y",)], "value string")
        sink(df, 0)
        deadline = time.monotonic() + 10
        while True:
            out = [r.value for r in src.read(spark).collect()]
            if out == ["a.x"] or time.monotonic() > deadline:
                break
        assert out == ["a.x"]
    finally:
        src.stop()


def test_config_wiring(spark, tmp_path):
    from benthos_spark.config import _input, _output

    src = _input({"zmq4": {"urls": ["tcp://127.0.0.1:0"],
                           "socket_type": "PULL",
                           "spool_dir": str(tmp_path / "s1")}})
    src.start()
    try:
        sink = _output({"zmq4": {"urls": src.urls, "socket_type": "PUSH"}})
        sink(spark.createDataFrame([("cfg",)], "value string"), 0)
        deadline = time.monotonic() + 10
        while True:
            out = [r.value for r in src.read(spark).collect()]
            if out == ["cfg"] or time.monotonic() > deadline:
                break
        assert out == ["cfg"]
    finally:
        src.stop()
