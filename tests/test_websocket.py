"""RFC 6455 websocket (functions/ws.py) + the `websocket` input/output
(operators/wsio.py). Wire format pinned against the RFC's own examples;
the in-process test server is built from the same primitives (the
forward-transform validation discipline used for the image codecs)."""

from __future__ import annotations

import socket
import socketserver
import threading

import pytest

from benthos_spark.functions.ws import (
    OP_BINARY,
    OP_CLOSE,
    OP_PING,
    OP_TEXT,
    WsClient,
    accept_key,
    decode_frame,
    encode_frame,
    server_handshake,
)
from benthos_spark.operators.wsio import WebsocketSink, WebsocketSource


def test_rfc6455_accept_key_vector():
    # RFC 6455 §1.3 example
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_rfc6455_frame_examples():
    # §5.7: single-frame unmasked text "Hello"
    assert encode_frame(b"Hello", OP_TEXT) == bytes.fromhex("810548656c6c6f")
    # §5.7: single-frame masked text "Hello"
    masked = encode_frame(b"Hello", OP_TEXT, mask=bytes.fromhex("37fa213d"))
    assert masked == bytes.fromhex("818537fa213d7f9f4d5158")
    # §5.7: 256-byte binary → 16-bit extended length
    f256 = encode_frame(b"\x00" * 256, OP_BINARY)
    assert f256[:4] == bytes.fromhex("827e0100")
    # §5.7: 64 KiB binary → 64-bit extended length
    f64k = encode_frame(b"\x00" * 65536, OP_BINARY)
    assert f64k[:10] == bytes.fromhex("827f0000000000010000")


def _rt(frame: bytes):
    buf = bytearray(frame)

    def read_exact(n):
        out = bytes(buf[:n])
        del buf[:n]
        return out

    return decode_frame(read_exact)


def test_frame_roundtrip_all_lengths():
    for n in (0, 1, 125, 126, 65535, 65536, 70000):
        payload = bytes(i % 251 for i in range(n))
        op, got, fin = _rt(encode_frame(payload, OP_BINARY))
        assert (op, got, fin) == (OP_BINARY, payload, True)
        op, got, fin = _rt(encode_frame(payload, OP_BINARY, mask=b"\x12\x34\x56\x78"))
        assert (op, got, fin) == (OP_BINARY, payload, True)


@pytest.fixture()
def echo_ws():
    """Echo server on our own primitives: upper-cases text frames,
    pings once mid-stream, serves a 3-message feed on /feed."""

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                path = server_handshake(self.request)
            except Exception:
                return
            read_exact = _reader(self.request)
            if path == "/feed":
                for m in (b"w1", b"w2", b"w3"):
                    self.request.sendall(encode_frame(m, OP_TEXT))
                self.request.sendall(encode_frame(b"\x03\xe8", OP_CLOSE))
                return
            self.request.sendall(encode_frame(b"hb", OP_PING))
            while True:
                try:
                    op, payload, fin = decode_frame(read_exact)
                except Exception:
                    return
                if op == OP_CLOSE:
                    self.request.sendall(encode_frame(payload[:2], OP_CLOSE))
                    return
                if op in (OP_TEXT, OP_BINARY):
                    out = payload.upper() if op == OP_TEXT else payload
                    self.request.sendall(encode_frame(out, op))

    def _reader(sock):
        def read_exact(n):
            buf = b""
            while len(buf) < n:
                chunk = sock.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            return buf

        return read_exact

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"ws://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_ws_client_echo_and_ping(echo_ws):
    c = WsClient(echo_ws + "/echo").connect()
    c.send("hello")
    # the server pinged first — recv must answer it transparently
    assert c.recv() == (OP_TEXT, b"HELLO")
    c.send(b"\x01\x02", opcode=OP_BINARY)
    assert c.recv() == (OP_BINARY, b"\x01\x02")
    c.close()


def test_websocket_source(spark, echo_ws):
    src = WebsocketSource(url=echo_ws + "/feed")
    rows = sorted(r.value for r in src.read(spark).collect())
    assert rows == ["w1", "w2", "w3"]
    # open_message + max_messages bound against the echo endpoint
    src2 = WebsocketSource(url=echo_ws + "/echo", open_message="hi", max_messages=1)
    assert [r.value for r in src2.read(spark).collect()] == ["HI"]
    with pytest.raises(ValueError):
        WebsocketSource()


def test_websocket_sink(spark, tmp_path):
    got = []
    done = threading.Event()

    class Collector(socketserver.BaseRequestHandler):
        def handle(self):
            server_handshake(self.request)

            def read_exact(n):
                buf = b""
                while len(buf) < n:
                    chunk = self.request.recv(n - len(buf))
                    if not chunk:
                        raise ConnectionError("closed")
                    buf += chunk
                return buf

            while True:
                try:
                    op, payload, fin = decode_frame(read_exact)
                except Exception:
                    return
                if op == OP_CLOSE:
                    self.request.sendall(encode_frame(payload[:2], OP_CLOSE))
                    if len(got) >= 3:
                        done.set()
                    return
                got.append(payload)

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Collector)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"ws://127.0.0.1:{srv.server_address[1]}/in"
    df = spark.createDataFrame([("m1",), ("m2",), ("m3",)], "value string").coalesce(1)
    WebsocketSink(url=url)(df, batch_id=0)
    done.wait(10)
    assert sorted(got) == [b"m1", b"m2", b"m3"]
    srv.shutdown()
    srv.server_close()


def test_config_wiring(spark, echo_ws):
    from benthos_spark.config import _input, _output

    src = _input({"websocket": {"url": echo_ws + "/feed"}})
    assert sorted(r.value for r in src.read(spark).collect()) == ["w1", "w2", "w3"]
    assert _output({"websocket": {"url": echo_ws + "/echo"}}) is not None
