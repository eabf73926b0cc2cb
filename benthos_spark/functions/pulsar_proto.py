"""Apache Pulsar binary protocol — a from-scratch client + in-process
single-broker implementation of the subset the `pulsar` connectors
need, off the public protocol spec (pulsar.apache.org/docs/develop-
binary-protocol) and the published PulsarApi.proto message layout:

- framing: ``[totalSize u32 BE][commandSize u32 BE][BaseCommand]``,
  and for SEND / MESSAGE payload frames the command is followed by
  ``[magic 0x0E01][crc32c u32 BE][metadataSize u32][MessageMetadata]
  [payload]`` with the CRC32C (Castagnoli — shared with the Kafka
  stack's slicing-by-8 implementation) computed over everything AFTER
  the checksum field.
- commands: CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS, SEND/
  SEND_RECEIPT, SUBSCRIBE/SUCCESS, FLOW, MESSAGE, ACK, PING/PONG.

The BaseCommand envelope is encoded with the repo's own .proto
compiler (functions/protobuf.py) over the embedded subset below —
field numbers follow the published PulsarApi.proto (BaseCommand's enum
values intentionally equal its field numbers in the upstream file).
The reference embeds the Apache Pulsar Go client
(internal/impl/pulsar/input.go:22, output.go:24); its consumer is a
SUBSCRIBE + FLOW + ACK queue consumer and its producer a
PRODUCER + SEND pipeline — the same verbs implemented here.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Callable, Optional

from benthos_spark.functions.kafka_proto import crc32c
from benthos_spark.functions.protobuf import (FileSet, decode_message,
                                              encode_message, parse_proto)

MAGIC_CRC32C = b"\x0e\x01"

# The PulsarApi.proto subset (field numbers per the published file).
PULSAR_PROTO = """
syntax = "proto2";
package pulsar.proto;

message MessageIdData {
    required uint64 ledgerId = 1;
    required uint64 entryId = 2;
    optional int32 partition = 3;
    optional int32 batch_index = 4;
}

message KeyValue {
    required string key = 1;
    required string value = 2;
}

message MessageMetadata {
    required string producer_name = 1;
    required uint64 sequence_id = 2;
    required uint64 publish_time = 3;
    repeated KeyValue properties = 4;
    optional string partition_key = 11;
    optional uint64 event_time = 12;
}

message CommandConnect {
    required string client_version = 1;
    optional string auth_method_name = 5;
    optional bytes auth_data = 3;
    optional int32 protocol_version = 4;
}

message CommandConnected {
    required string server_version = 1;
    optional int32 protocol_version = 2;
}

message CommandSubscribe {
    required string topic = 1;
    required string subscription = 2;
    required uint32 subType = 3;
    required uint64 consumer_id = 4;
    required uint64 request_id = 5;
    optional string consumer_name = 6;
    optional uint32 initialPosition = 13;
}

message CommandFlow {
    required uint64 consumer_id = 1;
    required uint32 messagePermits = 2;
}

message CommandMessage {
    required uint64 consumer_id = 1;
    required MessageIdData message_id = 2;
    optional uint32 redelivery_count = 3;
}

message CommandAck {
    required uint64 consumer_id = 1;
    required uint32 ack_type = 2;
    repeated MessageIdData message_id = 3;
}

message CommandProducer {
    required string topic = 1;
    required uint64 producer_id = 2;
    required uint64 request_id = 3;
    optional string producer_name = 4;
}

message CommandProducerSuccess {
    required uint64 request_id = 1;
    required string producer_name = 2;
}

message CommandSend {
    required uint64 producer_id = 1;
    required uint64 sequence_id = 2;
    optional int32 num_messages = 3;
}

message CommandSendReceipt {
    required uint64 producer_id = 1;
    required uint64 sequence_id = 2;
    optional MessageIdData message_id = 3;
}

message CommandSuccess {
    required uint64 request_id = 1;
}

message CommandError {
    required uint64 request_id = 1;
    required uint32 error = 2;
    required string message = 3;
}

message CommandPing {}
message CommandPong {}

message BaseCommand {
    required uint32 type = 1;
    optional CommandConnect connect = 2;
    optional CommandConnected connected = 3;
    optional CommandSubscribe subscribe = 4;
    optional CommandProducer producer = 5;
    optional CommandSend send = 6;
    optional CommandSendReceipt send_receipt = 7;
    optional CommandMessage message = 9;
    optional CommandAck ack = 10;
    optional CommandFlow flow = 11;
    optional CommandSuccess success = 13;
    optional CommandError error = 14;
    optional CommandProducerSuccess producer_success = 17;
    optional CommandPing ping = 18;
    optional CommandPong pong = 19;
}
"""

# BaseCommand.Type values (== the envelope field numbers upstream)
T_CONNECT, T_CONNECTED = 2, 3
T_SUBSCRIBE, T_PRODUCER, T_SEND, T_SEND_RECEIPT = 4, 5, 6, 7
T_MESSAGE, T_ACK, T_FLOW = 9, 10, 11
T_SUCCESS, T_ERROR, T_PRODUCER_SUCCESS = 13, 14, 17
T_PING, T_PONG = 18, 19

_FS: Optional[FileSet] = None


def _fs() -> FileSet:
    global _FS
    if _FS is None:
        _FS = parse_proto(PULSAR_PROTO)
    return _FS


def encode_command(cmd: dict) -> bytes:
    body = encode_message(cmd, "pulsar.proto.BaseCommand", _fs())
    return struct.pack(">II", 4 + len(body), len(body)) + body


def encode_payload_command(cmd: dict, metadata: dict, payload: bytes) -> bytes:
    body = encode_message(cmd, "pulsar.proto.BaseCommand", _fs())
    meta = encode_message(metadata, "pulsar.proto.MessageMetadata", _fs())
    after_crc = struct.pack(">I", len(meta)) + meta + payload
    tail = MAGIC_CRC32C + struct.pack(">I", crc32c(after_crc)) + after_crc
    total = 4 + len(body) + len(tail)
    return struct.pack(">II", total, len(body)) + body + tail


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_command(sock: socket.socket) -> tuple[dict, Optional[dict], bytes]:
    """Read one frame -> (BaseCommand dict, MessageMetadata | None,
    payload bytes). Verifies the CRC32C on payload frames."""
    total = struct.unpack(">I", _read_exact(sock, 4))[0]
    frame = _read_exact(sock, total)
    cmd_size = struct.unpack(">I", frame[:4])[0]
    cmd = decode_message(frame[4:4 + cmd_size], "pulsar.proto.BaseCommand", _fs())
    rest = frame[4 + cmd_size:]
    if not rest:
        return cmd, None, b""
    if rest[:2] != MAGIC_CRC32C:
        raise ConnectionError(f"bad payload magic {rest[:2]!r}")
    crc = struct.unpack(">I", rest[2:6])[0]
    after = rest[6:]
    if crc32c(after) != crc:
        raise ConnectionError("payload CRC32C mismatch")
    meta_size = struct.unpack(">I", after[:4])[0]
    meta = decode_message(after[4:4 + meta_size],
                          "pulsar.proto.MessageMetadata", _fs())
    return cmd, meta, after[4 + meta_size:]


class PulsarClient:
    """Single-connection client: one producer or one consumer."""

    def __init__(self, url: str, timeout_s: float = 30.0):
        a = url
        for scheme in ("pulsar://", "tcp://"):
            if a.startswith(scheme):
                a = a[len(scheme):]
        host, _, port = a.rpartition(":")
        self.sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                             timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._req = 0
        self.sock.sendall(encode_command({
            "type": T_CONNECT,
            "connect": {"clientVersion": "benthos-spark", "protocolVersion": 15}}))
        cmd, _, _ = read_command(self.sock)
        if cmd["type"] != T_CONNECTED:
            raise ConnectionError(f"expected CONNECTED, got {cmd}")

    def _next_req(self) -> int:
        self._req += 1
        return self._req

    # -- producer -----------------------------------------------------------
    def create_producer(self, topic: str, producer_id: int = 1) -> str:
        self.sock.sendall(encode_command({
            "type": T_PRODUCER,
            "producer": {"topic": topic, "producerId": producer_id,
                         "requestId": self._next_req()}}))
        cmd, _, _ = read_command(self.sock)
        if cmd["type"] != T_PRODUCER_SUCCESS:
            raise ConnectionError(f"producer rejected: {cmd}")
        self._producer_id = producer_id
        self._producer_name = cmd["producerSuccess"]["producerName"]
        self._seq = 0
        return self._producer_name

    def send(self, payload: bytes, partition_key: Optional[str] = None,
             properties: Optional[dict] = None) -> dict:
        seq = self._seq
        self._seq += 1
        meta: dict[str, Any] = {"producerName": self._producer_name,
                                "sequenceId": seq, "publishTime": 0}
        if partition_key is not None:
            meta["partitionKey"] = partition_key
        if properties:
            meta["properties"] = [{"key": k, "value": v}
                                  for k, v in sorted(properties.items())]
        self.sock.sendall(encode_payload_command(
            {"type": T_SEND,
             "send": {"producerId": self._producer_id, "sequenceId": seq}},
            meta, payload))
        cmd, _, _ = read_command(self.sock)
        if cmd["type"] != T_SEND_RECEIPT:
            raise ConnectionError(f"expected SEND_RECEIPT, got {cmd}")
        return cmd["sendReceipt"]["messageId"]

    # -- consumer -----------------------------------------------------------
    def subscribe(self, topic: str, subscription: str,
                  sub_type: int = 1, initial_position: int = 1,
                  consumer_id: int = 1) -> None:
        """sub_type: 0 Exclusive | 1 Shared; initial_position: 0 Latest
        | 1 Earliest."""
        self.sock.sendall(encode_command({
            "type": T_SUBSCRIBE,
            "subscribe": {"topic": topic, "subscription": subscription,
                          "subType": sub_type, "consumerId": consumer_id,
                          "requestId": self._next_req(),
                          "initialPosition": initial_position}}))
        cmd, _, _ = read_command(self.sock)
        if cmd["type"] != T_SUCCESS:
            raise ConnectionError(f"subscribe rejected: {cmd}")
        self._consumer_id = consumer_id

    def flow(self, permits: int = 100) -> None:
        self.sock.sendall(encode_command({
            "type": T_FLOW,
            "flow": {"consumerId": self._consumer_id,
                     "messagePermits": permits}}))

    def receive(self, timeout_s: Optional[float] = None) -> Optional[dict]:
        """One MESSAGE -> {"message_id", "payload", "properties",
        "partition_key"}; None on timeout."""
        if timeout_s is not None:
            self.sock.settimeout(timeout_s)
        try:
            cmd, meta, payload = read_command(self.sock)
        except socket.timeout:
            return None
        finally:
            if timeout_s is not None:
                self.sock.settimeout(30.0)
        if cmd["type"] == T_PING:
            self.sock.sendall(encode_command({"type": T_PONG, "pong": {}}))
            return self.receive(timeout_s)
        if cmd["type"] != T_MESSAGE:
            raise ConnectionError(f"expected MESSAGE, got {cmd}")
        props = {kv["key"]: kv["value"]
                 for kv in (meta or {}).get("properties", [])}
        return {"message_id": cmd["message"]["messageId"],
                "payload": payload, "properties": props,
                "partition_key": (meta or {}).get("partitionKey")}

    def ack(self, message_id: dict) -> None:
        self.sock.sendall(encode_command({
            "type": T_ACK,
            "ack": {"consumerId": self._consumer_id, "ackType": 0,
                    "messageId": [message_id]}}))

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class MiniPulsarBroker:
    """Single-node loopback broker: topics are entry logs; a
    subscription is a durable cursor + unacked set shared by its
    consumers (Shared) or owned by one (Exclusive). Redelivery on
    consumer disconnect with unacked messages — the at-least-once
    contract the reference's input relies on."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.topics: dict[str, list[tuple[dict, bytes]]] = {}
        # subscriptions[(topic, name)] = {"cursor": int, "unacked": {entry: meta/payload}}
        self.subs: dict[tuple[str, str], dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._producer_seq = 0

    def start(self) -> "MiniPulsarBroker":
        self._srv = socket.create_server((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    @property
    def url(self) -> str:
        return f"pulsar://{self.host}:{self.port}"

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
        state: dict[str, Any] = {"consumer": None, "permits": 0,
                                 "delivered": set(), "sock": sock,
                                 "send_lock": threading.Lock()}
        try:
            while not self._stop.is_set():
                cmd, meta, payload = read_command(sock)
                self._dispatch(sock, state, cmd, meta, payload)
                self._maybe_deliver(state)
        except (ConnectionError, OSError):
            pass
        finally:
            # redeliver this consumer's unacked messages
            con = state.get("consumer")
            if con is not None:
                with self._lock:
                    sub = self.subs.get(con)
                    if sub is not None:
                        if state in sub["consumers"]:
                            sub["consumers"].remove(state)
                        for entry in sorted(state["delivered"]):
                            if entry in sub["unacked"]:
                                sub["unacked"].pop(entry)
                                sub["ready"].insert(0, entry)
            try:
                sock.close()
            except OSError:
                pass

    def _dispatch(self, sock, state, cmd: dict, meta, payload: bytes) -> None:
        t = cmd["type"]
        if t == T_CONNECT:
            sock.sendall(encode_command({
                "type": T_CONNECTED,
                "connected": {"serverVersion": "mini-pulsar",
                              "protocolVersion": 15}}))
        elif t == T_PRODUCER:
            p = cmd["producer"]
            with self._lock:
                self.topics.setdefault(p["topic"], [])
                self._producer_seq += 1
                name = p.get("producerName") or f"producer-{self._producer_seq}"
                state["produce_topic"] = p["topic"]
            sock.sendall(encode_command({
                "type": T_PRODUCER_SUCCESS,
                "producerSuccess": {"requestId": p["requestId"],
                                    "producerName": name}}))
        elif t == T_SEND:
            s = cmd["send"]
            wake: list[dict] = []
            with self._lock:
                log = self.topics[state["produce_topic"]]
                entry = len(log)
                log.append((meta or {}, payload))
                for (topic, _), sub in self.subs.items():
                    if topic == state["produce_topic"]:
                        sub["ready"].append(entry)
                        wake.extend(sub["consumers"])
            sock.sendall(encode_command({
                "type": T_SEND_RECEIPT,
                "sendReceipt": {"producerId": s["producerId"],
                                "sequenceId": s["sequenceId"],
                                "messageId": {"ledgerId": 0, "entryId": entry}}}))
            for consumer_state in wake:  # cross-connection delivery
                self._maybe_deliver(consumer_state)
        elif t == T_SUBSCRIBE:
            s = cmd["subscribe"]
            key = (s["topic"], s["subscription"])
            with self._lock:
                self.topics.setdefault(s["topic"], [])
                if key not in self.subs:
                    start = (0 if s.get("initialPosition", 0) == 1
                             else len(self.topics[s["topic"]]))
                    self.subs[key] = {
                        "ready": list(range(start, len(self.topics[s["topic"]]))),
                        "unacked": {}, "consumers": []}
                state["consumer"] = key
                state["consumer_id"] = s["consumerId"]
                self.subs[key]["consumers"].append(state)
            sock.sendall(encode_command({
                "type": T_SUCCESS, "success": {"requestId": s["requestId"]}}))
        elif t == T_FLOW:
            state["permits"] += cmd["flow"]["messagePermits"]
        elif t == T_ACK:
            with self._lock:
                sub = self.subs[state["consumer"]]
                for mid in cmd["ack"]["messageId"]:
                    sub["unacked"].pop(mid["entryId"], None)
                    state["delivered"].discard(mid["entryId"])
        elif t == T_PONG:
            pass
        else:
            sock.sendall(encode_command({
                "type": T_ERROR,
                "error": {"requestId": 0, "error": 0,
                          "message": f"unsupported type {t}"}}))

    def _maybe_deliver(self, state) -> None:
        con = state.get("consumer")
        if con is None:
            return
        with state["send_lock"]:  # one writer per consumer socket
            while state["permits"] > 0:
                with self._lock:
                    sub = self.subs[con]
                    if not sub["ready"]:
                        return
                    entry = sub["ready"].pop(0)
                    meta, payload = self.topics[con[0]][entry]
                    sub["unacked"][entry] = True
                    state["delivered"].add(entry)
                    state["permits"] -= 1
                state["sock"].sendall(encode_payload_command(
                    {"type": T_MESSAGE,
                     "message": {"consumerId": state["consumer_id"],
                                 "messageId": {"ledgerId": 0, "entryId": entry}}},
                    meta or {"producerName": "?", "sequenceId": 0,
                             "publishTime": 0},
                    payload))
