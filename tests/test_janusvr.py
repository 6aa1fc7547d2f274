"""janusvrwebrtcsink/src against a mock Janus VideoRoom gateway
(reference net/webrtc janusvr signaller; JSON-over-WS protocol:
create/attach/join/publish/subscribe/trickle/detach)."""

import json
import socket
import threading

import pytest

from gstpu import Buffer, State
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.net.webrtc.signalling import ws_recv, ws_send


class MockJanus:
    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(2)
        self.port = self.sock.getsockname()[1]
        self.log = []
        self.next_id = 1000
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._client, args=(conn,),
                             daemon=True).start()

    def _client(self, conn):
        data = b""
        while b"\r\n\r\n" not in data:
            c = conn.recv(1)
            if not c:
                return
            data += c
        import base64
        import hashlib
        key = [l.split(b":", 1)[1].strip() for l in data.split(b"\r\n")
               if l.lower().startswith(b"sec-websocket-key")][0]
        accept = base64.b64encode(hashlib.sha1(
            key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
        conn.sendall(b"HTTP/1.1 101 Switching Protocols\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Protocol: janus-protocol\r\n"
                     b"Sec-WebSocket-Accept: " + accept + b"\r\n\r\n")
        while True:
            raw = ws_recv(conn)
            if raw is None:
                return
            msg = json.loads(raw)
            self.log.append(msg)
            self._dispatch(conn, msg)

    def _reply(self, conn, msg, **extra):
        out = {"transaction": msg.get("transaction")}
        out.update(extra)
        ws_send(conn, json.dumps(out).encode())

    def _dispatch(self, conn, msg):
        j = msg.get("janus")
        if j in ("create", "attach"):
            self.next_id += 1
            self._reply(conn, msg, janus="success",
                        data={"id": self.next_id})
        elif j == "message":
            body = msg.get("body", {})
            req = body.get("request")
            if req == "join" and body.get("ptype") == "publisher":
                self._reply(conn, msg, janus="event",
                            plugindata={"plugin":
                                        "janus.plugin.videoroom",
                                        "data": {"videoroom": "joined",
                                                 "room": body["room"],
                                                 "id": 42}})
            elif req == "join" and body.get("ptype") == "subscriber":
                offer = ("v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\n"
                         "s=janus\r\nt=0 0\r\n"
                         "m=audio 9 UDP/TLS/RTP/SAVPF 111\r\n"
                         "a=rtpmap:111 OPUS/48000\r\na=sendonly\r\n")
                self._reply(conn, msg, janus="event",
                            plugindata={"data":
                                        {"videoroom": "attached"}},
                            jsep={"type": "offer", "sdp": offer})
            elif req == "publish":
                sdp = msg["jsep"]["sdp"]
                answer = sdp.replace("a=sendonly", "a=recvonly")
                self._reply(conn, msg, janus="event",
                            plugindata={"data":
                                        {"configured": "ok"}},
                            jsep={"type": "answer", "sdp": answer})
            elif req == "start":
                self._reply(conn, msg, janus="event",
                            plugindata={"data": {"started": "ok"}})
        elif j in ("trickle", "keepalive", "detach", "destroy"):
            self._reply(conn, msg, janus="ack")


def test_janusvr_sink_publishes():
    mock = MockJanus()
    sink = make("janusvrwebrtcsink")
    sink.janus_endpoint = f"ws://127.0.0.1:{mock.port}/janus"
    sink.room_id = 77
    sink.display_name = "gstpu-pub"

    pad = sink.request_pad("sink_0")
    sink.set_state(State.PLAYING)
    from gstpu.core.caps import parse_caps
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    pad.send_event(StreamStartEvent("t"))
    pad.send_event(CapsEvent(parse_caps(
        "audio/x-raw, format=S16LE, rate=48000, channels=2, "
        "layout=interleaved")))
    pad.send_event(SegmentEvent(Segment()))

    assert sink.published_feed == 42
    kinds = [(m.get("janus"), m.get("body", {}).get("request"))
             for m in mock.log]
    assert ("create", None) in kinds
    assert ("attach", None) in kinds
    assert ("message", "join") in kinds
    assert ("message", "publish") in kinds
    publish = next(m for m in mock.log
                   if m.get("body", {}).get("request") == "publish")
    assert publish["jsep"]["type"] == "offer"
    assert "m=audio" in publish["jsep"]["sdp"]
    # a session src pad exists for the Janus peer
    assert any(p.startswith("session_janus-42") for p in sink.pads)
    sink.set_state(State.NULL)


def test_janusvr_src_subscribes():
    mock = MockJanus()
    src = make("janusvrwebrtcsrc")
    src.janus_endpoint = f"ws://127.0.0.1:{mock.port}/janus"
    src.room_id = 77
    src.feed_id = 42
    src.connect_janus()
    assert src.subscribed
    start = next(m for m in mock.log
                 if m.get("body", {}).get("request") == "start")
    assert start["jsep"]["type"] == "answer"
    assert "a=recvonly" in start["jsep"]["sdp"]
