"""uepswebrtcsink against a mock UE Pixel Streaming (cirrus)
signalling server (reference net/webrtc/src/ue_ps_signaller)."""

import json
import socket
import threading
import time

from gstpu import State
from gstpu.core.registry import make
from gstpu.net.webrtc.signalling import ws_recv, ws_send


class MockCirrus:
    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.log = []
        self.conn = None
        threading.Thread(target=self._run, daemon=True).start()

    def send(self, msg):
        ws_send(self.conn, json.dumps(msg).encode())

    def _run(self):
        conn, _ = self.sock.accept()
        self.conn = conn
        data = b""
        while b"\r\n\r\n" not in data:
            c = conn.recv(1)
            if not c:
                return
            data += c
        import base64
        import hashlib
        key = [l.split(b":", 1)[1].strip()
               for l in data.split(b"\r\n")
               if l.lower().startswith(b"sec-websocket-key")][0]
        acc = base64.b64encode(hashlib.sha1(
            key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
        conn.sendall(b"HTTP/1.1 101 Switching Protocols\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Accept: " + acc + b"\r\n\r\n")
        # UE handshake: config then identify
        self.send({"type": "config",
                   "peerConnectionOptions": {}})
        self.send({"type": "identify"})
        while True:
            raw = ws_recv(conn)
            if raw is None:
                return
            msg = json.loads(raw)
            self.log.append(msg)
            if msg.get("type") == "endpointId":
                self.send({"type": "endpointIdConfirm",
                           "committedId": msg["id"]})


def _wait(cond, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_ueps_streamer_serves_player():
    mock = MockCirrus()
    sink = make("uepswebrtcsink")
    sink.uri = f"ws://127.0.0.1:{mock.port}/"
    sink.streamer_id = "tpu-streamer"
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

    assert _wait(lambda: sink.identified)
    ids = [m for m in mock.log if m.get("type") == "endpointId"]
    assert ids and ids[0]["id"] == "tpu-streamer"

    # player joins -> offer must arrive
    mock.send({"type": "playerConnected", "playerId": "101",
               "dataChannel": True, "sfu": False})
    assert _wait(lambda: any(m.get("type") == "offer"
                             for m in mock.log))
    offer = next(m for m in mock.log if m.get("type") == "offer")
    assert offer["playerId"] == "101"
    assert "m=audio" in offer["sdp"]
    assert "101" in sink.players

    # answer flows in; ping is answered with pong
    mock.send({"type": "answer", "playerId": "101",
               "sdp": "v=0\r\ns=player\r\n"})
    mock.send({"type": "ping", "time": 777})
    assert _wait(lambda: any(m.get("type") == "pong"
                             and m.get("time") == 777
                             for m in mock.log))

    # disconnect tears the session down
    mock.send({"type": "playerDisconnected", "playerId": "101"})
    assert _wait(lambda: "101" not in sink.players)
    sink.set_state(State.NULL)
