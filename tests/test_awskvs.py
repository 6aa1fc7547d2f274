"""awskvswebrtcsink against a mock Kinesis Video signalling stack:
HTTP control-plane (describe/getSignalingChannelEndpoint, SigV4
verified) + the signalling WebSocket (reference
net/webrtc/src/aws_kvs_signaller)."""

import base64
import json
import socket
import threading
import time
from http.server import ThreadingHTTPServer

from gstpu import State
from gstpu.core.registry import make
from gstpu.net.webrtc.signalling import ws_recv, ws_send
from test_aws import ACCESS, REGION, SECRET, _MockS3Handler

ARN = "arn:aws:kinesisvideo:eu-central-1:123:channel/test/1"


class _MockKvsApi(_MockS3Handler):
    def do_POST(self):
        if not self._verify_sig():
            return self._reject()
        body = json.loads(self._read_body() or b"{}")
        if self.path == "/describeSignalingChannel":
            assert body["ChannelName"] == "test-channel"
            resp = {"ChannelInfo": {"ChannelARN": ARN,
                                    "ChannelName": "test-channel"}}
        elif self.path == "/getSignalingChannelEndpoint":
            assert body["ChannelARN"] == ARN
            resp = {"ResourceEndpointList": [
                {"Protocol": "WSS",
                 "ResourceEndpoint":
                     f"ws://127.0.0.1:{self.server.ws_port}"}]}
        else:
            return self._reject(404, "NotFound")
        out = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


class MockKvsWs:
    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.log = []
        self.conn = None
        self.request_line = ""
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
        self.request_line = data.split(b"\r\n")[0].decode()
        import base64 as b64
        import hashlib
        key = [l.split(b":", 1)[1].strip()
               for l in data.split(b"\r\n")
               if l.lower().startswith(b"sec-websocket-key")][0]
        acc = b64.b64encode(hashlib.sha1(
            key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
        conn.sendall(b"HTTP/1.1 101 Switching Protocols\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Accept: " + acc + b"\r\n\r\n")
        while True:
            raw = ws_recv(conn)
            if raw is None:
                return
            self.log.append(json.loads(raw))


def _wait(cond, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_kvs_master_answers_viewer_offer():
    ws = MockKvsWs()
    api = ThreadingHTTPServer(("127.0.0.1", 0), _MockKvsApi)
    api.objects, api.uploads = {}, {}
    api.ws_port = ws.port
    threading.Thread(target=api.serve_forever, daemon=True).start()

    sink = make("awskvswebrtcsink")
    sink.channel_name = "test-channel"
    sink.region = REGION
    sink.access_key, sink.secret_access_key = ACCESS, SECRET
    sink.api_endpoint = \
        f"http://127.0.0.1:{api.server_address[1]}"
    pad = sink.request_pad("sink_0")
    assert sink.set_state(State.PLAYING).name != "FAILURE"
    assert sink.channel_arn == ARN
    # the WS URL carried the channel ARN + presigned query
    assert _wait(lambda: ws.conn is not None)
    assert "X-Amz-ChannelARN" in ws.request_line
    assert "X-Amz-Signature=" in ws.request_line

    from gstpu.core.caps import parse_caps
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    pad.send_event(StreamStartEvent("t"))
    pad.send_event(CapsEvent(parse_caps(
        "audio/x-raw, format=S16LE, rate=48000, channels=2, "
        "layout=interleaved")))
    pad.send_event(SegmentEvent(Segment()))

    offer = base64.b64encode(json.dumps(
        {"type": "offer",
         "sdp": "v=0\r\nm=audio 9 UDP/TLS/RTP/SAVPF 111\r\n"}
    ).encode()).decode()
    ws.send({"messageType": "SDP_OFFER", "senderClientId": "v1",
             "messagePayload": offer})
    assert _wait(lambda: any(m.get("action") == "SDP_ANSWER"
                             for m in ws.log))
    ans = next(m for m in ws.log if m.get("action") == "SDP_ANSWER")
    assert ans["recipientClientId"] == "v1"
    payload = json.loads(base64.b64decode(ans["messagePayload"]))
    assert payload["type"] == "answer"
    assert "m=audio" in payload["sdp"]
    assert "v1" in sink.viewers
    sink.set_state(State.NULL)
    api.shutdown()
