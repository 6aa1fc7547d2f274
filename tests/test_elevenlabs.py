"""elevenlabssynthesizer / elevenlabsvoicecloner against a mock of
the ElevenLabs HTTP API (reference audio/elevenlabs; the real
service is TLS/credential-gated — the protocol runs here)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gstpu import Buffer, State
from gstpu.core.harness import Harness
from gstpu.core.registry import make

SECOND = 10**9


class _MockElevenLabs(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self.server.requests.append(
            (self.path, dict(self.headers), body))
        if self.headers.get("xi-api-key") != "xi-test-key":
            self.send_response(401)
            self.end_headers()
            return
        if self.path.startswith("/v1/text-to-speech/"):
            req = json.loads(body)
            # 22050 Hz pcm, 50 ms per word
            words = max(len(req["text"].split()), 1)
            pcm = b"\x01\x02" * (22050 * 50 // 1000) * words
            self.send_response(200)
            self.send_header("Content-Length", str(len(pcm)))
            self.end_headers()
            self.wfile.write(pcm)
            return
        if self.path == "/v1/voices/add":
            resp = json.dumps({"voice_id": "cloned-123"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture()
def mock_el():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockElevenLabs)
    server.requests = []
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield server
    finally:
        server.shutdown()


def _ep(server):
    return f"http://127.0.0.1:{server.server_address[1]}"


def test_synthesizer_tts(mock_el):
    el = make("elevenlabssynthesizer")
    el.api_key = "xi-test-key"
    el.endpoint_uri = _ep(mock_el)
    el.voice_id = "voice-A"
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    h.push(Buffer(b"hello there friend", pts=2 * SECOND))
    assert len(h.buffers) == 1
    audio = h.buffers[0]
    assert audio.pts == 2 * SECOND
    n_samples = (22050 * 50 // 1000) * 3
    assert len(audio.to_bytes()) == 2 * n_samples
    assert audio.duration == n_samples * SECOND // 22050
    path, headers, body = mock_el.requests[0]
    assert path.startswith("/v1/text-to-speech/voice-A")
    assert "output_format=pcm_22050" in path
    req = json.loads(body)
    assert req["text"] == "hello there friend"
    assert "previous_request_ids" in req
    h.teardown()


def test_synthesizer_stitching_ids(mock_el):
    el = make("elevenlabssynthesizer")
    el.api_key = "xi-test-key"
    el.endpoint_uri = _ep(mock_el)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    for t in (b"one", b"two", b"three"):
        h.push(Buffer(t))
    req3 = json.loads(mock_el.requests[2][2])
    assert req3["previous_request_ids"] == ["one", "two"]
    h.teardown()


def test_synthesizer_bad_key(mock_el):
    el = make("elevenlabssynthesizer")
    el.api_key = "wrong"
    el.endpoint_uri = _ep(mock_el)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    try:
        ret = h.push(Buffer(b"text"))
        assert ret is None or ret.name == "ERROR"
    except Exception:
        pass
    assert not h.buffers
    h.teardown()


def test_voice_cloner(mock_el):
    el = make("elevenlabsvoicecloner")
    el.api_key = "xi-test-key"
    el.endpoint_uri = _ep(mock_el)
    el.voice_name = "narrator"
    h = Harness(el)
    h.set_caps("audio/x-raw, format=S16LE, rate=22050, channels=1, "
               "layout=interleaved")
    sample = b"\x03\x04" * 11025
    h.push(Buffer(sample))
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    assert el.cloned_voice_id == "cloned-123"
    path, headers, body = mock_el.requests[-1]
    assert path == "/v1/voices/add"
    assert b'name="name"' in body and b"narrator" in body
    assert sample in body
    h.teardown()
