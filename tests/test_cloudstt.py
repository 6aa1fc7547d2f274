"""speechmaticstranscriber / deepgramtranscriber against in-process
mock WebSocket services speaking the real wire protocols
(reference audio/speechmatics + net/deepgram; the env gate is
TLS/egress — the protocol itself is exercised end-to-end here)."""

import json
import socket
import struct
import threading

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.net.webrtc.signalling import ws_handshake, ws_recv, ws_send

SECOND = 10**9


class _MockWsService:
    """One-connection mock: subclass handles messages."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.request_headers = b""
        self.audio_bytes = 0
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self):
        conn, _ = self.sock.accept()
        # capture the HTTP request for auth assertions
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = conn.recv(1)
            if not chunk:
                return
            data += chunk
        self.request_headers = data
        key = [l.split(b":", 1)[1].strip()
               for l in data.split(b"\r\n")
               if l.lower().startswith(b"sec-websocket-key")][0]
        import base64
        import hashlib
        accept = base64.b64encode(hashlib.sha1(
            key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
        conn.sendall(b"HTTP/1.1 101 Switching Protocols\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Accept: " + accept + b"\r\n\r\n")
        self.on_open(conn)
        while True:
            msg = ws_recv(conn)
            if msg is None:
                return
            self.on_message(conn, msg)

    def on_open(self, conn):
        pass

    def on_message(self, conn, msg):
        pass


class MockSpeechmatics(_MockWsService):
    """Implements the RT API v2 exchange."""

    def on_message(self, conn, msg):
        try:
            obj = json.loads(msg)
        except (UnicodeDecodeError, json.JSONDecodeError):
            # binary audio frame
            self.audio_bytes += len(msg)
            ws_send(conn, json.dumps(
                {"message": "AudioAdded",
                 "seq_no": self.audio_bytes}).encode())
            # one transcript per ~16000 bytes (0.5 s of s16 mono)
            if self.audio_bytes % 16000 == 0:
                n = self.audio_bytes // 16000
                ws_send(conn, json.dumps({
                    "message": "AddTranscript",
                    "metadata": {"transcript": f"word{n}",
                                 "start_time": (n - 1) * 0.5,
                                 "end_time": n * 0.5},
                    "results": [{"type": "word",
                                 "start_time": (n - 1) * 0.5,
                                 "end_time": n * 0.5,
                                 "alternatives":
                                     [{"content": f"word{n}"}]}],
                }).encode())
            return
        m = obj.get("message")
        if m == "StartRecognition":
            assert obj["audio_format"]["encoding"] == "pcm_s16le"
            ws_send(conn, json.dumps(
                {"message": "RecognitionStarted",
                 "id": "mock-session"}).encode())
        elif m == "EndOfStream":
            ws_send(conn, json.dumps({
                "message": "AddTranscript",
                "metadata": {"transcript": "final words",
                             "start_time": 9.0, "end_time": 9.5},
                "results": []}).encode())
            ws_send(conn, json.dumps(
                {"message": "EndOfTranscript"}).encode())


class MockDeepgram(_MockWsService):
    def on_message(self, conn, msg):
        try:
            obj = json.loads(msg)
        except (UnicodeDecodeError, json.JSONDecodeError):
            self.audio_bytes += len(msg)
            if self.audio_bytes % 32000 == 0:
                n = self.audio_bytes // 32000
                ws_send(conn, json.dumps({
                    "type": "Results",
                    "channel": {"alternatives":
                                [{"transcript": f"dg{n}"}]},
                    "start": (n - 1) * 1.0, "duration": 1.0,
                    "is_final": True}).encode())
            return
        if obj.get("type") == "CloseStream":
            ws_send(conn, json.dumps(
                {"type": "Metadata",
                 "transaction_key": "closed"}).encode())


def _push_audio(el, n_half_seconds):
    h = Harness(el)
    h.set_caps("audio/x-raw, format=S16LE, rate=16000, channels=1, "
               "layout=interleaved")
    for i in range(n_half_seconds):
        h.push(Buffer(b"\x00\x01" * 8000))   # 0.5 s of s16 mono
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    return h


def test_speechmatics_protocol_end_to_end():
    mock = MockSpeechmatics()
    el = make("speechmaticstranscriber")
    el.url = f"ws://127.0.0.1:{mock.port}/v2"
    el.api_key = "sm-test-key"
    h = _push_audio(el, 4)
    texts = [b.to_bytes().decode() for b in h.buffers]
    assert "word1" in texts and "word4" in texts
    assert texts[-1] == "final words"
    # pts/duration carry the service timings
    w1 = h.buffers[0]
    assert w1.pts == 0 and w1.duration == int(0.5 * SECOND)
    # auth header went out
    assert b"Bearer sm-test-key" in mock.request_headers
    h.teardown()


def test_deepgram_protocol_end_to_end():
    mock = MockDeepgram()
    el = make("deepgramtranscriber")
    el.url = f"ws://127.0.0.1:{mock.port}/v1/listen"
    el.api_key = "dg-key"
    h = _push_audio(el, 4)                  # 2 s -> 2 results
    texts = [b.to_bytes().decode() for b in h.buffers]
    assert texts == ["dg1", "dg2"]
    assert b"Token dg-key" in mock.request_headers
    assert b"encoding=linear16" in mock.request_headers
    h.teardown()


def test_cloudstt_connect_failure_is_clean():
    el = make("speechmaticstranscriber")
    el.url = "ws://127.0.0.1:1/nope"
    assert el.set_state(State.READY).name == "FAILURE"


class MockSpeechmaticsConfig(MockSpeechmatics):
    """Captures StartRecognition and tags one word as profanity."""

    start_msg = None

    def on_message(self, conn, msg):
        try:
            obj = json.loads(msg)
        except (UnicodeDecodeError, json.JSONDecodeError):
            self.audio_bytes += len(msg)
            if self.audio_bytes % 16000 == 0:
                ws_send(conn, json.dumps({
                    "message": "AddTranscript",
                    "metadata": {"transcript": "",
                                 "start_time": 0.0, "end_time": 0.5},
                    "results": [
                        {"type": "word", "alternatives":
                         [{"content": "hello", "tags": []}]},
                        {"type": "word", "alternatives":
                         [{"content": "dang", "tags":
                           ["profanity"]}]}],
                }).encode())
            return
        if obj.get("message") == "StartRecognition":
            type(self).start_msg = obj
            ws_send(conn, json.dumps(
                {"message": "RecognitionStarted"}).encode())
            ws_send(conn, json.dumps(
                {"message": "AudioEventStarted",
                 "event": {"type": "music",
                           "start_time": 0.1}}).encode())
        elif obj.get("message") == "EndOfStream":
            ws_send(conn, json.dumps(
                {"message": "EndOfTranscript"}).encode())


def test_speechmatics_round5_config_and_masking():
    mock = MockSpeechmaticsConfig()
    el = make("speechmaticstranscriber",
              additional_vocabulary="gstpu, tpu",
              diarization="speaker", max_speakers=4,
              remove_disfluencies=True, mask_profanities=True,
              language_code="de",
              audio_event_types="music,applause")
    el.url = f"ws://127.0.0.1:{mock.port}/v2"
    h = _push_audio(el, 1)
    start = MockSpeechmaticsConfig.start_msg
    cfg = start["transcription_config"]
    assert cfg["language"] == "de"
    assert cfg["additional_vocab"] == [{"content": "gstpu"},
                                       {"content": "tpu"}]
    assert cfg["diarization"] == "speaker"
    assert cfg["speaker_diarization_config"]["max_speakers"] == 4
    assert cfg["transcript_filtering_config"][
        "remove_disfluencies"] is True
    assert start["audio_events_config"]["types"] == ["music",
                                                     "applause"]
    texts = [b.to_bytes().decode() for b in h.buffers]
    assert any("hello ****" in t for t in texts), texts
    msgs = [m for m in el.bus.drain()
            if getattr(m, "name", "") == "speechmatics-audio-event"]
    assert msgs and msgs[0].fields["type"] == "music"
    h.teardown()


def test_deepgram_round5_knobs():
    """diarize + language-code ride the query string; lateness
    shifts output pts; max-observed-delay is a live read-only."""
    mock = MockDeepgram()
    el = make("deepgramtranscriber", diarization=True,
              language_code="nl", lateness=250)
    el.url = f"ws://127.0.0.1:{mock.port}/v1/listen"
    h = _push_audio(el, 4)
    # query params reached the wire (the ws handshake request line)
    req = mock.request_headers.decode(errors="replace")
    assert "diarize=true" in req and "language=nl" in req
    texts = [b.to_bytes().decode() for b in h.buffers]
    assert "dg1" in texts
    # lateness: dg1 covers [0,1s) -> pts shifted by 250ms
    assert h.buffers[0].pts == 250_000_000
    # the mock answers at exact second marks; depending on which
    # push's poll picks the message up the observed delay is 0-1 s
    assert 0 <= el.get_property("max-observed-delay") <= 1_000_000_000
    import pytest as _pytest
    with _pytest.raises(PermissionError):
        el.set_property("max-observed-delay", 5)
    h.teardown()
