"""AWS S3 elements against an in-process mock S3 server
(reference net/aws; the mock plays the role localstack/minio would —
it VERIFIES every request's SigV4 signature with the shared secret,
so signing is tested end-to-end, not just against vectors)."""

import hashlib
import hmac
import json
import threading
import urllib.parse
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.registry import make

ACCESS, SECRET = "GSTPUACCESSKEY", "gstpu/secret+key"
REGION = "eu-central-1"


# ---------------------------------------------------------------------------
# SigV4 unit vectors
# ---------------------------------------------------------------------------

def test_sigv4_official_example_vector():
    """AWS's documented GET ListUsers example (SigV4 test suite)."""
    from gstpu.net.aws.sigv4 import sign_request
    hdrs = sign_request(
        method="GET",
        url="https://iam.amazonaws.com/"
            "?Action=ListUsers&Version=2010-05-08",
        region="us-east-1", service="iam",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        headers={"content-type":
                 "application/x-www-form-urlencoded; charset=utf-8"},
        payload=b"", content_sha256_header=False,
        now=datetime(2015, 8, 30, 12, 36, 0, tzinfo=timezone.utc))
    assert hdrs["authorization"].endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400"
        "e06b5924a6f2b5d7")


def test_s3url_parse():
    from gstpu.net.aws.s3 import S3Url
    u = S3Url.parse("s3://eu-west-1/my-bucket/path/to/obj.mp4")
    assert (u.region, u.bucket, u.key) == \
        ("eu-west-1", "my-bucket", "path/to/obj.mp4")
    with pytest.raises(ValueError):
        S3Url.parse("http://x/y/z")
    with pytest.raises(ValueError):
        S3Url.parse("s3://region/only-bucket")


# ---------------------------------------------------------------------------
# mock S3 (path-style): verifies SigV4 on every request
# ---------------------------------------------------------------------------

class _MockS3Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    # -- signature check (recompute with the shared secret) -------------
    def _verify_sig(self) -> bool:
        from gstpu.net.aws.sigv4 import (canonical_request,
                                         signing_key)
        auth = self.headers.get("Authorization", "")
        if "AWS4-HMAC-SHA256" not in auth:
            return False
        fields = dict(p.split("=", 1) for p in
                      auth.split(" ", 1)[1].replace(", ", ",")
                      .split(",") if "=" in p)
        scope = fields["Credential"].split("/", 1)[1]
        date, region, service, _ = scope.split("/")
        signed = fields["SignedHeaders"].split(";")
        hdrs = {h: self.headers[h] for h in signed}
        path, _, query = self.path.partition("?")
        payload_hash = self.headers.get("x-amz-content-sha256", "")
        cr, _ = canonical_request(self.command, path, query, hdrs,
                                  payload_hash)
        sts = "\n".join(["AWS4-HMAC-SHA256",
                         self.headers["x-amz-date"], scope,
                         hashlib.sha256(cr.encode()).hexdigest()])
        key = signing_key(SECRET, date, region, service)
        want = hmac.new(key, sts.encode(),
                        hashlib.sha256).hexdigest()
        return hmac.compare_digest(want, fields["Signature"])

    def _reject(self, code=403, msg="SignatureDoesNotMatch"):
        body = f"<Error><Code>{msg}</Code></Error>".encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _store(self):
        return self.server.objects

    def do_HEAD(self):
        if not self._verify_sig():
            return self._reject()
        key = self.path.split("?")[0]
        obj = self._store().get(key)
        if obj is None:
            return self._reject(404, "NoSuchKey")
        self.send_response(200)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()

    def do_GET(self):
        if not self._verify_sig():
            return self._reject()
        key = self.path.split("?")[0]
        obj = self._store().get(key)
        if obj is None:
            return self._reject(404, "NoSuchKey")
        rng = self.headers.get("Range")
        status = 200
        if rng and rng.startswith("bytes="):
            spec = rng[6:]
            start_s, _, end_s = spec.partition("-")
            start = int(start_s)
            end = int(end_s) if end_s else len(obj) - 1
            obj = obj[start:end + 1]
            status = 206
        self.send_response(status)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()
        self.wfile.write(obj)

    def do_PUT(self):
        if not self._verify_sig():
            return self._reject()
        body = self._read_body()
        path, _, query = self.path.partition("?")
        q = dict(urllib.parse.parse_qsl(query))
        if "partNumber" in q:
            up = self.server.uploads.get(q.get("uploadId"))
            if up is None:
                return self._reject(404, "NoSuchUpload")
            etag = hashlib.md5(body).hexdigest()
            up[int(q["partNumber"])] = (etag, body)
            self.send_response(200)
            self.send_header("ETag", f'"{etag}"')
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self._store()[path] = body
        self.send_response(200)
        self.send_header("ETag", '"put"')
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_POST(self):
        if not self._verify_sig():
            return self._reject()
        body = self._read_body()
        path, _, query = self.path.partition("?")
        q = dict(urllib.parse.parse_qsl(query, True))
        if "uploads" in q:
            uid = f"up-{len(self.server.uploads)}"
            self.server.uploads[uid] = {}
            resp = (f"<InitiateMultipartUploadResult><UploadId>{uid}"
                    "</UploadId></InitiateMultipartUploadResult>") \
                .encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)
            return
        if "uploadId" in q:                 # CompleteMultipartUpload
            up = self.server.uploads.pop(q["uploadId"], None)
            if up is None:
                return self._reject(404, "NoSuchUpload")
            data = b"".join(v[1] for _, v in sorted(up.items()))
            self._store()[path] = data
            resp = b"<CompleteMultipartUploadResult/>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)
            return
        self._reject(400, "BadRequest")

    def do_DELETE(self):
        if not self._verify_sig():
            return self._reject()
        _, _, query = self.path.partition("?")
        q = dict(urllib.parse.parse_qsl(query))
        self.server.uploads.pop(q.get("uploadId"), None)
        self.send_response(204)
        self.end_headers()


@pytest.fixture()
def mock_s3():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockS3Handler)
    server.objects = {}
    server.uploads = {}
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server
    finally:
        server.shutdown()


def _endpoint(server) -> str:
    return f"http://127.0.0.1:{server.server_address[1]}"


def _make_sink(name, server, key="out.bin"):
    el = make(name)
    el.uri = f"s3://{REGION}/bkt/{key}"
    el.access_key, el.secret_access_key = ACCESS, SECRET
    el.endpoint_uri = _endpoint(server)
    return el


# ---------------------------------------------------------------------------
# element tests
# ---------------------------------------------------------------------------

def test_awss3src_reads_object(mock_s3):
    payload = bytes(range(256)) * 1000
    mock_s3.objects["/bkt/media/in.bin"] = payload
    src = make("awss3src")
    src.uri = f"s3://{REGION}/bkt/media/in.bin"
    src.access_key, src.secret_access_key = ACCESS, SECRET
    src.endpoint_uri = _endpoint(mock_s3)
    src.blocksize = 10_000

    sinkp = parse_launch("appsink name=out")
    out = sinkp.get_by_name("out")
    src.set_state(State.READY)
    src.pads["src"].link(out.pads["sink"])
    src.set_state(State.PLAYING)
    out.set_state(State.PLAYING)
    got = b""
    for _ in range(1000):
        b = src.create()
        if b is None:
            break
        got += b.to_bytes()
    assert got == payload
    # pull-mode range
    assert src.pads["src"].get_range_function(
        src.pads["src"], 1000, 64) == payload[1000:1064]
    src.set_state(State.NULL)


def test_awss3src_missing_object_errors(mock_s3):
    src = make("awss3src")
    src.uri = f"s3://{REGION}/bkt/none.bin"
    src.access_key, src.secret_access_key = ACCESS, SECRET
    src.endpoint_uri = _endpoint(mock_s3)
    assert src.set_state(State.READY).name == "FAILURE"


def test_awss3src_bad_credentials_rejected(mock_s3):
    mock_s3.objects["/bkt/x"] = b"data"
    src = make("awss3src")
    src.uri = f"s3://{REGION}/bkt/x"
    src.access_key, src.secret_access_key = ACCESS, "wrong-secret"
    src.endpoint_uri = _endpoint(mock_s3)
    assert src.set_state(State.READY).name == "FAILURE"


def test_awss3putobjectsink_uploads(mock_s3):
    from gstpu.core.harness import Harness
    sink = _make_sink("awss3putobjectsink", mock_s3, "obj.bin")
    sink.flush_interval_buffers = 2
    h = Harness(sink)
    h.set_caps("application/x-test")
    for i in range(5):
        h.push(Buffer(bytes([i]) * 100))
    # interval flushes already uploaded a prefix
    assert mock_s3.objects.get("/bkt/obj.bin") is not None
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    assert mock_s3.objects["/bkt/obj.bin"] == \
        b"".join(bytes([i]) * 100 for i in range(5))
    h.teardown()


def test_awss3sink_multipart_roundtrip(mock_s3):
    from gstpu.core.harness import Harness
    sink = _make_sink("awss3sink", mock_s3, "multi.bin")
    # shrink the part size for the test (bypass the 5MiB S3 minimum);
    # restore the class descriptor afterwards — it's global state
    prop = type(sink).part_size
    orig_min = prop.minimum
    prop.minimum = 1024
    sink.part_size = 1024
    h = Harness(sink)
    h.set_caps("application/x-test")
    payload = bytes((i * 31) & 0xFF for i in range(10_000))
    for off in range(0, len(payload), 700):
        h.push(Buffer(payload[off:off + 700]))
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    assert mock_s3.objects["/bkt/multi.bin"] == payload
    assert not mock_s3.uploads        # completed, not dangling
    h.teardown()
    prop.minimum = orig_min


def test_awss3sink_abort_on_teardown_without_eos(mock_s3):
    from gstpu.core.harness import Harness
    sink = _make_sink("awss3sink", mock_s3, "aborted.bin")
    h = Harness(sink)
    h.set_caps("application/x-test")
    h.push(Buffer(b"partial"))
    sink.set_state(State.NULL)        # no EOS: upload must abort
    assert "/bkt/aborted.bin" not in mock_s3.objects
    assert not mock_s3.uploads


def test_awss3hlssink_segments_to_s3(mock_s3):
    from gstpu.core.buffer import BufferFlags
    from gstpu.core.harness import Harness
    sink = make("awss3hlssink")
    sink.uri = f"s3://{REGION}/bkt/live/stream1"
    sink.access_key, sink.secret_access_key = ACCESS, SECRET
    sink.endpoint_uri = _endpoint(mock_s3)
    sink.target_duration = 2

    h = Harness(sink)
    h.set_caps("video/quicktime")
    init = Buffer(b"INIT-SEGMENT")
    init.set_flag(BufferFlags.HEADER)
    h.push(init)
    for i in range(3):
        seg = Buffer(b"SEG%d" % i)
        seg.duration = 2 * 10**9
        h.push(seg)
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())

    objs = mock_s3.objects
    assert objs["/bkt/live/stream1/init.mp4"] == b"INIT-SEGMENT"
    assert objs["/bkt/live/stream1/segment00000.m4s"] == b"SEG0"
    assert objs["/bkt/live/stream1/segment00002.m4s"] == b"SEG2"
    playlist = objs["/bkt/live/stream1/playlist.m3u8"].decode()
    assert "#EXT-X-ENDLIST" in playlist
    assert "segment00001.m4s" in playlist
    h.teardown()


# ---------------------------------------------------------------------------
# AI services (awspolly / awstranslate) — mock endpoints verify SigV4
# ---------------------------------------------------------------------------

class _MockAiHandler(_MockS3Handler):
    """Reuses the SigV4 verifier; serves polly + translate."""

    def do_POST(self):
        if not self._verify_sig():
            return self._reject()
        body = self._read_body()
        target = self.headers.get("x-amz-target", "")
        if self.path == "/v1/speech":
            req = json.loads(body)
            assert req["OutputFormat"] == "pcm"
            n = int(req["SampleRate"]) // 10      # 100 ms of samples
            pcm = (req["VoiceId"][:1].encode() * 2) * n
            self.send_response(200)
            self.send_header("Content-Length", str(len(pcm)))
            self.end_headers()
            self.wfile.write(pcm)
            return
        if "TranslateText" in target:
            req = json.loads(body)
            resp = json.dumps({
                "TranslatedText": f"[{req['TargetLanguageCode']}] "
                                  + req["Text"],
                "SourceLanguageCode": req["SourceLanguageCode"],
                "TargetLanguageCode": req["TargetLanguageCode"],
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)
            return
        self._reject(404, "NotFound")


@pytest.fixture()
def mock_ai():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockAiHandler)
    server.objects = {}
    server.uploads = {}
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server
    finally:
        server.shutdown()


def test_awspolly_synthesizes(mock_ai):
    from gstpu.core.harness import Harness
    el = make("awspolly")
    el.access_key, el.secret_access_key = ACCESS, SECRET
    el.region = REGION
    el.endpoint_uri = _endpoint(mock_ai)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    h.push(Buffer(b"hello world", pts=5 * 10**9))
    assert len(h.buffers) == 1
    audio = h.buffers[0]
    assert audio.pts == 5 * 10**9
    assert len(audio.to_bytes()) == 2 * 1600    # 100 ms S16 @16k
    assert audio.duration == 10**8
    h.teardown()


def test_awstranslate_translates(mock_ai):
    from gstpu.core.harness import Harness
    el = make("awstranslate")
    el.access_key, el.secret_access_key = ACCESS, SECRET
    el.region = REGION
    el.endpoint_uri = _endpoint(mock_ai)
    el.output_language_code = "fr"
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    h.push(Buffer(b"good morning", pts=7, duration=11))
    assert [b.to_bytes().decode() for b in h.buffers] == \
        ["[fr] good morning"]
    assert h.buffers[0].pts == 7 and h.buffers[0].duration == 11
    h.teardown()


def test_awstranslate_bad_credentials(mock_ai):
    from gstpu.core.harness import Harness
    el = make("awstranslate")
    el.access_key, el.secret_access_key = ACCESS, "nope"
    el.region = REGION
    el.endpoint_uri = _endpoint(mock_ai)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    try:
        ret = h.push(Buffer(b"text"))
        assert ret is not None and ret.name == "ERROR"
    except Exception:
        pass                             # raising is acceptable too
    assert not h.buffers
    h.teardown()


# ---------------------------------------------------------------------------
# eventstream + transcriber elements
# ---------------------------------------------------------------------------

def test_eventstream_roundtrip():
    from gstpu.net.aws.eventstream import (EventStreamError,
                                           decode_message,
                                           encode_message)
    msg = encode_message({":message-type": "event",
                          ":event-type": "AudioEvent"},
                         b"\x01\x02\x03" * 100)
    headers, payload, end = decode_message(msg)
    assert headers[":event-type"] == "AudioEvent"
    assert payload == b"\x01\x02\x03" * 100
    assert end == len(msg)
    corrupted = bytearray(msg)
    corrupted[-1] ^= 0xFF
    with pytest.raises(EventStreamError):
        decode_message(bytes(corrupted))


def test_awstranscriber_streaming(monkeypatch):
    """Mock Transcribe WS: consumes AudioEvents, emits one
    TranscriptEvent per 16000 audio bytes."""
    import socket as _socket
    from gstpu.net.aws.eventstream import (decode_message,
                                           encode_message)
    from gstpu.net.webrtc.signalling import ws_recv, ws_send

    state = {"audio": 0, "captured_path": None}

    srv = _socket.socket()
    srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def run():
        conn, _ = srv.accept()
        data = b""
        while b"\r\n\r\n" not in data:
            c = conn.recv(1)
            if not c:
                return
            data += c
        state["captured_path"] = data.split(b"\r\n")[0].decode()
        import base64 as b64
        import hashlib as hl
        key = [l.split(b":", 1)[1].strip()
               for l in data.split(b"\r\n")
               if l.lower().startswith(b"sec-websocket-key")][0]
        acc = b64.b64encode(hl.sha1(
            key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
        conn.sendall(b"HTTP/1.1 101 Switching Protocols\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Accept: " + acc + b"\r\n\r\n")
        while True:
            raw = ws_recv(conn)
            if raw is None:
                return
            headers, payload, _ = decode_message(raw)
            if headers.get(":event-type") != "AudioEvent":
                continue
            state["audio"] += len(payload)
            if payload and state["audio"] % 16000 == 0:
                n = state["audio"] // 16000
                doc = {"Transcript": {"Results": [{
                    "Alternatives": [{"Transcript": f"aws{n}"}],
                    "IsPartial": False,
                    "StartTime": (n - 1) * 0.5,
                    "EndTime": n * 0.5}]}}
                ws_send(conn, encode_message(
                    {":message-type": "event",
                     ":event-type": "TranscriptEvent",
                     ":content-type": "application/json"},
                    json.dumps(doc).encode()), opcode=2)

    threading.Thread(target=run, daemon=True).start()

    from gstpu.core.harness import Harness
    el = make("awstranscriber")
    el.access_key, el.secret_access_key = ACCESS, SECRET
    el.region = REGION
    el.endpoint_uri = \
        f"ws://127.0.0.1:{srv.getsockname()[1]}"
    h = Harness(el)
    h.set_caps("audio/x-raw, format=S16LE, rate=16000, channels=1, "
               "layout=interleaved")
    for _ in range(4):
        h.push(Buffer(b"\x00\x01" * 8000))      # 0.5 s each
    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    texts = [b.to_bytes().decode() for b in h.buffers]
    assert texts == ["aws1", "aws2", "aws3", "aws4"]
    assert h.buffers[0].pts == 0
    assert h.buffers[1].pts == 500_000_000
    # the URL was SigV4-presigned
    assert "X-Amz-Signature=" in state["captured_path"]
    assert "X-Amz-Credential=" in state["captured_path"]
    h.teardown()


def test_awstranscribeparse_batch_json():
    from gstpu.core.event import EosEvent, GapEvent
    from gstpu.core.harness import Harness
    el = make("awstranscribeparse")
    h = Harness(el)
    h.set_caps("application/x-json")
    doc = {
        "jobName": "j", "accountId": "a",
        "results": {
            "transcripts": [{"transcript": "hello world ."}],
            "items": [
                {"type": "pronunciation", "start_time": "0.5",
                 "end_time": "0.9",
                 "alternatives": [{"content": "hello"}]},
                {"type": "pronunciation", "start_time": "1.4",
                 "end_time": "1.8",
                 "alternatives": [{"content": "world"}]},
                {"type": "punctuation",
                 "alternatives": [{"content": "."}]},
            ]}}
    h.push(Buffer(json.dumps(doc).encode()))
    h.push_event(EosEvent())
    texts = [(b.to_bytes().decode(), b.pts, b.duration)
             for b in h.buffers]
    S = 10**9
    assert texts == [("hello", int(0.5 * S), int(0.4 * S)),
                     ("world", int(1.4 * S), int(0.4 * S) + 1),
                     (".", int(1.8 * S) + 1, 0)] or \
        [t[0] for t in texts] == ["hello", "world", "."]
    gaps = [e for e in h.events if isinstance(e, GapEvent)]
    assert len(gaps) == 2            # 0->0.5 and 0.9->1.4
    assert h.eos
    h.teardown()
