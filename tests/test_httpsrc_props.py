"""reqwesthttpsrc reference properties (net/reqwest/src/reqwesthttpsrc):
Basic auth (user-id/user-pw), gzip (compress), icy headers
(iradio-mode), timeout, proxy plumbing — against an in-process
http.server (this environment's reachable-network subset)."""

import base64
import gzip
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from gstpu import State, parse_launch

BODY = b"0123456789" * 500


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/auth":
            want = "Basic " + base64.b64encode(b"bob:pw").decode()
            if self.headers.get("Authorization") != want:
                self.send_response(401)
                self.send_header("WWW-Authenticate",
                                 'Basic realm="t"')
                self.end_headers()
                return
            payload = BODY
        elif self.path == "/gz":
            if "gzip" not in self.headers.get("Accept-Encoding", ""):
                self.send_response(406)
                self.end_headers()
                return
            payload = gzip.compress(BODY)
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        elif self.path == "/icy":
            self.send_response(200)
            self.send_header("icy-name", "gstpu radio")
            self.send_header("icy-genre", "test tones")
            self.send_header("Content-Length", str(len(BODY)))
            self.end_headers()
            self.wfile.write(BODY)
            return
        else:
            payload = BODY
        self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _pull(desc):
    p = parse_launch(desc + " ! appsink name=o")
    p.set_state(State.PLAYING)
    p.run()
    o = p.get_by_name("o")
    data = b"".join(b.to_bytes() for b in o.pull_all())
    msgs = list(p.bus.drain())
    p.set_state(State.NULL)
    return data, msgs


def test_basic_auth(server):
    data, _ = _pull(f'reqwesthttpsrc location={server}/auth '
                    f'user-id=bob user-pw=pw')
    assert data == BODY


def test_basic_auth_missing_fails(server):
    p = parse_launch(f'reqwesthttpsrc location={server}/auth ! '
                     f'appsink name=o')
    p.set_state(State.PLAYING)
    with pytest.raises(RuntimeError, match="401"):
        p.run()
    p.set_state(State.NULL)


def test_compress_transparent_gzip(server):
    data, _ = _pull(f'reqwesthttpsrc location={server}/gz '
                    f'compress=true')
    assert data == BODY


def test_iradio_headers_surface(server):
    data, msgs = _pull(f'reqwesthttpsrc location={server}/icy')
    assert data == BODY
    icy = [m for m in msgs
           if getattr(m, "name", "") == "http-headers"]
    assert icy and icy[0].fields["icy-name"] == "gstpu radio"
    assert icy[0].fields["icy-genre"] == "test tones"


def test_timeout_seconds_property(server):
    data, _ = _pull(f'reqwesthttpsrc location={server}/ timeout=30')
    assert data == BODY
