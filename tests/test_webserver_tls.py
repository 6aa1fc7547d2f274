"""webrtcsink's embedded servers (reference run-web-server +
web-server-* and signalling-server-* properties,
net/webrtc/src/webrtcsink/imp.rs:2620-2700, 5595-5700): static file
serving with an optional mount path and TLS, and the TLS websocket
signalling server with the element's own pinned-trust client
loop-back."""

import json
import ssl
import urllib.error
import urllib.request

import pytest

from gstpu import State
from gstpu.core.element import Bus
from gstpu.core.registry import make
from gstpu.net.webserver import StaticWebServer


@pytest.fixture
def pem_pair(tmp_path):
    """Self-signed localhost cert/key PEM paths."""
    from cryptography.hazmat.primitives import serialization
    from gstpu.net.webrtc.dtls import generate_certificate
    key, cert = generate_certificate("127.0.0.1")
    cp = tmp_path / "cert.pem"
    kp = tmp_path / "key.pem"
    cp.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    kp.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(cp), str(kp)


@pytest.fixture
def site(tmp_path):
    d = tmp_path / "site"
    d.mkdir()
    (d / "index.html").write_text("<html>gstpu</html>")
    (d / "app.js").write_text("console.log(1)")
    return str(d)


def test_static_server_serves_directory(site):
    ws = StaticWebServer(host_addr="http://127.0.0.1:0",
                         directory=site)
    ws.start()
    try:
        base = ws.uri
        assert urllib.request.urlopen(
            f"{base}/index.html").read() == b"<html>gstpu</html>"
        assert urllib.request.urlopen(
            f"{base}/app.js").read() == b"console.log(1)"
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/missing.txt")
    finally:
        ws.stop()


def test_static_server_mount_path(site):
    ws = StaticWebServer(host_addr="http://127.0.0.1:0",
                         directory=site, path="player")
    ws.start()
    try:
        assert ws.uri.endswith("/player")
        got = urllib.request.urlopen(
            f"http://127.0.0.1:{ws.port}/player/index.html").read()
        assert got == b"<html>gstpu</html>"
        # outside the mount: nothing is served
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{ws.port}/index.html")
    finally:
        ws.stop()


def test_static_server_tls(site, pem_pair):
    cert, key = pem_pair
    ws = StaticWebServer(host_addr="https://127.0.0.1:0",
                         directory=site, cert=cert, key=key)
    ws.start()
    try:
        assert ws.uri.startswith("https://")
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.load_verify_locations(cert)
        ctx.check_hostname = False
        got = urllib.request.urlopen(
            f"{ws.uri}/index.html", context=ctx).read()
        assert got == b"<html>gstpu</html>"
    finally:
        ws.stop()


def test_webrtcsink_runs_web_server(site):
    sink = make("webrtcsink", run_web_server=True,
                web_server_host_addr="http://127.0.0.1:0",
                web_server_directory=site)
    sink.bus = Bus()
    sink.set_state(State.READY)
    msgs = [m for m in sink.bus.drain()
            if getattr(m, "name", "") == "web-server-started"]
    assert msgs, "no web-server-started message"
    uri = msgs[0].fields["uri"]
    try:
        assert urllib.request.urlopen(
            f"{uri}/index.html").read() == b"<html>gstpu</html>"
    finally:
        sink.set_state(State.NULL)
    assert sink._web_server is None      # stopped with the element


def test_signalling_server_tls_loopback(pem_pair):
    """run-signalling-server with cert/key: the server listens on
    wss:// and the element's own client connects through its pinned
    trust; a second wss client sees the producer listed."""
    cert, key = pem_pair
    sink = make("webrtcsink", run_signalling_server=True,
                signalling_server_cert=cert,
                signalling_server_key=key)
    sink.bus = Bus()
    sink.set_state(State.READY)
    try:
        msgs = [m for m in sink.bus.drain()
                if getattr(m, "name", "") ==
                "signalling-server-started"]
        assert msgs and msgs[0].fields["uri"].startswith("wss://")
        uri = msgs[0].fields["uri"]
        assert sink._sig_client.connected.wait(5.0), \
            "element's own wss client did not connect"

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.load_verify_locations(cert)
        ctx.check_hostname = False
        from gstpu.net.ws import WsClient
        ws = WsClient(uri, ssl_ctx=ctx)
        welcome = json.loads(ws.recv(timeout=5.0))
        assert welcome["type"] == "welcome"
        ws.send_text(json.dumps({"type": "list"}))
        listing = json.loads(ws.recv(timeout=5.0))
        assert listing["type"] == "list"
        ws.close()
    finally:
        sink.set_state(State.NULL)
