"""CLI tools (gstpu/tools/): launch, inspect, docs cache, signalling
server binary. The docs-cache staleness test plays the role of the
reference's ci/check-documentation-diff.py."""

import io
import json
import socket
import sys
from contextlib import redirect_stderr, redirect_stdout

import pytest


def test_launch_runs_pipeline():
    from gstpu.tools.launch import main
    with redirect_stderr(io.StringIO()):
        assert main(["-q", "audiotestsrc num-buffers=3 ! fakesink"]) \
            == 0


def test_launch_bad_pipeline_errors():
    from gstpu.tools.launch import main
    err = io.StringIO()
    with redirect_stderr(err):
        assert main(["-q", "nosuchelement ! fakesink"]) == 1
    assert "could not construct" in err.getvalue()


def test_inspect_lists_and_describes():
    from gstpu.tools.inspect import main
    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        assert main([]) == 0
    names = out.getvalue().split()
    assert "rsaudioecho" in names and len(names) > 200

    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["audioloudnorm"]) == 0
    text = out.getvalue()
    assert "Pad Templates:" in text
    assert "Element Properties:" in text
    assert "loudness_target" in text

    with redirect_stderr(io.StringIO()):
        assert main(["definitely-not-an-element"]) == 1


def test_docs_cache_current(tmp_path):
    """Checked-in docs cache must match a fresh regeneration
    (reference: ci/check-documentation-diff.py). Regenerates in a
    SUBPROCESS: earlier tests may have registered mock elements in
    this interpreter's registry."""
    import pathlib
    import subprocess
    out = tmp_path / "cache.json"
    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-m", "gstpu.tools.docs_cache",
         "-o", str(out)], cwd=repo, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    checked_in = (repo / "docs/plugins/gstpu_plugins_cache.json") \
        .read_text()
    fresh = out.read_text()
    assert checked_in == fresh, \
        "docs cache stale: run python -m gstpu.tools.docs_cache"
    cache = json.loads(fresh)
    assert len(cache) > 200
    echo = cache["rsaudioecho"]
    assert echo["pad_templates"][0]["direction"] in ("sink", "src")
    assert "delay" in echo["properties"]


def test_signalling_server_binary_serves():
    """The standalone server accepts a WebSocket connection and
    answers the protocol (welcome message with a peer id)."""
    from gstpu.net.webrtc.signalling import SignallingServer, ws_recv

    server = SignallingServer(port=0)
    server.start()
    try:
        conn = socket.create_connection(("127.0.0.1", server.port),
                                        timeout=5)
        conn.sendall(b"GET / HTTP/1.1\r\nHost: localhost\r\n"
                     b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                     b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                     b"Sec-WebSocket-Version: 13\r\n\r\n")
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(1)
        assert b"101" in data.split(b"\r\n")[0]
        conn.settimeout(5)
        msg = json.loads(ws_recv(conn))
        assert msg.get("type") == "welcome" and "peerId" in msg
        conn.close()
    finally:
        server.stop()


def test_examples_compile():
    """Every example script must at least parse (they are user-facing
    documentation; a syntax rot here is a docs bug)."""
    import pathlib
    import py_compile
    root = pathlib.Path(__file__).resolve().parent.parent / "examples"
    scripts = sorted(root.glob("*.py"))
    assert scripts, "no example scripts found"
    for p in scripts:
        py_compile.compile(str(p), doraise=True)


def test_launch_messages_flag_tees_bus():
    from gstpu.tools.launch import main
    err = io.StringIO()
    with redirect_stderr(err):
        assert main(["-m", "audiotestsrc num-buffers=3 ! "
                     "ebur128level interval=10000000 ! fakesink"]) \
            == 0
    text = err.getvalue()
    assert "[bus]" in text          # messages were printed
    assert "Execution ended" in text
