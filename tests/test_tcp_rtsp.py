"""TCP elements + rtspsrc2 against an in-process RTSP server
(the reference tests network elements against localhost/in-process
servers — SURVEY.md §4.4)."""

import socket
import threading
import time

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.registry import make
from gstpu.elements.net.rtsp import parse_sdp_media
from gstpu.net.rtp.packet import RtpPacket

SDP = """v=0
o=- 0 0 IN IP4 127.0.0.1
s=test
m=audio 0 RTP/AVP 96
a=rtpmap:96 L16/8000
a=control:streamid=0
"""


def test_parse_sdp():
    media = parse_sdp_media(SDP)
    assert len(media) == 1
    m = media[0]
    assert m["kind"] == "audio"
    assert m["payload"] == 96
    assert m["encoding"] == "L16"
    assert m["clock-rate"] == 8000
    assert m["control"] == "streamid=0"


class MiniRtspServer:
    """Canned RTSP server: answers the control protocol, then streams
    N interleaved RTP packets."""

    def __init__(self, n_packets=5):
        self.n_packets = n_packets
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self):
        conn, _ = self._srv.accept()
        conn.settimeout(10)
        playing = False
        buf = b""
        while not playing:
            while b"\r\n\r\n" not in buf:
                buf += conn.recv(4096)
            req, buf = buf.split(b"\r\n\r\n", 1)
            lines = req.decode().split("\r\n")
            method = lines[0].split()[0]
            cseq = next(line.split(":")[1].strip() for line in lines
                        if line.lower().startswith("cseq"))
            extra = ""
            body = b""
            if method == "DESCRIBE":
                body = SDP.encode()
                extra = ("Content-Type: application/sdp\r\n"
                         f"Content-Length: {len(body)}\r\n")
            elif method == "SETUP":
                extra = ("Session: 12345678\r\nTransport: RTP/AVP/TCP;"
                         "unicast;interleaved=0-1\r\n")
            elif method == "PLAY":
                extra = "Session: 12345678\r\n"
                playing = True
            conn.sendall((f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n"
                          f"{extra}\r\n").encode() + body)
        for i in range(self.n_packets):
            pkt = RtpPacket(payload_type=96, seqnum=i, timestamp=i * 160,
                            ssrc=0xABCD, payload=bytes([i]) * 20)
            data = pkt.to_bytes()
            conn.sendall(b"$\x00" + len(data).to_bytes(2, "big") + data)
        time.sleep(0.2)
        conn.close()

    def stop(self):
        self._srv.close()


def test_rtspsrc2_receives_rtp():
    srv = MiniRtspServer(n_packets=5)
    p = parse_launch(f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/s "
                     "! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 10
    while len(sink.samples) < 5 and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.002)
    assert len(sink.samples) == 5
    s = sink.caps[0]
    assert s.name == "application/x-rtp"
    assert s["encoding-name"] == "L16"
    assert s["clock-rate"] == 8000
    pkts = [RtpPacket.parse(b.to_bytes()) for b in sink.pull_all()]
    assert [q.seqnum for q in pkts] == [0, 1, 2, 3, 4]
    p.set_state(State.NULL)
    srv.stop()


def test_rtspsrc2_connection_refused():
    el = make("rtspsrc2", location="rtsp://127.0.0.1:1/s",
              timeout_s=0.5)
    from gstpu.core.element import StateChangeReturn
    assert el.set_state(State.READY) is StateChangeReturn.FAILURE


def test_tcp_client_server_roundtrip():
    sink_el = make("tcpserversink")
    from gstpu.core.element import State as _S
    sink_el.set_state(_S.READY)
    port = sink_el.bound_port
    assert port > 0

    recv = parse_launch(f"tcpclientsrc port={port} ! appsink name=out")
    out = recv.get_by_name("out")
    recv.set_state(State.PLAYING)
    time.sleep(0.05)

    # drive the server side manually
    from gstpu.core.harness import Harness
    h = Harness(sink_el)
    h.set_caps("application/x-test")
    total = b""
    for i in range(5):
        data = bytes([i]) * 100
        h.push(Buffer(data))
        total += data
    deadline = time.monotonic() + 5
    got = b""
    while len(got) < len(total) and time.monotonic() < deadline:
        recv.iterate()
        got = b"".join(b.to_bytes() for b in out.samples)
        time.sleep(0.002)
    assert got == total
    recv.set_state(State.NULL)
    h.teardown()


class MiniRtspUdpServer(MiniRtspServer):
    """Variant honoring client_port: streams RTP over UDP after PLAY."""

    def _run(self):
        conn, _ = self._srv.accept()
        conn.settimeout(10)
        playing = False
        client_rtp = None
        buf = b""
        while not playing:
            while b"\r\n\r\n" not in buf:
                buf += conn.recv(4096)
            req, buf = buf.split(b"\r\n\r\n", 1)
            lines = req.decode().split("\r\n")
            method = lines[0].split()[0]
            cseq = next(line.split(":")[1].strip() for line in lines
                        if line.lower().startswith("cseq"))
            extra = ""
            body = b""
            if method == "DESCRIBE":
                body = SDP.encode()
                extra = ("Content-Type: application/sdp\r\n"
                         f"Content-Length: {len(body)}\r\n")
            elif method == "SETUP":
                tline = next(line for line in lines
                             if line.lower().startswith("transport"))
                assert "RTP/AVP;unicast;client_port=" in tline
                ports = tline.split("client_port=")[1].split(";")[0]
                client_rtp = int(ports.split("-")[0])
                extra = ("Session: 1\r\nTransport: RTP/AVP;unicast;"
                         f"client_port={ports};server_port=5000-5001"
                         "\r\n")
            elif method == "PLAY":
                extra = "Session: 1\r\n"
                playing = True
            conn.sendall((f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n"
                          f"{extra}\r\n").encode() + body)
        out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(self.n_packets):
            pkt = RtpPacket(payload_type=96, seqnum=i,
                            timestamp=i * 160, ssrc=0xABCD,
                            payload=bytes([i]) * 20)
            out.sendto(pkt.to_bytes(), ("127.0.0.1", client_rtp))
            time.sleep(0.01)
        out.close()
        time.sleep(0.2)
        conn.close()


def test_rtspsrc2_udp_transport():
    srv = MiniRtspUdpServer(n_packets=5)
    p = parse_launch(f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/s"
                     f" protocols=udp ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 10
    while len(sink.samples) < 5 and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.005)
    p.set_state(State.NULL)
    srv.stop()
    assert len(sink.samples) >= 5
    pkts = [RtpPacket.parse(b.to_bytes())
            for b in list(sink.samples)[:5]]
    assert [q.seqnum for q in pkts] == list(range(5))
    assert sink.caps[0]["encoding-name"] == "L16"
