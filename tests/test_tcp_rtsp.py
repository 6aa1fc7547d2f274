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


# ---------------------------------------------------------------------------
# RTCP + seek (reference net/rtsp: interleaved RTCP channels, SR sync,
# RR receiver reports; PLAY-with-Range repositioning)
# ---------------------------------------------------------------------------

class RtcpSeekRtspServer(MiniRtspServer):
    """Interleaved server that sends an RTCP SR before the RTP, reads
    back a receiver report on channel 1, and honors PAUSE + PLAY with
    a Range header by jumping the sequence numbers."""

    def __init__(self, n_packets=5):
        self.got_rr = threading.Event()
        self.rr_packets = []
        self.got_range = threading.Event()
        self.range_value = None
        super().__init__(n_packets)

    def _serve_control(self, conn, buf):
        playing = False
        while not playing:
            while b"\r\n\r\n" not in buf:
                chunk = conn.recv(4096)
                if not chunk:
                    return None, buf
                buf += chunk
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
                extra = ("Session: 77\r\nTransport: RTP/AVP/TCP;"
                         "unicast;interleaved=0-1\r\n")
            elif method == "PAUSE":
                extra = "Session: 77\r\n"
            elif method == "PLAY":
                extra = "Session: 77\r\n"
                rng = [line for line in lines
                       if line.lower().startswith("range")]
                if rng:
                    self.range_value = rng[0].split(":", 1)[1].strip()
                    self.got_range.set()
                playing = True
            conn.sendall((f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n"
                          f"{extra}\r\n").encode() + body)
        return True, buf

    def _run(self):
        from gstpu.net.rtp.packet import SenderReport, parse_rtcp
        conn, _ = self._srv.accept()
        conn.settimeout(10)
        ok, buf = self._serve_control(conn, b"")
        if not ok:
            return
        # RTCP SR on channel 1 (NTP epoch-ish value, RTP ts 800)
        sr = SenderReport(0xABCD, (3_900_000_000 << 32), 800, 10,
                          2000).to_bytes()
        conn.sendall(b"$\x01" + len(sr).to_bytes(2, "big") + sr)
        for i in range(self.n_packets):
            pkt = RtpPacket(payload_type=96, seqnum=i, timestamp=i * 160,
                            ssrc=0xABCD, payload=bytes([i]) * 20)
            data = pkt.to_bytes()
            conn.sendall(b"$\x00" + len(data).to_bytes(2, "big") + data)
        # second SR: the client already has reception stats, so its
        # prompt RR answer will carry a report block
        conn.sendall(b"$\x01" + len(sr).to_bytes(2, "big") + sr)
        # read frames from the client until an RTCP RR arrives
        deadline = time.monotonic() + 8
        while not self.got_rr.is_set() and time.monotonic() < deadline:
            try:
                while len(buf) < 4 or (buf[0:1] == b"$"
                                       and len(buf) <
                                       4 + int.from_bytes(buf[2:4], "big")):
                    chunk = conn.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
            except socket.timeout:
                break
            if buf[0:1] == b"$":
                n = int.from_bytes(buf[2:4], "big")
                ch, payload, buf = buf[1], buf[4:4 + n], buf[4 + n:]
                if ch == 1:
                    pkts = parse_rtcp(payload)
                    # ignore the RR answering the pre-RTP SR (it has
                    # no reception stats yet); wait for a real one
                    if any(getattr(x, "reports", None)
                           and x.reports[0].ext_highest_seq >= 4
                           for x in pkts):
                        self.rr_packets = pkts
                        self.got_rr.set()
            else:
                # interleaved RTSP request (e.g. PAUSE during seek)
                if b"\r\n\r\n" not in buf:
                    continue
                ok, buf = self._serve_control(conn, buf)
                if not ok:
                    return
                # after a re-PLAY: stream post-seek packets
                for i in range(3):
                    pkt = RtpPacket(payload_type=96, seqnum=100 + i,
                                    timestamp=40000 + i * 160,
                                    ssrc=0xABCD,
                                    payload=bytes([100 + i]) * 20)
                    d = pkt.to_bytes()
                    conn.sendall(b"$\x00" + len(d).to_bytes(2, "big")
                                 + d)
        time.sleep(0.3)
        conn.close()


def test_rtspsrc2_rtcp_sr_and_rr():
    from gstpu.net.rtp.packet import ReceiverReport
    srv = RtcpSeekRtspServer(n_packets=5)
    p = parse_launch(f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/s"
                     " name=src ! appsink name=sink")
    sink = p.get_by_name("sink")
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 10
    while (len(sink.samples) < 5 or not srv.got_rr.is_set()) \
            and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.002)
    p.set_state(State.NULL)
    srv.stop()
    assert len(sink.samples) >= 5
    # the SR produced an NTP<->RTP mapping in the session
    assert src._session is not None
    assert src._session.ntp_rtp_mapping(0xABCD) is not None
    # and the server received our receiver report about its stream
    assert srv.got_rr.is_set()
    rr = next(x for x in srv.rr_packets
              if isinstance(x, ReceiverReport))
    assert rr.reports and rr.reports[0].ssrc == 0xABCD
    assert rr.reports[0].ext_highest_seq >= 4


def test_rtspsrc2_seek_sends_range():
    srv = RtcpSeekRtspServer(n_packets=3)
    p = parse_launch(f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/s"
                     " name=src ! appsink name=sink")
    sink = p.get_by_name("sink")
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 10
    while len(sink.samples) < 3 and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.002)
    assert len(sink.samples) >= 3
    assert src.seek(5_000_000_000)
    assert srv.got_range.wait(5)
    assert srv.range_value == "npt=5.000-"
    # post-seek packets arrive with the jumped seqnums
    deadline = time.monotonic() + 10
    while len(sink.samples) < 6 and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.002)
    p.set_state(State.NULL)
    srv.stop()
    pkts = [RtpPacket.parse(b.to_bytes()) for b in sink.pull_all()]
    assert any(q.seqnum >= 100 for q in pkts)


class AuthRtspServer(MiniRtspServer):
    """Challenges with Digest, accepts a correct response."""

    REALM, NONCE = "gstpu-test", "abc123nonce"

    def __init__(self):
        self.requests = []
        super().__init__()

    def _run(self):
        import hashlib
        conn, _ = self._srv.accept()
        conn.settimeout(5)
        buf = b""
        authed = False
        while True:
            while b"\r\n\r\n" not in buf:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                buf += chunk
            head, buf = buf.split(b"\r\n\r\n", 1)
            lines = head.decode().split("\r\n")
            method, url = lines[0].split()[0], lines[0].split()[1]
            hdrs = {l.split(":")[0].lower(): l.partition(":")[2].strip()
                    for l in lines[1:] if ":" in l}
            cseq = hdrs.get("cseq", "1")
            self.requests.append((method, hdrs))
            if not authed:
                auth = hdrs.get("authorization", "")
                ok = False
                if auth.startswith("Digest"):
                    fields = {}
                    for part in auth[7:].split(","):
                        k, _, v = part.strip().partition("=")
                        fields[k.lower()] = v.strip('"')
                    ha1 = hashlib.md5(
                        f"user:{self.REALM}:pw".encode()).hexdigest()
                    ha2 = hashlib.md5(
                        f"{method}:{fields.get('uri')}".encode()
                    ).hexdigest()
                    want = hashlib.md5(
                        f"{ha1}:{self.NONCE}:{ha2}".encode()
                    ).hexdigest()
                    ok = fields.get("response") == want
                if not ok:
                    conn.sendall(
                        (f"RTSP/1.0 401 Unauthorized\r\n"
                         f"CSeq: {cseq}\r\n"
                         f'WWW-Authenticate: Digest realm="'
                         f'{self.REALM}", nonce="{self.NONCE}"'
                         f"\r\n\r\n").encode())
                    continue
                authed = True
            conn.sendall((f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n"
                          f"Public: OPTIONS, DESCRIBE\r\n\r\n")
                         .encode())
            if method == "OPTIONS" and authed:
                return


def test_rtsp_digest_authentication():
    from gstpu.elements.net.rtsp import RtspConnection
    srv = AuthRtspServer()
    c = RtspConnection(f"rtsp://user:pw@127.0.0.1:{srv.port}/s")
    status, hdrs, _ = c.request("OPTIONS")
    assert status == 200
    # first request was challenged, retry carried a valid digest
    methods = [m for m, h in srv.requests]
    assert methods == ["OPTIONS", "OPTIONS"]
    assert "authorization" in srv.requests[1][1]
    assert srv.requests[1][1]["authorization"].startswith("Digest")


def test_control_response_does_not_eat_interleaved_media():
    """Frames arriving while a control request waits for its reply
    are queued and delivered afterwards (keep-alive/seek must not
    drop media)."""
    import socket as _socket
    import threading as _threading

    from gstpu.elements.net.rtsp import RtspConnection

    srv = _socket.socket()
    srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def run():
        conn, _ = srv.accept()
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(4096)
        # media frame FIRST, then the control reply
        frame = b"$" + bytes([0]) + (5).to_bytes(2, "big") + b"MEDIA"
        conn.sendall(frame +
                     b"RTSP/1.0 200 OK\r\nCSeq: 1\r\n\r\n")
        import time as _t
        _t.sleep(0.5)
        conn.close()

    _threading.Thread(target=run, daemon=True).start()
    c = RtspConnection(f"rtsp://127.0.0.1:{srv.getsockname()[1]}/s",
                       timeout=5)
    status, _, _ = c.request("OPTIONS")
    assert status == 200
    got = c.read_data_frame(blocking=False)
    assert got == (0, b"MEDIA")
    srv.close()


def test_rtspsrc2_port_start_and_latency_query():
    """Round-5 knobs: port-start picks an even RTP port at/above the
    requested base, and the latency property rides latency queries."""
    from gstpu.core.query import LatencyQuery
    from gstpu.core.registry import make
    src = make("rtspsrc2", protocols="udp", port_start=40000,
               latency=350, receive_mtu=2048)
    # port scan helper is exercised through a fake SETUP path: bind
    # directly like start() does
    import socket as _socket
    # simulate: property drives _bind via the start() closure; here we
    # check the property surface + latency accumulation contract
    q = LatencyQuery()
    src.add_latency(q)
    assert q.min_latency == 350 * 1_000_000
    assert src.port_start == 40000 and src.receive_mtu == 2048


def test_rtspsrc2_udp_port_start_respected():
    srv = MiniRtspUdpServer(n_packets=3)
    p = parse_launch(f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/s"
                     f" protocols=udp port-start=41000 name=r ! "
                     f"appsink name=sink")
    sink = p.get_by_name("sink")
    r = p.get_by_name("r")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 10
    while len(sink.samples) < 3 and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.005)
    rtp_port = r._rtp_sock.getsockname()[1]
    rtcp_port = r._rtcp_sock.getsockname()[1]
    p.set_state(State.NULL)
    srv.stop()
    assert len(sink.samples) >= 3
    assert rtp_port >= 41000 and rtp_port % 2 == 0
    assert rtcp_port == rtp_port + 1
