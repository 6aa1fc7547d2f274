"""Server-reflexive candidate gathering (RFC 8489 Binding + RFC 8445
§5.1.1.2) against an in-process STUN responder — the reference's
stun-server property surface."""

import socket
import threading

from gstpu import Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make
from gstpu.net.webrtc.ice import gather_srflx
from gstpu.net.webrtc.stun import (BINDING_REQUEST, BINDING_SUCCESS,
                                   StunMessage)


class StunResponder:
    """Minimal classic-STUN server: answers Binding Requests with the
    sender's XOR-MAPPED-ADDRESS."""

    def __init__(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(3.0)
        self.addr = self.sock.getsockname()
        self.served = 0
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        while True:
            try:
                data, src = self.sock.recvfrom(2048)
            except OSError:
                return
            try:
                msg = StunMessage.parse(data)
            except Exception:
                continue
            if msg.msg_type != BINDING_REQUEST:
                continue
            resp = StunMessage(BINDING_SUCCESS, msg.transaction_id)
            resp.add_xor_mapped_address(src)
            self.sock.sendto(resp.to_bytes(), src)
            self.served += 1

    def close(self):
        self.sock.close()


def test_gather_srflx_roundtrip():
    server = StunResponder()
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        cand = gather_srflx(s, server.addr)
        assert cand is not None
        assert cand.typ == "srflx"
        # loopback: the reflexive address IS the local binding
        assert (cand.address, cand.port) == s.getsockname()
        assert server.served == 1
        s.close()
    finally:
        server.close()


def test_gather_srflx_timeout_returns_none():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    # a bound-but-silent "server"
    dead = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dead.bind(("127.0.0.1", 0))
    assert gather_srflx(s, dead.getsockname(), timeout=0.05,
                        retries=2) is None
    s.close()
    dead.close()


def test_webrtcsink_offers_srflx_candidate():
    server = StunResponder()
    try:
        sink = make("webrtcsink", enable_data_transport=True,
                    stun_server=f"stun://127.0.0.1:{server.addr[1]}")
        sink.set_state(State.PLAYING)
        pad = sink.request_pad()
        feeder = Pad("feed", PadDirection.SRC,
                     PadTemplate("src", PadDirection.SRC,
                                 PadPresence.ALWAYS, Caps.any()))
        feeder.link(pad)
        feeder.push_event(StreamStartEvent("a"))
        feeder.push_event(CapsEvent(parse_caps(
            "audio/x-alaw, rate=8000, channels=1")))
        feeder.push_event(SegmentEvent(Segment()))
        sink.signalling_connect({"peerId": "p"})
        offer = sink.handle_signalling(
            {"type": "startSession", "sessionId": "s1",
             "peerId": "c"})
        sdp = offer[0]["sdp"]["sdp"]
        assert "typ srflx" in sdp
        assert "typ host" in sdp
        sink.set_state(State.NULL)
    finally:
        server.close()
