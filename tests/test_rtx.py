"""RTX retransmission: RFC 4585 Generic NACK + RFC 4588 rtx streams
end to end through webrtcsink/webrtcsrc (reference webrtcsink
do-retransmission, which configures webrtcbin's rtprtxsend/receive)."""

import time

from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import Bus, Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make
from gstpu.net.rtp.packet import GenericNack, parse_rtcp


def test_generic_nack_roundtrip():
    n = GenericNack(0x11223344, 0x55667788,
                    [100, 101, 103, 116, 400])
    pkts = parse_rtcp(n.to_bytes())
    assert len(pkts) == 1
    g = pkts[0]
    assert isinstance(g, GenericNack)
    assert g.sender_ssrc == 0x11223344
    assert g.media_ssrc == 0x55667788
    assert sorted(g.lost) == [100, 101, 103, 116, 400]


def test_nack_blp_packing():
    # PID + 16-bit mask carries 17 consecutive seqs in one FCI
    n = GenericNack(1, 2, list(range(50, 67)))
    raw = n.to_bytes()
    assert len(raw) == 4 + 8 + 4
    assert sorted(parse_rtcp(raw)[0].lost) == list(range(50, 67))
    # the 18th spills into a second FCI entry
    n2 = GenericNack(1, 2, list(range(50, 68)))
    raw2 = n2.to_bytes()
    assert len(raw2) == 4 + 8 + 8
    assert sorted(parse_rtcp(raw2)[0].lost) == list(range(50, 68))


def test_rtx_unwrap():
    src = make("webrtcsrc")
    src._rtx_apt = {104: 96}
    src._pt_ssrc = {96: 0xAABBCCDD}
    rtx = (bytes([0x80, 0x80 | 104]) + (7).to_bytes(2, "big")
           + (90_000).to_bytes(4, "big") + (0xAABBCCDE).to_bytes(4, "big")
           + (1234).to_bytes(2, "big") + b"payload")
    plain = src._unwrap_rtx(rtx)
    assert plain is not None
    assert plain[1] & 0x7F == 96
    assert plain[1] & 0x80                      # marker preserved
    assert int.from_bytes(plain[2:4], "big") == 1234
    assert int.from_bytes(plain[8:12], "big") == 0xAABBCCDD
    assert plain[12:] == b"payload"
    # unknown apt: dropped
    src._rtx_apt = {104: 97}
    assert src._unwrap_rtx(rtx) is None


class _DropOnce:
    """Socket wrapper: silently eats the 3rd media RTP datagram
    (pt outside the RTCP 64-95 range), simulating network loss mid
    stream (the consumer needs earlier packets to spot the gap)."""

    def __init__(self, sock):
        self._sock = sock
        self.dropped = None
        self._media_seen = 0

    def recvfrom(self, n):
        data, addr = self._sock.recvfrom(n)
        if self.dropped is None and len(data) > 12 \
                and (data[0] >> 6) == 2 \
                and not 64 <= (data[1] & 0x7F) <= 95:
            self._media_seen += 1
            if self._media_seen == 3:
                self.dropped = data[2:4]
                raise BlockingIOError
        return data, addr

    def __getattr__(self, k):
        return getattr(self._sock, k)


def test_lost_packet_recovered_via_rtx():
    """Full live loop: one media packet is dropped on the wire; the
    consumer NACKs the gap, the producer answers on the rtx stream,
    and the jitterbuffer restores an in-order, complete sequence."""
    sink = make("webrtcsink", enable_data_transport=True)
    src = make("webrtcsrc", enable_data_transport=True,
               latency=200_000_000)
    sink.bus = Bus()
    src.bus = Bus()
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)

    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("v"))
    # pre-encoded video path: rtx applies to video m-lines
    feeder.push_event(CapsEvent(parse_caps(
        "video/x-vp8, width=64, height=64")))
    feeder.push_event(SegmentEvent(Segment()))

    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    src.handle_signalling(
        {"type": "list", "producers": [{"id": "prod"}]})
    offer = sink.handle_signalling(
        {"type": "startSession", "sessionId": "s1", "peerId": "cons"})
    sdp = offer[0]["sdp"]["sdp"]
    assert " rtx/" in sdp and "apt=" in sdp     # rtx offered
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})
    assert src._rtx_apt                         # consumer learned apt

    deadline = time.monotonic() + 10
    tr = sink._transports["s1"][0]
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert tr.connected and src._transport.connected

    out = []
    import gstpu
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b)
                                       or gstpu.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    src.srcpad.link(cap)

    dropper = _DropOnce(src._sock)
    src._sock = dropper

    # push VP8-looking frames through the payloader path
    n = 10
    for i in range(n):
        feeder.push(Buffer(bytes([0x10 + i]) * 120,
                           pts=i * 33_000_000, duration=33_000_000))
        sink.pump()
        src.pump()
    deadline = time.monotonic() + 10
    while len(out) < n and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)

    assert dropper.dropped is not None, "no packet was dropped"
    assert len(out) >= n                        # nothing lost
    seqs = [int.from_bytes(b.to_bytes()[2:4], "big") for b in out]
    assert seqs == sorted(seqs)                 # in order
    assert int.from_bytes(dropper.dropped, "big") in seqs  # recovered
    # evidence on both buses
    sink_msgs, src_msgs = [], []
    while (m := sink.bus.pop()) is not None:
        sink_msgs.append(m.fields.get("name"))
    while (m := src.bus.pop()) is not None:
        src_msgs.append(m.fields.get("name"))
    assert "webrtcsink-retransmit" in sink_msgs
    assert "webrtcsrc-nack" in src_msgs
    sink.set_state(State.NULL)
    src.set_state(State.NULL)
