"""RFC 5109 ULPFEC + RFC 2198 RED: codec-level round trips and the
live webrtcsink/webrtcsrc session where a dropped media packet is
recovered from FEC alone (retransmission disabled) — the reference
path is webrtcbin's rtpulpfecenc/dec, budgeted by webrtcsink's
fec-percentage (net/webrtc/src/webrtcsink/imp.rs:1677-1695)."""

import time

from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import Bus, Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make
from gstpu.net.rtp.ulpfec import (FecDecoder, fec_encode_window,
                                  fec_protected_seqs, fec_recover,
                                  red_encap, red_parse)


def _rtp(seq, ts, payload, *, pt=96, marker=False, ssrc=0x1234,
         byte0=0x80):
    return (bytes([byte0, (0x80 if marker else 0) | pt])
            + seq.to_bytes(2, "big") + ts.to_bytes(4, "big")
            + ssrc.to_bytes(4, "big") + payload)


def test_fec_recovers_each_single_loss():
    # varying lengths, markers, a padding bit and an extension bit in
    # the mix so the P/X/CC recovery fields matter
    pkts = [
        _rtp(1000, 3000, b"a" * 50),
        _rtp(1001, 3000, b"bb" * 40, marker=True, byte0=0xA0),
        _rtp(1002, 3090, b"c" * 123, byte0=0x90),
        _rtp(1003, 3090, b"dd" * 7, marker=True),
    ]
    fec = fec_encode_window(pkts, fec_pt=112, fec_ssrc=0x1236,
                            seq_start=7, n_fec=1)
    assert len(fec) == 1
    assert fec_protected_seqs(fec[0]) == [1000, 1001, 1002, 1003]
    assert fec[0][1] & 0x7F == 112
    assert int.from_bytes(fec[0][2:4], "big") == 7
    for miss in range(4):
        have = [p for i, p in enumerate(pkts) if i != miss]
        got = fec_recover(fec[0], have, 1000 + miss, 0x1234)
        assert got == pkts[miss]


def test_fec_window_striping():
    pkts = [_rtp(10 + i, 500 + i, bytes([i]) * (20 + i))
            for i in range(6)]
    fec = fec_encode_window(pkts, fec_pt=112, fec_ssrc=9,
                            seq_start=0, n_fec=2)
    assert len(fec) == 2
    assert fec_protected_seqs(fec[0]) == [10, 12, 14]
    assert fec_protected_seqs(fec[1]) == [11, 13, 15]
    # one loss in each stripe, both recovered
    got0 = fec_recover(fec[0], [pkts[0], pkts[4]], 12, 0x1234)
    got1 = fec_recover(fec[1], [pkts[1], pkts[3]], 15, 0x1234)
    assert got0 == _rtp(12, 502, bytes([2]) * 22)
    assert got1 == _rtp(15, 505, bytes([5]) * 25)


def test_fec_decoder_pending_retry():
    """FEC arriving before part of its window is held and recovers
    once enough media has shown up."""
    pkts = [_rtp(40 + i, 9, bytes([i + 1]) * 30) for i in range(4)]
    fec = fec_encode_window(pkts, fec_pt=112, fec_ssrc=2,
                            seq_start=0, n_fec=1)[0]
    dec = FecDecoder()
    dec.add_media(pkts[0])
    assert dec.add_fec(fec, 0x1234) == []       # 3 missing: pending
    dec.add_media(pkts[3])
    assert dec.retry(0x1234) == []              # still 2 missing
    dec.add_media(pkts[1])
    assert dec.retry(0x1234) == [pkts[2]]       # one missing: fixed
    assert dec.seen(0x1234, 42)
    assert dec.retry(0x1234) == []              # consumed


def test_red_roundtrip():
    red = red_encap([(96, 960, b"old-frame"), (96, 480, b"older")],
                    (96, b"primary-data"))
    blocks = red_parse(red)
    assert blocks == [(96, 960, b"old-frame"), (96, 480, b"older"),
                      (96, 0, b"primary-data")]
    # primary-only encapsulation is one header byte
    solo = red_encap([], (111, b"opus"))
    assert solo == bytes([111]) + b"opus"
    assert red_parse(solo) == [(111, 0, b"opus")]


class _DropMediaPacket:
    """Eats the Nth RTP datagram with exactly the media payload type,
    leaving FEC (different pt) untouched."""

    def __init__(self, sock, pt, nth):
        self._sock = sock
        self._pt = pt
        self._nth = nth
        self.dropped = None
        self._seen = 0

    def recvfrom(self, n):
        data, addr = self._sock.recvfrom(n)
        if self.dropped is None and len(data) > 12 \
                and (data[0] >> 6) == 2 \
                and (data[1] & 0x7F) == self._pt:
            self._seen += 1
            if self._seen == self._nth:
                self.dropped = data[2:4]
                raise BlockingIOError
        return data, addr

    def __getattr__(self, k):
        return getattr(self._sock, k)


def test_lost_packet_recovered_via_fec_alone():
    """Live loop with retransmission DISABLED: a dropped media packet
    comes back via the ULPFEC stream only."""
    sink = make("webrtcsink", enable_data_transport=True,
                do_retransmission=False, fec_percentage=30)
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
    assert " ulpfec/" in sdp and "apt=" in sdp   # fec offered
    assert " rtx/" not in sdp                    # rtx off
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})
    assert src._fec_apt and not src._rtx_apt

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

    dropper = _DropMediaPacket(src._sock, pt=96, nth=5)
    src._sock = dropper

    # 3000-byte frames fragment into 3 media packets at mtu 1400,
    # marker on the last -> a 3-packet FEC window per frame, and
    # fec-percentage=30 -> 1 parity packet per frame
    n = 8
    expect = 3 * n
    for i in range(n):
        feeder.push(Buffer(bytes([0x10 + i]) * 3000,
                           pts=i * 33_000_000, duration=33_000_000))
        sink.pump()
        src.pump()
    deadline = time.monotonic() + 10
    while len(out) < expect and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)

    assert dropper.dropped is not None, "no packet was dropped"
    assert len(out) >= expect                   # nothing lost
    seqs = [int.from_bytes(b.to_bytes()[2:4], "big") for b in out]
    assert seqs == sorted(seqs)                 # in order
    assert int.from_bytes(dropper.dropped, "big") in seqs  # recovered
    sink_msgs, src_msgs = [], []
    while (m := sink.bus.pop()) is not None:
        sink_msgs.append(m.fields.get("name"))
    while (m := src.bus.pop()) is not None:
        src_msgs.append(m.fields.get("name"))
    assert "webrtcsink-fec-encoded" in sink_msgs
    assert "webrtcsrc-fec-recovered" in src_msgs
    assert "webrtcsink-retransmit" not in sink_msgs
    sink.set_state(State.NULL)
    src.set_state(State.NULL)
