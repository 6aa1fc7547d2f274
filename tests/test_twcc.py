"""TWCC transport feedback wire format (gstpu/net/rtp/twcc.py —
draft-holmer-rmcat-transport-wide-cc-extensions-01, the format the
reference's rtpgccbwe consumes)."""

import pytest

from gstpu.net.rtp.twcc import (DELTA_UNIT_NS, TwccError,
                                TwccReceiver, TwccSender,
                                parse_feedback)

MS = 1_000_000


def test_feedback_roundtrip_contiguous():
    rx = TwccReceiver(sender_ssrc=0x11, media_ssrc=0x22)
    t0 = 10_000 * MS
    for i in range(10):
        rx.record(i, t0 + i * 5 * MS)
    fb = rx.build_feedback()
    assert fb[1] == 205 and (fb[0] & 0x1F) == 15
    parsed = parse_feedback(fb)
    assert [s for s, _ in parsed] == list(range(10))
    times = [t for _, t in parsed]
    assert all(t is not None for t in times)
    # deltas are 250us-quantized: spacing preserved to the unit
    for i in range(1, 10):
        assert abs((times[i] - times[i - 1]) - 5 * MS) \
            <= DELTA_UNIT_NS


def test_feedback_with_losses_and_reorder():
    rx = TwccReceiver()
    t0 = 64_000_000 * 3
    rx.record(100, t0)
    rx.record(103, t0 + 2 * MS)        # 101,102 lost
    rx.record(102, t0 + 9 * MS)        # late arrival, recorded
    fb = rx.build_feedback()
    parsed = dict(parse_feedback(fb))
    assert parsed[101] is None
    assert parsed[100] is not None
    assert parsed[102] is not None and parsed[103] is not None


def test_large_negative_delta_uses_s16():
    rx = TwccReceiver()
    t0 = 64_000_000 * 5
    rx.record(0, t0 + 50 * MS)
    rx.record(1, t0 + 10 * MS)         # negative delta
    fb = rx.build_feedback()
    parsed = dict(parse_feedback(fb))
    assert abs(parsed[1] - (t0 + 10 * MS)) <= DELTA_UNIT_NS


def test_sender_feedback_drives_gcc():
    """Full loop: sender stamps, receiver records arrival, RTCP
    feedback bytes travel back, gcc gets PacketFeedback."""
    from gstpu.net.rtp.gcc import GccEstimator

    tx = TwccSender()
    rx = TwccReceiver()
    gcc = GccEstimator(start_bitrate=1_000_000)
    send0 = 1_000_000 * MS
    for i in range(50):
        st = send0 + i * 5 * MS
        seq = tx.stamp(st, 1200)
        rx.record(seq, st + 20 * MS)   # constant 20ms path delay
    fb = rx.build_feedback()
    packets = tx.on_feedback(fb)
    assert len(packets) == 50
    assert all(p.size == 1200 for p in packets)
    est = gcc.process_feedback(packets)
    assert est > 0


def test_parse_rejects_garbage():
    with pytest.raises(TwccError):
        parse_feedback(b"\x00" * 8)
    with pytest.raises(TwccError):
        parse_feedback(b"\x8f\xc8" + b"\x00" * 30)  # pt=200


def test_run_length_chunk_parses():
    # hand-built: 20 packets all received-small, run-length chunk
    import struct
    payload = struct.pack(">IIHH", 1, 2, 0, 20)
    payload += struct.pack(">I", (5 << 8) | 0)
    payload += struct.pack(">H", (RECEIVED_SMALL := 1) << 13 | 20)
    payload += bytes([4] * 20)         # 1ms deltas
    pad = (-len(payload)) % 4
    payload += bytes(pad)
    hdr = struct.pack(">BBH", 0x80 | 15, 205, len(payload) // 4 + 1)
    parsed = parse_feedback(hdr + payload)
    assert len(parsed) == 20
    assert all(t is not None for _, t in parsed)


def test_live_webrtc_loop_carries_twcc():
    """Extends the live webrtcsink->webrtcsrc loop: the consumer
    builds real TWCC feedback from SRTP arrivals and the producer's
    GCC consumes it into encoder bitrates."""
    import time

    from gstpu import Buffer, Caps, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Bus, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("webrtcsink", enable_data_transport=True)
    src = make("webrtcsrc", enable_data_transport=True)
    sink.bus, src.bus = Bus(), Bus()
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)

    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-alaw, rate=8000, channels=1")))
    feeder.push_event(SegmentEvent(Segment()))

    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    src.handle_signalling({"type": "list",
                           "producers": [{"id": "prod"}]})
    offer = sink.handle_signalling({"type": "startSession",
                                    "sessionId": "s1",
                                    "peerId": "cons"})
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})

    tr = sink._transports["s1"][0]
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert tr.connected

    for i in range(30):
        feeder.push(Buffer(bytes([0x55]) * 160,
                           pts=i * 20_000_000, duration=20_000_000))
        sink.pump()
        src.pump()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline \
            and not src._twcc_receiver()._arrivals:
        sink.pump()
        src.pump()
        time.sleep(0.001)

    fb = src.build_twcc_feedback()
    assert fb is not None and fb[1] == 205
    est = sink.handle_twcc_feedback(fb)
    assert est is not None and est > 0
    # bitrate distribution message landed on the bus
    msgs = []
    while (m := sink.bus.pop()) is not None:
        if m.fields.get("name") == "webrtcsink-encoder-bitrates":
            msgs.append(m)
    # no video encoders in this chain: distribution may be a no-op,
    # but the GCC estimate itself must be sane
    assert 1000 <= est <= 100_000_000
    sink.set_state(State.NULL)
    src.set_state(State.NULL)


def test_twcc_flows_in_band_over_data_channel():
    """Fully autonomous CC: the consumer automatically sends TWCC
    feedback over the SCTP control channel and the producer's pump
    routes it into GCC — no application shuttling."""
    import time

    from gstpu import Buffer, Caps, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Bus, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("webrtcsink", enable_data_transport=True)
    src = make("webrtcsrc", enable_data_transport=True)
    sink.bus, src.bus = Bus(), Bus()
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)
    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-alaw, rate=8000, channels=1")))
    feeder.push_event(SegmentEvent(Segment()))
    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    src.handle_signalling({"type": "list",
                           "producers": [{"id": "prod"}]})
    offer = sink.handle_signalling({"type": "startSession",
                                    "sessionId": "s1",
                                    "peerId": "cons"})
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})

    tr = sink._transports["s1"][0]
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected
            and any(ch.open
                    for ch in (src._transport.sctp.channels.values()
                               if src._transport.sctp else []))):
        sink.pump()
        src.pump()
        time.sleep(0.001)

    # push enough media that the consumer fires a feedback burst
    for i in range(40):
        feeder.push(Buffer(bytes([0x55]) * 160,
                           pts=i * 20_000_000, duration=20_000_000))
        sink.pump()
        src.pump()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline \
            and sink._twcc_sender()._sent and sink._gcc is None:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert sink._gcc is not None, "GCC never saw in-band feedback"
    sink.set_state(State.NULL)
    src.set_state(State.NULL)


def test_srtcp_roundtrip_and_replay():
    """SRTCP protect/unprotect (RFC 3711 3.4): roundtrip, tamper
    rejection, replay rejection."""
    import os

    import pytest as _pytest

    from gstpu.net.srtp import SrtcpContext

    key, salt = os.urandom(16), os.urandom(14)
    tx = SrtcpContext(key, salt)
    rx = SrtcpContext(key, salt)
    rtcp = bytes([0x8F, 205, 0, 5]) + b"\x00\x00\x00\x01" \
        + b"feedback-payload"
    prot = tx.protect(rtcp)
    assert prot != rtcp and len(prot) == len(rtcp) + 4 + 10
    assert rx.unprotect(prot) == rtcp
    with _pytest.raises(ValueError, match="replay"):
        rx.unprotect(prot)
    bad = bytearray(tx.protect(rtcp))
    bad[10] ^= 0xFF
    with _pytest.raises(ValueError, match="auth"):
        rx.unprotect(bytes(bad))


def test_webrtcsink_stats_surface():
    from gstpu import State
    from gstpu.core.registry import make
    sink = make("webrtcsink", enable_data_transport=True)
    sink.set_state(State.PLAYING)
    sink.handle_signalling({"type": "startSession",
                            "sessionId": "s9", "peerId": "p"})
    st = sink.stats
    assert "s9" in st["sessions"]
    assert st["sessions"]["s9"]["transport-connected"] is False
    assert st["consumer-stats"]["video-encoders"] == []
    assert st["gcc-estimate"] is None
    sink.set_state(State.NULL)


def test_webrtcsrc_jitterbuffer_reorders():
    """With latency > 0 the consumer's receive path runs rtpbin2's
    jitterbuffer: out-of-order SRTP arrivals are re-sequenced and a
    loss surfaces as an element message."""
    import time

    from gstpu import Buffer, Caps, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Bus, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    src = make("webrtcsrc", enable_data_transport=True)
    src.latency = 30 * 1_000_000
    src.bus = Bus()
    src.set_state(State.PLAYING)

    out = []
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    import gstpu as _g
    cap.chain_function = lambda p, b: (out.append(b)
                                       or _g.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    src.srcpad.link(cap)

    # inject decrypted-path packets through the jb machinery directly
    now = time.monotonic_ns()

    def rtp(seq):
        return (b"\x80\x08" + seq.to_bytes(2, "big")
                + b"\x00\x00\x00\x01" + b"\x00\x00\x00\x22"
                + bytes([seq & 0xFF]) * 8)

    for seq in (1, 2, 4, 3, 6):          # 3 late, 5 lost
        src._jb_queue(rtp(seq), now)
        now += 1_000_000
    src._jb_drain(now + src.latency + 1_000_000)

    seqs = [int.from_bytes(b.to_bytes()[2:4], "big") for b in out]
    assert seqs == [1, 2, 3, 4, 6]
    lost = []
    while (m := src.bus.pop()) is not None:
        if m.fields.get("name") == "webrtcsrc-lost-packet":
            lost.append(m.seqnum)
    assert lost == [5]
    src.set_state(State.NULL)


def test_sender_reports_flow_over_srtcp():
    """The producer emits periodic RTCP SRs over SRTCP and the
    consumer builds the NTP<->RTP sync mapping from them."""
    import time

    from gstpu import Buffer, Caps, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Bus, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("webrtcsink", enable_data_transport=True)
    src = make("webrtcsrc", enable_data_transport=True)
    sink.bus, src.bus = Bus(), Bus()
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)
    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-alaw, rate=8000, channels=1")))
    feeder.push_event(SegmentEvent(Segment()))
    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    src.handle_signalling({"type": "list",
                           "producers": [{"id": "prod"}]})
    offer = sink.handle_signalling({"type": "startSession",
                                    "sessionId": "s1",
                                    "peerId": "cons"})
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})
    tr = sink._transports["s1"][0]
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert tr.connected

    # media makes SR accounting non-empty; the 1s SR timer fires
    # immediately on the first pump after media (last_sr == 0)
    for i in range(3):
        feeder.push(Buffer(bytes([0x55]) * 160,
                           pts=i * 20_000_000, duration=20_000_000))
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline \
            and not getattr(src, "sync_maps", None):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert getattr(src, "sync_maps", None), "no SR arrived"
    (ssrc, (ntp, rtp)), = list(src.sync_maps.items())
    assert ntp > 0
    # the consumer answers with a Receiver Report; the producer posts
    # it on the bus
    deadline = time.monotonic() + 5
    rr_msgs = []
    while time.monotonic() < deadline and not rr_msgs:
        sink.pump()
        src.pump()
        while (m := sink.bus.pop()) is not None:
            if m.fields.get("name") == "webrtcsink-receiver-report":
                rr_msgs.append(m)
        time.sleep(0.001)
    assert rr_msgs and rr_msgs[0].ssrc == ssrc
    assert rr_msgs[0].highest_seq > 0
    sink.set_state(State.NULL)
    src.set_state(State.NULL)


def test_webrtcsrc_stats_surface():
    from gstpu import State
    from gstpu.core.registry import make
    src = make("webrtcsrc", enable_data_transport=True)
    src.set_state(State.PLAYING)
    st = src.stats
    assert st["rx"] == {} and st["sync-maps"] == {}
    assert st["transport-connected"] is False
    src.set_state(State.NULL)
