"""RFC 7273 clock signalling + forward-metas (reference webrtcsink
do-clock-signalling, webrtcsink/imp.rs:2405-2460; forward-metas,
utils.rs:1416-1490 + imp.rs:1733-1751) and the SNTP NtpClock behind
them (gstpu/core/netclock.py, counterpart of gst_net::NtpClock)."""

import json
import socket
import struct
import threading
import time

from gstpu import Buffer, Caps, State
from gstpu.core.buffer import VideoTimeCodeMeta
from gstpu.core.caps import parse_caps
from gstpu.core.element import (Bus, Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.netclock import (NTP_UNIX_OFFSET, NtpClock,
                                 _from_ntp_ts, _to_ntp_ts)
from gstpu.core.registry import make

SECOND = 1_000_000_000


class _MockSntpServer:
    """RFC 4330 server whose clock runs `skew_ns` ahead of local."""

    def __init__(self, skew_ns: int):
        self.skew = skew_ns
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.addr = self.sock.getsockname()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        self.sock.settimeout(0.2)
        while not self._stop:
            try:
                data, addr = self.sock.recvfrom(1024)
            except OSError:
                continue
            if len(data) < 48:
                continue
            req = struct.unpack(">BBBb11I", data[:48])
            now = time.time_ns() + self.skew
            s, f = _to_ntp_ts(now)
            # LI=0 VN=4 Mode=4 (server); originate = client transmit,
            # receive == transmit == now (zero processing time)
            resp = struct.pack(
                ">BBBb11I", 0x24, 1, 0, -20,
                0, 0, 0,                     # rootdelay/disp, refid
                0, 0,                        # reference timestamp
                req[13], req[14],            # originate <- client T1
                s & 0xFFFFFFFF, f,           # receive
                s & 0xFFFFFFFF, f)           # transmit
            self.sock.sendto(resp, addr)

    def close(self):
        self._stop = True
        self.sock.close()


def test_ntp_clock_syncs_to_server_offset():
    skew = 5 * SECOND
    srv = _MockSntpServer(skew)
    try:
        clk = NtpClock("127.0.0.1", srv.addr[1], poll_interval=60)
        try:
            expect = (time.time_ns() + skew
                      + NTP_UNIX_OFFSET * SECOND)
            got = clk.time()
            # loopback round trip: sub-ms agreement
            assert abs(got - expect) < 50_000_000, (got, expect)
            assert clk.ts_refclk() == f"ntp=127.0.0.1:{srv.addr[1]}"
        finally:
            clk.close()
    finally:
        srv.close()


def test_ntp_clock_requires_live_server():
    import pytest
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))          # bound but never answers
    port = sock.getsockname()[1]
    sock.close()
    with pytest.raises(OSError):
        NtpClock("127.0.0.1", port)


def test_ntp_timestamp_roundtrip():
    t = 1_755_600_000_123_456_789
    s, f = _to_ntp_ts(t)
    assert abs(_from_ntp_ts(s, f) - (t + NTP_UNIX_OFFSET * SECOND)) < 2


def _offer_for(sink) -> str:
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
    offer = sink.handle_signalling(
        {"type": "startSession", "sessionId": "s1", "peerId": "c"})
    return offer[0]["sdp"]["sdp"]


def test_offer_signals_ntp_clock_rfc7273():
    srv = _MockSntpServer(0)
    clk = NtpClock("127.0.0.1", srv.addr[1], poll_interval=60)
    try:
        sink = make("webrtcsink", do_clock_signalling=True)
        sink.bus = Bus()
        sink.clock = clk
        sink.set_state(State.PLAYING)
        sdp = _offer_for(sink)
        assert f"a=ts-refclk:ntp=127.0.0.1:{srv.addr[1]}" in sdp
        assert "a=mediaclk:direct=0" in sdp
        # the payloader's RTP timestamps were re-based to the clock
        pay = next(iter(sink._payloaders.values()))
        bt = sink.base_time or clk.time()
        assert abs(pay._ts_offset
                   - (bt * 90_000 // SECOND) % (1 << 32)) \
            < 2 * 90_000          # within 2 s of clock progress
        sink.set_state(State.NULL)
    finally:
        clk.close()
        srv.close()


def test_offer_signals_local_clock_without_provenance():
    sink = make("webrtcsink", do_clock_signalling=True)
    sink.bus = Bus()
    sink.set_state(State.PLAYING)
    sdp = _offer_for(sink)
    assert "a=ts-refclk:local" in sdp
    assert "a=mediaclk:sender" in sdp
    sink.set_state(State.NULL)


def test_offer_has_no_clock_lines_by_default():
    sink = make("webrtcsink")
    sink.bus = Bus()
    sink.set_state(State.PLAYING)
    sdp = _offer_for(sink)
    assert "ts-refclk" not in sdp and "mediaclk" not in sdp
    sink.set_state(State.NULL)


def test_forward_metas_timecode_over_control_channel():
    """Live session: a VideoTimeCodeMeta on a pushed buffer arrives
    at the consumer as the reference's InfoMessage JSON on the
    control data channel; duplicates are deduped."""
    sink = make("webrtcsink", enable_data_transport=True,
                forward_metas="timecode", do_retransmission=False,
                do_fec=False)
    src = make("webrtcsrc", enable_data_transport=True,
               latency=100_000_000)
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
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})

    deadline = time.monotonic() + 10
    tr = sink._transports["s1"][0]
    def _ctrl_open():
        ch = getattr(tr, "_gstpu_control_channel", None)
        if ch is None:
            return False
        st = tr.sctp.channels.get(ch)
        return st is not None and st.open

    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected and _ctrl_open()):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert _ctrl_open()

    tc = VideoTimeCodeMeta(hours=1, minutes=2, seconds=3, frames=4,
                           fps=(30, 1))
    for i in range(3):
        b = Buffer(bytes([i]) * 500, pts=i * 33_000_000,
                   duration=33_000_000)
        b.metas.append(tc if i < 2 else VideoTimeCodeMeta(
            hours=1, minutes=2, seconds=3, frames=5, fps=(30, 1)))
        feeder.push(b)
        sink.pump()
        src.pump()

    msgs = []
    deadline = time.monotonic() + 10
    while len(msgs) < 2 and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        for m in src.bus.drain():
            if getattr(m, "name", "") == "data-channel-message":
                d = json.loads(m.fields["data"])
                if d.get("info", {}).get("meta", {}).get("type") \
                        == "timeCode":
                    msgs.append(d)
        time.sleep(0.001)
    # 3 buffers, but the first two carried the SAME timecode -> 2
    assert len(msgs) == 2, msgs
    meta0 = msgs[0]["info"]["meta"]
    assert meta0["hours"] == 1 and meta0["frames"] == 4
    assert meta0["fps"] == [30, 1]
    assert msgs[1]["info"]["meta"]["frames"] == 5
    sink.set_state(State.NULL)
    src.set_state(State.NULL)


def test_control_channel_can_be_disabled():
    sink = make("webrtcsink", enable_control_data_channel=False)
    assert sink.enable_control_data_channel is False
    sink2 = make("webrtcsink")
    assert sink2.enable_control_data_channel is True
