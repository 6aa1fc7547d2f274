"""ST-2038 ANC codec + converter element tests."""

import pytest

from gstpu import Buffer
from gstpu.codecs.st2038 import build_anc, iter_anc, parse_anc
from gstpu.core.harness import Harness
from gstpu.core.registry import make


def test_anc_roundtrip():
    payload = bytes(range(17))
    anc = build_anc(0x61, 0x01, payload, line_number=9,
                    horizontal_offset=123)
    hdr, back = parse_anc(anc)
    assert (hdr.did, hdr.sdid, hdr.data_count) == (0x61, 0x01, 17)
    assert (hdr.line_number, hdr.horizontal_offset) == (9, 123)
    assert back == payload
    # checksum b9 is the inverse of b8
    assert (hdr.checksum >> 9) & 1 == (~(hdr.checksum >> 8)) & 1


def test_anc_multiple_packets_and_stuffing():
    data = (build_anc(0x61, 0x01, b"one") +
            build_anc(0x45, 0x01, b"other-service") +
            build_anc(0x61, 0x02, b"two") + b"\xff\xff\xff")
    got = [(h.did, h.sdid, p) for h, p in iter_anc(data)]
    assert got == [(0x61, 0x01, b"one"), (0x45, 0x01, b"other-service"),
                   (0x61, 0x02, b"two")]


def test_anc_rejects_garbage():
    with pytest.raises(ValueError):
        parse_anc(b"\xc0\x00\x00\x00\x00\x00")  # zero bits not zero
    with pytest.raises(ValueError):
        build_anc(0x61, 0x01, bytes(256))


def test_cc_to_anc_to_cc_roundtrip():
    from gstpu.codecs.cea708 import Cdp, build_cdp, pad_cc_data
    cdp = build_cdp(Cdp(cc_data=pad_cc_data(b"\xfc\x94\x2c", 20)))

    to_anc = Harness(make("cctost2038anc", line_number=11))
    to_anc.set_caps("closedcaption/x-cea-708, format=cdp")
    to_anc.push(Buffer(cdp, pts=42))
    anc_buf = to_anc.pull()
    hdr, payload = parse_anc(anc_buf.to_bytes())
    assert (hdr.did, hdr.sdid, hdr.line_number) == (0x61, 0x01, 11)
    assert payload == cdp
    to_anc.teardown()

    back = Harness(make("st2038anctocc"))
    back.set_caps("meta/x-st-2038")
    back.push(anc_buf)
    out = back.pull()
    assert out.to_bytes() == cdp
    assert out.pts == 42
    assert back.element.srcpad.caps()[0].name == "closedcaption/x-cea-708"
    back.teardown()


def test_anctocc_skips_foreign_services():
    data = (build_anc(0x41, 0x05, b"vanc-timecode") +
            build_anc(0x61, 0x02, b"\x80\x94\x2c"))
    h = Harness(make("st2038anctocc"))
    h.set_caps("meta/x-st-2038")
    h.push(Buffer(data))
    outs = h.pull_all()
    assert len(outs) == 1 and outs[0].to_bytes() == b"\x80\x94\x2c"
    h.teardown()


def test_rtp_smpte291_roundtrip():
    """ST-2038 buffers -> RFC 8331 RTP -> ST-2038, byte-exact."""
    from gstpu.net.rtp.packet import RtpPacket

    anc_in = (build_anc(0x61, 0x01, bytes(range(20)), line_number=9,
                        horizontal_offset=5) +
              build_anc(0x61, 0x02, b"\x94\x2c", c_not_y=True,
                        line_number=11))
    pay = Harness(make("rtpsmpte291pay2", ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("meta/x-st-2038, alignment=frame")
    pay.push(Buffer(anc_in, pts=0))
    pkts = pay.pull_all()
    assert len(pkts) == 1
    p = RtpPacket.parse(pkts[0].to_bytes())
    assert p.marker
    assert p.payload[4] == 2                   # ANC_count
    assert int.from_bytes(p.payload[2:4], "big") == len(p.payload) - 8
    assert len(p.payload) % 4 == 0             # 32-bit word alignment
    pay.teardown()

    depay = Harness(make("rtpsmpte291depay2"))
    depay.set_caps("application/x-rtp, media=video, clock-rate=90000, "
                   "encoding-name=SMPTE291, payload=96")
    depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert b"".join(o.to_bytes() for o in outs) == anc_in
    hdrs = [parse_anc(o.to_bytes())[0] for o in outs]
    assert [h.sdid for h in hdrs] == [0x01, 0x02]
    assert hdrs[1].c_not_y and hdrs[1].line_number == 11
    depay.teardown()


def _anc_feeder():
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu import Caps
    return Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                           Caps.any()))


def test_st2038_demux_splits_streams():
    from gstpu import Caps, FlowReturn
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)

    dm = make("st2038ancdemux")
    combined = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                          Caps.any()))
    cap.chain_function = lambda p, b: (combined.append(b),
                                       FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    dm.static_pad("src").link(cap)

    f = _anc_feeder()
    f.link(dm.static_pad("sink"))
    f.push_event(StreamStartEvent("s"))
    f.push_event(CapsEvent(parse_caps("meta/x-st-2038")))
    f.push_event(SegmentEvent(Segment()))
    a = build_anc(0x61, 0x01, b"cdp", line_number=9)
    b = build_anc(0x45, 0x05, b"tc", line_number=12)
    f.push(Buffer(a + b, pts=5))
    # combined pad re-emits one packet per buffer
    assert [x.to_bytes() for x in combined] == [a, b]
    # sometimes pads appeared with the reference naming scheme
    names = sorted(p for p in dm.pads if p.startswith("anc_"))
    assert names == ["anc_45_05_at_12_0", "anc_61_01_at_9_0"]
    # late linking still receives subsequent data
    got = []
    sp = dm.static_pad("anc_61_01_at_9_0")
    cap2 = Pad("c2", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    cap2.chain_function = lambda p, x: (got.append(x), FlowReturn.OK)[1]
    cap2.event_function = lambda p, e: True
    sp.link(cap2)
    f.push(Buffer(a, pts=6))
    assert [x.to_bytes() for x in got] == [a]


def test_st2038_mux_merges_by_timestamp():
    from gstpu.core.caps import parse_caps
    from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                                  SegmentEvent, StreamStartEvent)
    from gstpu import Caps, FlowReturn, State
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)

    mx = make("st2038ancmux")
    out = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                          Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    mx.static_pad("src").link(cap)
    feeders = []
    for _ in range(2):
        f = _anc_feeder()
        f.link(mx.request_pad())
        f.push_event(StreamStartEvent("s"))
        f.push_event(CapsEvent(parse_caps("meta/x-st-2038")))
        f.push_event(SegmentEvent(Segment()))
        feeders.append(f)
    a = build_anc(0x61, 0x01, b"one")
    b = build_anc(0x61, 0x02, b"two")
    feeders[0].push(Buffer(a, pts=0))
    feeders[1].push(Buffer(b, pts=0))
    assert out and out[0].to_bytes() == a + b
    for f in feeders:
        f.push_event(EosEvent())


def test_st2038_combiner_extractor_meta_path():
    import numpy as np
    from gstpu.core.harness import Harness
    from gstpu.core.video import VideoInfo
    from gstpu.elements.video.st2038 import St2038Meta
    from gstpu import Caps, FlowReturn
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.caps import parse_caps

    anc = build_anc(0x61, 0x01, b"cdp-bytes")
    cb = make("st2038combiner")
    h = Harness(cb)
    h.set_caps("video/x-raw, format=RGBA, width=4, height=4, "
               "framerate=30/1")
    ancpad = cb.request_pad()
    feeder = Pad("f", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(ancpad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps("meta/x-st-2038")))
    feeder.push_event(SegmentEvent(Segment()))
    feeder.push(Buffer(anc, pts=5))
    vi = VideoInfo("RGBA", 4, 4)
    h.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=0))
    out = h.pull()
    metas = [m for m in out.metas if isinstance(m, St2038Meta)]
    assert metas and metas[0].data == anc
    h.teardown()

    ex = make("st2038extractor")
    h2 = Harness(ex)
    h2.set_caps("video/x-raw, format=RGBA, width=4, height=4, "
                "framerate=30/1")
    h2.push(out)
    got = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    ex.static_pad("anc").link(cap)
    b2 = vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=40)
    b2.add_meta(St2038Meta(anc))
    h2.push(b2)
    assert [g.to_bytes() for g in got] == [anc]
    assert all(not v.metas for v in h2.pull_all())
    h2.teardown()
