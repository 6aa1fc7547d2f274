"""CEA-708 CDP codec + cea608tocea708 element tests."""

import pytest

from gstpu import Buffer
from gstpu.codecs.cea708 import (CC_COUNT, Cdp, build_cdp,
                                 cc_data_from_608, extract_cea608,
                                 pad_cc_data, parse_cdp)
from gstpu.core.harness import Harness
from gstpu.core.registry import make


def test_cdp_roundtrip():
    cc = pad_cc_data(cc_data_from_608([b"\x94\x2c", b"\x94\x2f"]), 20)
    pkt = build_cdp(Cdp(rate_code=0x4, sequence=0x1234, cc_data=cc,
                        timecode=(1, 2, 3, 4)))
    assert pkt[:2] == b"\x96\x69"
    assert sum(pkt) % 256 == 0          # zero-sum checksum
    back = parse_cdp(pkt)
    assert back.sequence == 0x1234
    assert back.rate_code == 0x4
    assert back.timecode == (1, 2, 3, 4)
    assert back.cc_data == cc
    f0, f1 = extract_cea608(back.cc_data)
    assert f0 == [b"\x94\x2c", b"\x94\x2f"] and f1 == []


def test_cdp_parse_rejects_corruption():
    pkt = bytearray(build_cdp(Cdp(cc_data=pad_cc_data(b"", 20))))
    with pytest.raises(ValueError, match="0x9669"):
        parse_cdp(b"\x00" + bytes(pkt[1:]))
    bad = bytearray(pkt); bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        parse_cdp(bytes(bad))
    with pytest.raises(ValueError, match="too short"):
        parse_cdp(pkt[:8])


def test_cc_count_budget():
    # padding fills exactly to the per-rate cc_count
    for rate, cnt in CC_COUNT.items():
        cc = pad_cc_data(cc_data_from_608([b"\x80\x80"]), cnt)
        assert len(cc) == 3 * cnt
    with pytest.raises(ValueError):
        pad_cc_data(b"\xfc\x80\x80" * 21, 20)


def test_element_cc_data():
    h = Harness(make("cea608tocea708"))
    h.set_caps("closedcaption/x-cea-608, format=raw")
    h.push(Buffer(b"\x94\x2c", pts=7))
    out = h.pull()
    assert out.to_bytes() == b"\xfc\x94\x2c"
    assert out.pts == 7
    h.teardown()


def test_element_cdp_with_framerate():
    h = Harness(make("cea608tocea708"))
    h.set_caps("closedcaption/x-cea-608, format=raw, framerate=25/1")
    h.push(Buffer(b"\x94\x2c"))
    h.push(Buffer(b"\x20\x20"))
    a, b = h.pull_all()
    # negotiation picked cdp? src template lists cc_data first, so
    # force via downstream filter instead: parse only if cdp
    if a.to_bytes()[:2] == b"\x96\x69":
        cdp0, cdp1 = parse_cdp(a.to_bytes()), parse_cdp(b.to_bytes())
        assert cdp1.sequence == cdp0.sequence + 1
        assert len(cdp0.cc_data) == 3 * CC_COUNT[0x3]  # 24 at 25fps
        f0, _ = extract_cea608(cdp0.cc_data)
        assert f0 == [b"\x94\x2c"]
    h.teardown()


def test_element_cdp_negotiated_downstream():
    from gstpu import State, parse_launch
    p = parse_launch(
        "appsrc name=src caps=\"closedcaption/x-cea-608, format=raw, "
        "framerate=30000/1001\" ! cea608tocea708 ! "
        "closedcaption/x-cea-708, format=cdp ! appsink name=out")
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"\x94\x2c"))
    src.end_of_stream()
    p.run()
    out = p.get_by_name("out").pull_all()
    cdp = parse_cdp(out[0].to_bytes())
    assert cdp.rate_code == 0x4
    assert len(cdp.cc_data) == 3 * 20
    f0, _ = extract_cea608(cdp.cc_data)
    assert f0 == [b"\x94\x2c"]
    p.set_state(State.NULL)


def test_element_s334_field2():
    h = Harness(make("cea608tocea708"))
    h.set_caps("closedcaption/x-cea-608, format=s334-1a")
    # field byte 0x80 = field 1(->0), 0x00 = field 2(->1)
    h.push(Buffer(b"\x80\x94\x2c\x00\x15\x2c"))
    out = h.pull().to_bytes()
    assert out == b"\xfc\x94\x2c\xfd\x15\x2c"
    h.teardown()


def test_svc_info_roundtrip_in_cdp():
    from gstpu.codecs.cea708 import (Cdp, build_cdp, pad_cc_data,
                                     parse_cdp)
    svcs = [{"service": 1, "language": "eng", "easy_reader": False,
             "wide_aspect_ratio": True},
            {"service": -2, "language": "spa"}]
    pkt = build_cdp(Cdp(cc_data=pad_cc_data(b"", 20), services=svcs))
    assert sum(pkt) % 256 == 0
    back = parse_cdp(pkt)
    assert back.services == svcs


def test_cdpserviceinject_element():
    from gstpu.codecs.cea708 import Cdp, build_cdp, pad_cc_data, \
        parse_cdp
    el = make("cdpserviceinject")
    el.set_property("services", [{"service": 3, "language": "fra"}])
    h = Harness(el)
    h.set_caps("closedcaption/x-cea-708, format=cdp")
    plain = build_cdp(Cdp(sequence=5,
                          cc_data=pad_cc_data(b"\xfc\x94\x2c", 20)))
    h.push(Buffer(plain, pts=9))
    out = h.pull()
    cdp = parse_cdp(out.to_bytes())
    assert cdp.services == [{"service": 3, "language": "fra",
                             "easy_reader": False,
                             "wide_aspect_ratio": False}]
    assert cdp.sequence == 5                  # original fields kept
    f0, _ = extract_cea608(cdp.cc_data)
    assert f0 == [b"\x94\x2c"]
    assert out.pts == 9
    h.teardown()


def test_cea708mux_merges_services():
    from gstpu import Caps, FlowReturn
    from gstpu.codecs.cea708 import (build_dtvcc, ccdata_split,
                                     dtvcc_to_ccdata, extract_cea608,
                                     parse_cdp, parse_dtvcc,
                                     cc_data_from_608)
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                                  SegmentEvent, StreamStartEvent)

    mx = make("cea708mux", framerate_code=0x3)   # 25fps: cc_count 24
    out = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    mx.static_pad("src").link(cap)
    feeders = []
    for _ in range(2):
        f = Pad("f", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC,
                            PadPresence.ALWAYS, Caps.any()))
        f.link(mx.request_pad())
        f.push_event(StreamStartEvent("s"))
        f.push_event(CapsEvent(parse_caps(
            "closedcaption/x-cea-708, format=cc_data")))
        f.push_event(SegmentEvent(Segment()))
        feeders.append(f)

    # pad 0: 608 pair + service 1; pad 1: service 2 + colliding svc 1
    cc0 = (cc_data_from_608([b"\x94\x2c"])
           + dtvcc_to_ccdata(build_dtvcc(0, [(1, b"one")])))
    cc1 = dtvcc_to_ccdata(build_dtvcc(0, [(2, b"two"),
                                          (1, b"conflict")]))
    feeders[0].push(Buffer(cc0, pts=0))
    feeders[1].push(Buffer(cc1, pts=0))
    assert len(out) == 1
    cdp = parse_cdp(out[0].to_bytes())
    assert len(cdp.cc_data) == 3 * 24
    f0, _ = extract_cea608(cdp.cc_data)
    assert f0 == [b"\x94\x2c"]
    _, pkts = ccdata_split(cdp.cc_data)
    assert len(pkts) == 1
    _seq, blocks = parse_dtvcc(pkts[0])
    assert blocks == [(1, b"one"), (2, b"two")]   # first pad won svc 1
    for f in feeders:
        f.push_event(EosEvent())


def test_tttocea708_roundtrips_via_overlay_extractor():
    from gstpu import State, parse_launch
    from gstpu.codecs.cea708 import ccdata_split, parse_dtvcc
    from gstpu.codecs.cea708 import service_block_text
    p = parse_launch('appsrc name=src caps="text/x-raw, format=utf8" '
                     '! tttocea708 service=3 ! appsink name=out')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"HELLO 708", pts=0))
    src.end_of_stream()
    p.run()
    cc = b"".join(b.to_bytes()
                  for b in p.get_by_name("out").pull_all())
    _pairs, pkts = ccdata_split(cc)
    texts = []
    for pkt in pkts:
        for svc, data in parse_dtvcc(pkt)[1]:
            assert svc == 3
            texts.append(service_block_text(data))
    assert "".join(texts) == "HELLO 708"
    p.set_state(State.NULL)


def test_tttocea708_knobs_and_608_compat():
    """Round-5 knobs: DefineWindow carries origin/rows, service-number
    overrides service, and cea608-channel muxes field-1 pairs ahead
    of the DTVCC triplets."""
    from gstpu.codecs.cea708 import parse_dtvcc
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu import Buffer

    el = make("tttocea708", service_number=3, cea608_channel=1,
              origin_row=10, origin_column=20, roll_up_rows=4)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    h.push(Buffer(b"hi", pts=0))
    out = h.pull_all()
    assert out
    cc = out[0].to_bytes()
    trips = [cc[i:i + 3] for i in range(0, len(cc), 3)]
    kinds = [t[0] & 0x03 for t in trips]
    assert 0 in kinds, "no 608 field-1 compatibility triplets"
    assert 3 in kinds, "no DTVCC start triplet"
    # rebuild the dtvcc packet from the 708 triplets
    dtv = b"".join(t[1:] for t in trips if t[0] & 0x03 in (2, 3))
    seq, blocks = parse_dtvcc(dtv)
    assert blocks and blocks[0][0] == 3          # service-number won
    win = blocks[0][1]
    assert win[0] == 0x98                        # DefineWindow0
    assert win[2] == 10 and win[3] == 20         # anchor row/col
    assert (win[4] & 0x0F) == 3                  # 4 rows -> count 3
    h.teardown()
