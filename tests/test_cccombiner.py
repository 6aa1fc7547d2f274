"""cccombiner / ccextractor / transcriberbin-style wiring tests."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, FlowReturn
from gstpu.core.caps import parse_caps
from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                              SegmentEvent, StreamStartEvent)
from gstpu.core.registry import make
from gstpu.core.video import VideoCaptionMeta, VideoInfo

SECOND = 10**9


def _feeder(caps):
    f = Pad("f", PadDirection.SRC,
            PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                        Caps.any()))
    return f


def _start(f, caps):
    f.push_event(StreamStartEvent("s"))
    f.push_event(CapsEvent(parse_caps(caps)))
    f.push_event(SegmentEvent(Segment()))


def _capture(srcpad):
    out = []
    s = Pad("c", PadDirection.SINK,
            PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                        Caps.any()))
    s.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    s.event_function = lambda p, e: True
    srcpad.link(s)
    return out


def test_cccombiner_attaches_metas_by_interval():
    cb = make("cccombiner")
    out = _capture(cb.static_pad("src"))
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    vf = _feeder(vcaps)
    vf.link(cb.request_pad("sink"))
    _start(vf, vcaps)
    cf = _feeder("closedcaption/x-cea-608, format=raw")
    cf.link(cb.request_pad())
    _start(cf, "closedcaption/x-cea-608, format=raw")

    vi = VideoInfo("RGBA", 4, 4)
    # captions for frame 0 and frame 2
    cf.push(Buffer(b"\x94\x2c", pts=5_000_000))
    cf.push(Buffer(b"\x94\x2f", pts=70_000_000))
    for i in range(3):
        vf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8),
                               pts=i * SECOND // 30))
    cf.push_event(EosEvent())
    vf.push_event(EosEvent())
    assert len(out) == 3
    metas = [[m for m in b.metas if isinstance(m, VideoCaptionMeta)]
             for b in out]
    assert [len(m) for m in metas] == [1, 0, 1]
    assert metas[0][0].data == b"\x94\x2c"
    assert metas[0][0].caption_type == "cea608-raw"
    assert metas[2][0].data == b"\x94\x2f"


def test_ccextractor_splits_back():
    from gstpu.core.harness import Harness
    ex = make("ccextractor")
    h = Harness(ex)
    h.set_caps("video/x-raw, format=RGBA, width=4, height=4, "
               "framerate=30/1")
    cc_out = []
    vi = VideoInfo("RGBA", 4, 4)
    b = vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=7)
    b.add_meta(VideoCaptionMeta("cea608-raw", b"\x94\x2c"))
    h.push(b)                      # creates the caption pad
    cap = ex.static_pad("caption")
    assert cap is not None
    cc_out = _capture(cap)
    b2 = vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=40)
    b2.add_meta(VideoCaptionMeta("cea608-raw", b"\x94\x2f"))
    h.push(b2)
    assert [c.to_bytes() for c in cc_out] == [b"\x94\x2f"]
    vids = h.pull_all()
    assert all(not any(isinstance(m, VideoCaptionMeta)
                       for m in v.metas) for v in vids)
    h.teardown()


def test_combine_then_overlay_chain():
    """captions combined onto frames render via cea608overlay."""
    from gstpu.codecs.cea608 import Cea608Encoder
    cb = make("cccombiner")
    ov = make("cea608overlay")
    # cccombiner -> overlay -> capture
    cb.static_pad("src").link(ov.static_pad("sink"))
    out = _capture(ov.static_pad("src"))
    vcaps = ("video/x-raw, format=RGBA, width=160, height=120, "
             "framerate=30/1")
    vf = _feeder(vcaps)
    vf.link(cb.request_pad("sink"))
    _start(vf, vcaps)
    cf = _feeder("closedcaption/x-cea-608, format=raw")
    cf.link(cb.request_pad())
    _start(cf, "closedcaption/x-cea-608, format=raw")
    vi = VideoInfo("RGBA", 160, 120)
    for i, pair in enumerate(Cea608Encoder().encode_popon("OK")):
        cf.push(Buffer(pair, pts=i))
    cf.push_event(EosEvent())
    vf.push(vi.make_buffer(np.zeros((120, 160, 4), np.uint8), pts=0))
    vf.push_event(EosEvent())
    assert len(out) == 1
    assert vi.view(out[0]).any()       # burned-in caption
