"""analytics elements: combiner/splitter roundtrip, YOLOX decode+NMS."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, EosEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.elements.analytics.analytics import (AnalyticsBatchMeta,
                                                AnalyticsRelationMeta)
from gstpu.ops.detection import nms, yolox_decode, yolox_grids


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 5, 5]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_yolox_decode_finds_planted_box():
    W = H = 640
    grids, ss = yolox_grids(W, H)
    A = grids.shape[0]
    pred = np.full((A, 85), -10.0, np.float32)  # all scores ~0
    # plant one confident detection at stride-8 grid cell (10, 12)
    idx = int(np.nonzero((grids[:, 0] == 10) & (grids[:, 1] == 12)
                         & (ss == 8))[0][0])
    pred[idx, :2] = 0.5           # center offset
    pred[idx, 2:4] = np.log(4.0)  # 32x32 px box
    pred[idx, 4] = 10.0           # objectness
    pred[idx, 5 + 17] = 10.0      # class 17
    dets = yolox_decode(pred, W, H, score_threshold=0.5)
    assert len(dets) == 1
    d = dets[0]
    assert d.class_id == 17
    assert d.score > 0.99
    assert abs((d.x + d.w / 2) - 10.5 * 8) < 1e-3
    assert abs(d.w - 32.0) < 1e-3


def test_yoloxtensordec_element():
    W = H = 320
    grids, _ = yolox_grids(W, H)
    pred = np.full((grids.shape[0], 85), -10.0, np.float32)
    pred[0, 4] = 8.0
    pred[0, 5] = 8.0
    el = make("yoloxtensordec", image_width=W, image_height=H)
    h = Harness(el)
    h.set_caps("application/x-tensor, type=yolox")
    h.push(Buffer(pred.tobytes(), pts=0))
    out = h.pull()
    meta = out.get_meta(AnalyticsRelationMeta)
    assert meta is not None and len(meta.detections) == 1
    assert meta.detections[0].class_id == 0
    h.teardown()


def _feeder(name):
    return Pad(name, PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                           Caps.any()))


def test_combiner_splitter_roundtrip():
    comb = make("analyticscombiner")
    split = make("analyticssplitter")
    comb.static_pad("src").link(split.static_pad("sink"))
    from gstpu.core.element import State as _S
    comb.set_state(_S.PLAYING)
    split.set_state(_S.PLAYING)

    outs = {}

    def on_pad(el, pad):
        sink = Pad(f"cap-{pad.name}", PadDirection.SINK,
                   PadTemplate("sink", PadDirection.SINK,
                               PadPresence.ALWAYS, Caps.any()))
        from gstpu import FlowReturn
        lst = outs.setdefault(pad.name, [])
        sink.chain_function = \
            lambda p, b, lst=lst: (lst.append(b), FlowReturn.OK)[1]
        sink.event_function = lambda p, ev: True
        pad.link(sink)

    split.connect("pad-added", on_pad)

    feeders = []
    for i in range(3):
        f = _feeder(f"f{i}")
        f.link(comb.request_pad())
        f.push_event(StreamStartEvent(f"s{i}"))
        f.push_event(CapsEvent(parse_caps(f"video/x-raw, format=RGB, "
                                          f"width={16 * (i + 1)}, "
                                          f"height=16, framerate=30/1")))
        f.push_event(SegmentEvent(Segment()))
        feeders.append(f)

    for n in range(4):
        for i, f in enumerate(feeders):
            f.push(Buffer(bytes([i, n]), pts=n * 10**8))
    for f in feeders:
        f.push_event(EosEvent())

    assert set(outs) == {"src_sink_0", "src_sink_1", "src_sink_2"}
    for i in range(3):
        bufs = outs[f"src_sink_{i}"]
        assert len(bufs) == 4
        assert [b.to_bytes()[1] for b in bufs] == [0, 1, 2, 3]
        assert b"" != bufs[0].to_bytes()
        assert bufs[0].to_bytes()[0] == i
