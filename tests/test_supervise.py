"""fallbackswitch / livesync / togglerecord / tracer tests."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, State, parse_launch
from gstpu.core.buffer import BufferFlags
from gstpu.core.caps import parse_caps
from gstpu.core.clock import TestClock
from gstpu.core.element import (MessageType, Pad, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.event import (CapsEvent, GapEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.harness import Harness
from gstpu.core.registry import make

SECOND = 1_000_000_000


def _feeder(name="feed"):
    return Pad(name, PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                           Caps.any()))


def _start_stream(pad, caps="application/x-test"):
    pad.push_event(StreamStartEvent(pad.name))
    pad.push_event(CapsEvent(parse_caps(caps)))
    pad.push_event(SegmentEvent(Segment()))


def _capture(el_srcpad):
    out = []
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                           Caps.any()))
    from gstpu import FlowReturn
    sink.chain_function = lambda pad, b: (out.append(b), FlowReturn.OK)[1]
    sink.event_function = lambda pad, ev: True
    el_srcpad.link(sink)
    return out


def test_fallbackswitch_failover_and_recovery():
    clock = TestClock()
    sw = make("fallbackswitch", timeout=SECOND)
    sw.clock = clock
    sw.base_time = 0
    out = _capture(sw.static_pad("src"))
    main = _feeder("main")
    backup = _feeder("backup")
    main.link(sw.request_pad())     # priority 0
    backup.link(sw.request_pad())   # priority 1
    _start_stream(main)
    _start_stream(backup)
    sw.set_state(State.PLAYING)

    main.push(Buffer(b"m0"))
    backup.push(Buffer(b"b0"))      # dropped: main healthy
    assert [b.to_bytes() for b in out] == [b"m0"]

    clock.advance(2 * SECOND)       # main goes silent past timeout
    backup.push(Buffer(b"b1"))      # backup takes over
    assert out[-1].to_bytes() == b"b1"

    main.push(Buffer(b"m1"))        # main recovers: takes priority back
    backup.push(Buffer(b"b2"))      # dropped again
    assert [b.to_bytes() for b in out] == [b"m0", b"b1", b"m1"]
    sw.set_state(State.NULL)


def test_fallbackswitch_posts_switch_message():
    from gstpu.core.element import Bus
    clock = TestClock()
    sw = make("fallbackswitch", timeout=SECOND)
    sw.clock = clock
    sw.bus = Bus()
    out = _capture(sw.static_pad("src"))
    main, backup = _feeder("m"), _feeder("b")
    main.link(sw.request_pad())
    backup.link(sw.request_pad())
    _start_stream(main)
    _start_stream(backup)
    main.push(Buffer(b"x"))
    clock.advance(3 * SECOND)
    backup.push(Buffer(b"y"))
    msgs = [m for m in sw.bus.drain() if m.type is MessageType.ELEMENT]
    pads = [m.fields["pad"] for m in msgs]
    assert pads == ["sink_0", "sink_1"]


def test_livesync_fills_gap_event():
    h = Harness(make("livesync", duration=40_000_000))
    h.set_caps("video/x-test")
    b = Buffer(b"f0", pts=0, duration=40_000_000)
    h.push(b)
    # announce a gap up to 200ms: livesync repeats the last frame
    h.push_event(GapEvent(40_000_000, 160_000_000))
    outs = h.pull_all()
    assert [o.pts for o in outs] == [0, 40_000_000, 80_000_000,
                                     120_000_000, 160_000_000]
    assert all(o.has_flag(BufferFlags.GAP) for o in outs[1:])
    assert h.element.duplicated == 4
    h.teardown()


def test_livesync_clock_driven_repeat():
    clock = TestClock()
    ls = make("livesync", duration=10_000_000)
    ls.clock = clock
    out = _capture(ls.static_pad("src"))
    feed = _feeder()
    feed.link(ls.static_pad("sink"))
    _start_stream(feed)
    feed.push(Buffer(b"x", pts=0, duration=10_000_000))
    tasks = list(ls.iterate_tasks())
    t = tasks[0]
    t.prepare()
    t.start()
    clock.advance(35_000_000)  # 3 frame intervals pass without input
    while t.run_once().value == "continue":
        pass
    assert len(out) >= 3
    assert out[1].pts == 10_000_000


def test_livesync_drops_late():
    h = Harness(make("livesync", duration=10))
    h.set_caps("x/y")
    h.push(Buffer(b"a", pts=100, duration=10))
    h.push(Buffer(b"b", pts=50, duration=10))  # behind: dropped
    assert len(h.pull_all()) == 1
    assert h.element.dropped == 1
    h.teardown()


def test_togglerecord_keyframe_aligned_contiguous():
    el = make("togglerecord")
    h = Harness(el)
    h.set_caps("video/x-test")
    MS = 1_000_000

    def frame(i, kf):
        b = Buffer(bytes([i]), pts=i * 10 * MS, duration=10 * MS)
        if not kf:
            b.set_flag(BufferFlags.DELTA_UNIT)
        return b

    # not recording: 0..3 dropped
    for i in range(4):
        h.push(frame(i, kf=(i % 3 == 0)))
    assert not h.buffers
    el.set_property("record", True)
    h.push(frame(4, kf=False))   # waiting for keyframe: dropped
    h.push(frame(5, kf=False))
    assert not h.buffers
    for i in range(6, 10):
        h.push(frame(i, kf=(i == 6)))
    outs = h.pull_all()
    assert [b.to_bytes()[0] for b in outs] == [6, 7, 8, 9]
    # timestamps rebased to 0
    assert [b.pts for b in outs] == [0, 10 * MS, 20 * MS, 30 * MS]
    # stop, skip some, record again: output continues contiguously
    el.set_property("record", False)
    h.push(frame(10, kf=True))
    el.set_property("record", True)
    h.push(frame(20, kf=True))
    out2 = h.pull()
    assert out2.pts == 40 * MS
    h.teardown()


def test_tracers_pad_push_timings(tmp_path):
    from gstpu.utils.tracing import PadPushTimings, flush_all
    f = tmp_path / "timings.csv"
    t = PadPushTimings(file=str(f))
    t.install()
    try:
        p = parse_launch("audiotestsrc num-buffers=3 ! fakesink")
        p.set_state(State.PLAYING)
        p.run()
        p.set_state(State.NULL)
        flush_all()
        lines = f.read_text().strip().splitlines()
        assert lines[0] == "time,pad,duration_ns"
        assert len(lines) >= 4
        assert "audiotestsrc" in lines[1]
    finally:
        t.uninstall()


def test_tracer_env_activation(tmp_path, monkeypatch):
    f = tmp_path / "q.csv"
    monkeypatch.setenv("GSTPU_TRACERS",
                       f"queue-levels(file={f});memory-tracer")
    from gstpu.utils.tracing import init_from_env
    tracers = init_from_env()
    try:
        assert len(tracers) == 2
        p = parse_launch("audiotestsrc num-buffers=3 ! queue ! fakesink")
        p.set_state(State.PLAYING)
        p.run()
        p.set_state(State.NULL)
        from gstpu.utils.tracing import flush_all
        flush_all()
        assert f.read_text().count("\n") >= 2
    finally:
        for t in tracers:
            t.uninstall()


def test_pipeline_snapshot_dot():
    from gstpu.utils.tracing import pipeline_snapshot
    p = parse_launch("audiotestsrc num-buffers=1 ! identity ! fakesink")
    dot = pipeline_snapshot(p)
    assert dot.startswith("digraph")
    assert "audiotestsrc" in dot and "->" in dot
    p.set_state(State.NULL)


def test_debugsei_inserter_roundtrip():
    from gstpu.elements.utils_.debugsei import parse_sei_unregistered
    h = Harness(make("debugseimetainserter", payload=b"frame-info-42"))
    h.set_caps("video/x-h264, stream-format=byte-stream")
    # payload containing a 00 00 01 pattern: emulation prevention needed
    h.push(Buffer(b"\x00\x00\x00\x01\x65rest-of-frame"))
    out = h.pull().to_bytes()
    assert out.endswith(b"rest-of-frame")
    found = parse_sei_unregistered(out)
    assert found == [b"frame-info-42"]
    h.teardown()


def test_debugsei_emulation_prevention():
    from gstpu.elements.utils_.debugsei import (build_sei_unregistered,
                                                parse_sei_unregistered)
    tricky = b"\x00\x00\x00\x00\x01\x02"
    sei = build_sei_unregistered(tricky)
    # no illegal start codes inside the NAL body (after the leading one)
    assert b"\x00\x00\x01" not in sei[4:]
    assert parse_sei_unregistered(sei) == [tricky]


def test_chrome_tracer(tmp_path):
    import json
    from gstpu.utils.tracing import ChromeTracer, flush_all
    f = tmp_path / "trace.json"
    t = ChromeTracer(file=str(f))
    t.install()
    try:
        p = parse_launch("audiotestsrc num-buffers=3 ! identity ! "
                         "fakesink")
        p.set_state(State.PLAYING)
        p.run()
        p.set_state(State.NULL)
        flush_all()
        doc = json.loads(f.read_text())
        evs = doc["traceEvents"]
        assert evs and all(e["ph"] == "X" and e["dur"] >= 0
                           for e in evs)
        assert any(e["name"].startswith("audiotestsrc") for e in evs)
    finally:
        t.uninstall()


# -- round-5 reference-property parity ---------------------------------------

def test_livesync_counters_and_late_threshold():
    ls = make("livesync", duration=SECOND // 10,
              late_threshold=2 * SECOND // 10)
    out = _capture(ls.static_pad("src"))
    feed = _feeder()
    feed.link(ls.static_pad("sink"))
    _start_stream(feed)
    ls.set_state(State.PLAYING)

    feed.push(Buffer(b"a", pts=0, duration=SECOND // 10))
    # two late buffers accumulate lateness up to the threshold...
    feed.push(Buffer(b"late1", pts=0, duration=SECOND // 10))
    feed.push(Buffer(b"late2", pts=0, duration=SECOND // 10))
    # ...so the THIRD late buffer is accepted and re-anchors
    feed.push(Buffer(b"late3", pts=0, duration=SECOND // 10))
    got = [b.to_bytes() for b in out]
    assert got == [b"a", b"late3"]
    assert ls.get_property("in") == 4
    assert ls.get_property("drop") == 2
    assert ls.get_property("out") == 2
    # a gap fill bumps duplicate + out
    feed.push_event(GapEvent(pts=SECOND // 10,
                             duration=3 * SECOND // 10))
    assert ls.get_property("duplicate") >= 1
    assert ls.get_property("out") > 2


def test_livesync_late_threshold_never():
    ls = make("livesync", duration=SECOND // 10, late_threshold=-1)
    out = _capture(ls.static_pad("src"))
    feed = _feeder()
    feed.link(ls.static_pad("sink"))
    _start_stream(feed)
    ls.set_state(State.PLAYING)
    feed.push(Buffer(b"a", pts=0, duration=SECOND // 10))
    for _ in range(50):
        feed.push(Buffer(b"late", pts=0, duration=SECOND // 10))
    assert [b.to_bytes() for b in out] == [b"a"]
    assert ls.get_property("drop") == 50


def test_livesync_single_segment_eats_followups():
    ls = make("livesync", single_segment=True)
    events = []
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    from gstpu import FlowReturn
    sink.chain_function = lambda pad, b: FlowReturn.OK
    sink.event_function = lambda pad, ev: (events.append(ev), True)[1]
    ls.static_pad("src").link(sink)
    feed = _feeder()
    feed.link(ls.static_pad("sink"))
    ls.set_state(State.PLAYING)
    feed.push_event(StreamStartEvent("s"))
    feed.push_event(SegmentEvent(Segment()))
    feed.push_event(SegmentEvent(Segment()))
    feed.push_event(SegmentEvent(Segment()))
    segs = [e for e in events if isinstance(e, SegmentEvent)]
    assert len(segs) == 1


def test_togglerecord_recording_readonly_property():
    tr = make("togglerecord")
    out = _capture(tr.static_pad("src"))
    feed = _feeder()
    feed.link(tr.static_pad("sink"))
    _start_stream(feed)
    tr.set_state(State.PLAYING)
    assert tr.get_property("recording") is False
    with pytest.raises(PermissionError):
        tr.set_property("recording", True)
    notified = []
    tr.connect_notify("recording", lambda el, v: notified.append(v))
    tr.record = True
    feed.push(Buffer(b"k", pts=0, duration=SECOND // 30))  # keyframe
    assert tr.get_property("recording") is True
    assert notified == [True]
    tr.record = False
    feed.push(Buffer(b"x", pts=SECOND // 30,
                     duration=SECOND // 30))
    assert tr.get_property("recording") is False
    assert out and out[0].to_bytes() == b"k"


def test_fallbacksrc_dummy_respects_enable_flags():
    src = make("fallbacksrc", source="audiotestsrc wave=silence",
               enable_dummy=True, enable_video=False)
    fb = src._make_fallback()
    assert fb is not None
    assert "audiotestsrc" in type(fb).__name__.lower() \
        or fb.list_properties().get("wave") is not None
    src2 = make("fallbacksrc", source="audiotestsrc",
                enable_dummy=True)
    fb2 = src2._make_fallback()
    assert fb2 is not None and fb2 is not fb
    assert fb2.list_properties().get("pattern") is not None  # videotestsrc
