"""Core pipeline dataflow tests: parse, state machine, scheduler,
harness — the test patterns of SURVEY.md §4 (full-pipeline + harness)."""

import numpy as np
import pytest

import gstpu
from gstpu import (Buffer, Caps, FlowReturn, Pipeline, State, parse_launch)
from gstpu.core.audio import AudioInfo
from gstpu.core.harness import Harness
from gstpu.core.props import Mutability
from gstpu.core.registry import make


def test_make_and_properties():
    src = make("audiotestsrc", freq=880.0, num_buffers=5)
    assert src.freq == 880.0
    assert src.num_buffers == 5
    with pytest.raises(ValueError):
        src.set_property("volume", 2.0)  # above max
    with pytest.raises(KeyError):
        src.set_property("nope", 1)


def test_property_mutability_stages():
    sink = make("filesink")
    sink.set_property("location", "/tmp/x")  # fine at NULL
    sink.state = State.PLAYING
    with pytest.raises(PermissionError):
        sink.set_property("location", "/tmp/y")
    sink.state = State.NULL


def test_gst_style_property_names():
    src = make("audiotestsrc")
    src.set_property("num-buffers", 3)
    assert src.get_property("num-buffers") == 3


def test_parse_launch_and_run():
    p = parse_launch("audiotestsrc num-buffers=10 samplesperbuffer=480 "
                     "! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 10
    assert sink.is_eos
    info = AudioInfo.from_caps(sink.caps)
    assert info.rate == 48000
    assert info.channels == 2
    assert info.format == "F32LE"
    arr = info.view(bufs[0])
    assert arr.shape == (480, 2)
    # sine wave at default 440Hz/0.8 volume
    assert abs(float(arr[:, 0].max()) - 0.8) < 0.01
    # timestamps continuous
    assert bufs[0].pts == 0
    assert bufs[1].pts == bufs[0].duration
    p.set_state(State.NULL)


def test_parse_launch_capsfilter():
    p = parse_launch("audiotestsrc num-buffers=2 ! "
                     "audio/x-raw, rate=44100, channels=1, format=F64LE ! "
                     "appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    assert info.rate == 44100
    assert info.channels == 1
    assert info.format == "F64LE"
    p.set_state(State.NULL)


def test_queue_decouples():
    p = parse_launch("audiotestsrc num-buffers=7 ! queue ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    assert len(sink.pull_all()) == 7
    assert sink.is_eos
    p.set_state(State.NULL)


def test_tee_fanout():
    p = parse_launch("audiotestsrc num-buffers=4 ! tee name=t")
    t = p.get_by_name("t")
    from gstpu.core.registry import make as mk
    s1, s2 = mk("appsink", element_name="s1"), mk("appsink", element_name="s2")
    p.add(s1, s2)
    t.link(s1)
    t.link(s2)
    p.set_state(State.PLAYING)
    p.run()
    assert len(s1.pull_all()) == 4
    assert len(s2.pull_all()) == 4
    p.set_state(State.NULL)


def test_harness_identity():
    h = Harness("identity")
    h.set_caps("audio/x-raw, format=F32LE, rate=48000, channels=2, "
               "layout=interleaved")
    data = np.ones((100, 2), np.float32)
    h.push(Buffer(data, pts=0))
    out = h.pull()
    assert np.array_equal(out.array, data.reshape(-1, 2).ravel().reshape(100, 2))
    h.push_eos()
    assert h.eos
    h.teardown()


def test_harness_identity_drop():
    h = Harness("identity")
    h.element.set_property("drop-probability", 1.0)
    h.set_caps("audio/x-raw, format=F32LE, rate=48000, channels=2, "
               "layout=interleaved")
    h.push(Buffer(np.zeros((10, 2), np.float32)))
    assert h.try_pull() is None
    h.teardown()


def test_filesrc_filesink_roundtrip(tmp_path):
    data = bytes(range(256)) * 100
    src_file = tmp_path / "in.bin"
    dst_file = tmp_path / "out.bin"
    src_file.write_bytes(data)
    p = parse_launch(f"filesrc location={src_file} blocksize=1000 "
                     f"! filesink location={dst_file}")
    p.set_state(State.PLAYING)
    p.run()
    p.set_state(State.NULL)
    assert dst_file.read_bytes() == data


def test_videotestsrc():
    p = parse_launch("videotestsrc num-buffers=3 pattern=gradient ! "
                     "video/x-raw, format=RGBA, width=64, height=32 ! "
                     "appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 3
    from gstpu.core.video import VideoInfo
    vi = VideoInfo.from_caps(sink.caps)
    frame = vi.view(bufs[0])
    assert frame.shape == (32, 64, 4)
    assert frame[..., 3].min() == 255  # alpha opaque
    p.set_state(State.NULL)


def test_eos_message_on_bus():
    p = parse_launch("audiotestsrc num-buffers=1 ! fakesink")
    p.set_state(State.PLAYING)
    p.run()
    from gstpu.core.element import MessageType
    msgs = p.bus.drain()
    assert any(m.type is MessageType.EOS for m in msgs)
    p.set_state(State.NULL)


def test_appsrc_push():
    p = parse_launch("appsrc name=src ! appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    src.set_property("caps", Caps.new("application/x-custom"))
    p.set_state(State.PLAYING)
    for i in range(5):
        src.push_buffer(Buffer(bytes([i])))
    src.end_of_stream()
    p.run()
    assert len(sink.pull_all()) == 5
    p.set_state(State.NULL)


def test_latency_query():
    p = parse_launch("audiotestsrc num-buffers=1 ! identity ! fakesink")
    p.set_state(State.PLAYING)
    q = p.query_latency()
    assert q.live is False
    p.set_state(State.NULL)
