"""ebur128level element: passthrough metering + bus messages
(reference audio/audiofx/src/ebur128level/imp.rs)."""

import numpy as np

from gstpu import State, parse_launch
from gstpu.core.element import MessageType


def test_level_messages_posted():
    # 3 s of 997 Hz sine at 0.5 -> messages at 1 s intervals
    p = parse_launch(
        "audiotestsrc freq=997 volume=0.5 num-buffers=300 "
        "samplesperbuffer=480 "
        "! audio/x-raw, format=F64LE, rate=48000, channels=2 "
        "! ebur128level interval=1000000000 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    msgs = [m for m in p.bus.drain()
            if m.type is MessageType.ELEMENT and m.name == "ebur128-level"]
    assert len(msgs) == 3
    last = msgs[-1].fields
    # amplitude 0.5 stereo sine at 997 Hz:
    # -0.691 + 10log10(2 * 1.172 * 0.5^2/2) = -6.02 LUFS
    assert abs(last["momentary-loudness"] - (-6.02)) < 0.3
    assert abs(last["shortterm-loudness"] - (-6.02)) < 0.3
    assert abs(last["global-loudness"] - (-6.02)) < 0.3
    assert last["loudness-range"] < 1.0
    for pk in last["sample-peak"]:
        assert abs(pk - 0.5) < 1e-3
    for pk in last["true-peak"]:
        assert 0.49 < pk < 0.52
    # timestamps mark the END of each interval
    assert msgs[0].fields["timestamp"] == 1_000_000_000
    # passthrough: data unmodified
    bufs = sink.pull_all()
    assert len(bufs) == 300
    p.set_state(State.NULL)


def test_mode_subset():
    p = parse_launch(
        "audiotestsrc num-buffers=120 samplesperbuffer=480 "
        "! audio/x-raw, format=F32LE, rate=48000, channels=1 "
        "! ebur128level mode=momentary,sample-peak ! fakesink")
    p.set_state(State.PLAYING)
    p.run()
    msgs = [m for m in p.bus.drain()
            if m.type is MessageType.ELEMENT and m.name == "ebur128-level"]
    assert msgs
    f = msgs[0].fields
    assert "momentary-loudness" in f
    assert "global-loudness" not in f
    assert "sample-peak" in f
    p.set_state(State.NULL)
