"""fallbacksrc supervision tests (TestClock-driven failover/retry)."""

import pytest

from gstpu import Buffer, Caps, State
from gstpu.core.clock import TestClock
from gstpu.core.element import (MessageType, Pad, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.registry import make
from gstpu.runtime.scheduler import TaskResult

SECOND = 10**9


def _capture(el):
    out = []
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                           Caps.any()))
    from gstpu import FlowReturn
    sink.chain_function = lambda pad, b: (out.append(b), FlowReturn.OK)[1]
    sink.event_function = lambda pad, ev: True
    el.static_pad("src").link(sink)
    return out


def test_fallbacksrc_failover_and_retry():
    clock = TestClock()
    fs = make("fallbacksrc",
              source="audiotestsrc num-buffers=3 samplesperbuffer=100",
              fallback_source="audiotestsrc wave=silence "
                              "samplesperbuffer=100",
              timeout=SECOND, restart_timeout=2 * SECOND)
    fs.clock = clock
    out = _capture(fs)
    from gstpu.core.element import Bus
    fs.bus = Bus()
    assert fs.set_state(State.PLAYING).value != "failure"
    task = list(fs.iterate_tasks())[0]
    task.prepare()
    task.start()

    # primary produces its 3 buffers then EOS -> immediate failover
    for _ in range(10):
        task.run_once()
    assert fs.stats["using-fallback"] is True
    assert fs.stats["num-fallback-switches"] == 1
    n_after_switch = len(out)
    # fallback keeps producing
    task.run_once()
    assert len(out) > n_after_switch

    # after restart-timeout, the primary is retried
    clock.advance(3 * SECOND)
    for _ in range(3):
        task.run_once()
    assert fs.stats["num-retry"] == 1
    assert fs.stats["using-fallback"] is False
    msgs = [m for m in fs.bus.drain() if m.type is MessageType.ELEMENT]
    assert any(m.fields.get("using_fallback") for m in msgs)
    fs.set_state(State.NULL)


def test_fallbacksrc_requires_source():
    fs = make("fallbacksrc")
    from gstpu.core.element import StateChangeReturn
    assert fs.set_state(State.READY) is StateChangeReturn.FAILURE


def test_fallbacksrc_uri_and_dummy(tmp_path):
    """uri= + enable-dummy: primary from a file URI; when it EOSes
    with restart-on-eos the stream loops (reference uri /
    restart-on-eos / enable-dummy properties)."""
    import numpy as np
    from gstpu import Buffer, State, parse_launch
    f = tmp_path / "clip.bin"
    f.write_bytes(bytes(range(64)))
    p = parse_launch("fallbacksrc name=fb ! appsink name=sink")
    fb = p.get_by_name("fb")
    fb.uri = f"file://{f}"
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run(timeout=20)
    assert sink.samples
    assert b"".join(b.to_bytes()
                    for b in sink.pull_all()) == bytes(range(64))
    p.set_state(State.NULL)


def test_fallbacksrc_immediate_fallback():
    import time
    from gstpu import State, parse_launch
    # primary never produces (udpsrc nobody sends to); fallback
    # produces immediately
    p = parse_launch("fallbacksrc name=fb ! appsink name=sink")
    fb = p.get_by_name("fb")
    fb.source = "udpsrc port=0"
    fb.fallback_source = "audiotestsrc samplesperbuffer=64"
    fb.immediate_fallback = True
    fb.restart_timeout = 10**12   # don't retry during the test
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    deadline = time.monotonic() + 5
    while not sink.samples and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.001)
    assert sink.samples            # fallback produced from the start
    assert fb.statistics["using-fallback"]
    p.set_state(State.NULL)


def test_fallbacksrc_manual_unblock():
    import time
    from gstpu import State, parse_launch
    p = parse_launch("fallbacksrc name=fb ! appsink name=sink")
    fb = p.get_by_name("fb")
    fb.source = "audiotestsrc samplesperbuffer=64"
    fb.manual_unblock = True
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    for _ in range(50):
        p.iterate()
    assert not sink.samples        # held
    fb.emit("unblock")
    deadline = time.monotonic() + 5
    while not sink.samples and time.monotonic() < deadline:
        p.iterate()
        time.sleep(0.001)
    assert sink.samples
    p.set_state(State.NULL)


def test_fallbacksrc_child_error_caught_and_reasons(tmp_path):
    """A child-source error must NOT fail the pipeline: the
    supervisor catches it on the private child bus, fails over with
    last-retry-reason=error (reference RetryReason, mod.rs:18-24)."""
    from gstpu.core.element import Bus, State
    from gstpu.core.registry import make

    fs = make("fallbacksrc",
              source="audiotestsrc samplesperbuffer=64",
              fallback_source="audiotestsrc freq=200 samplesperbuffer=64",
              timeout=10_000_000_000)
    fs.bus = Bus()
    from gstpu.core.clock import SystemClock
    fs.clock = SystemClock()
    fs.base_time = fs.clock.time()
    sink = make("fakesink")
    fs.static_pad("src").link(sink.static_pad("sink"))
    sink.set_state(State.PLAYING)
    assert fs.start()
    tasks = list(fs.iterate_tasks())
    for t in tasks:
        t.prepare(); t.start()
    for _ in range(5):
        tasks[0].run_once()
    # inject a child error (as if the source posted ERROR)
    from gstpu.core.element import Message, MessageType
    fs._child_bus.post(Message(MessageType.ERROR, src=fs._primary,
                               text="boom"))
    for _ in range(5):
        tasks[0].run_once()
    assert fs.stats["using-fallback"] is True
    assert fs.stats["last-retry-reason"] == "error"
    assert fs.status in ("retrying", "running")
    # app bus saw status messages but NO error
    msgs = fs.bus.drain()
    assert not [m for m in msgs if m.type is MessageType.ERROR]
    fs.stop()


def test_fallbacksrc_buffering_percent_tracked():
    from gstpu.core.element import Bus, Message, MessageType, State
    from gstpu.core.registry import make

    fs = make("fallbacksrc", source="audiotestsrc samplesperbuffer=64")
    fs.bus = Bus()
    from gstpu.core.clock import SystemClock
    fs.clock = SystemClock()
    fs.base_time = fs.clock.time()
    sink = make("fakesink")
    fs.static_pad("src").link(sink.static_pad("sink"))
    sink.set_state(State.PLAYING)
    assert fs.start()
    tasks = list(fs.iterate_tasks())
    for t in tasks:
        t.prepare(); t.start()
    fs._child_bus.post(Message(MessageType.BUFFERING, src=fs._primary,
                               percent=37))
    tasks[0].run_once()
    assert fs.stats["buffering-percent"] == 37
    assert fs.status == "buffering"
    fs._child_bus.post(Message(MessageType.BUFFERING, src=fs._primary,
                               percent=100))
    tasks[0].run_once()
    assert fs.stats["buffering-percent"] == 100
    fs.stop()


def test_fallbacksrc_image_fallback(tmp_path):
    """An image fallback-uri becomes a still-image loop source
    (reference imagefreeze path, imp.rs:2084-2095)."""
    import numpy as np
    from PIL import Image

    from gstpu.core.element import Bus, State
    from gstpu.core.registry import make

    img = tmp_path / "slate.png"
    Image.fromarray(
        np.full((8, 12, 4), [10, 200, 30, 255], np.uint8),
        "RGBA").save(img)
    fs = make("fallbacksrc",
              source="audiotestsrc samplesperbuffer=64",
              fallback_uri=f"file://{img}",
              immediate_fallback=True)
    fs.bus = Bus()
    from gstpu.core.clock import SystemClock
    fs.clock = SystemClock()
    fs.base_time = fs.clock.time()

    got = []
    from gstpu.core.caps import Caps
    from gstpu.core.element import (FlowReturn, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    cap = Pad("sink", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
    fs.static_pad("src").link(cap)
    assert fs.start()
    tasks = list(fs.iterate_tasks())
    for t in tasks:
        t.prepare(); t.start()
    for _ in range(6):
        tasks[0].run_once()
    assert len(got) >= 3
    frame = got[0].array.reshape(8, 12, 4)
    assert (frame[0, 0] == [10, 200, 30, 255]).all()
    # frames advance in time (a loop, not a one-shot)
    assert got[1].pts > got[0].pts
    fs.stop()
