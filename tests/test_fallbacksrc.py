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
    assert fs.stats["using_fallback"] is True
    assert fs.stats["num_fallback_switches"] == 1
    n_after_switch = len(out)
    # fallback keeps producing
    task.run_once()
    assert len(out) > n_after_switch

    # after restart-timeout, the primary is retried
    clock.advance(3 * SECOND)
    for _ in range(3):
        task.run_once()
    assert fs.stats["num_retry"] == 1
    assert fs.stats["using_fallback"] is False
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
    assert fb.statistics["using_fallback"]
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
