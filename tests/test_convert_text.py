"""audioconvert/audioresample/audiomixer + text element tests."""

import json

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.audio import AudioInfo
from gstpu.core.harness import Harness
from gstpu.core.registry import make


def test_audioconvert_format_and_channels():
    p = parse_launch(
        "audiotestsrc num-buffers=5 ! audio/x-raw, format=F32LE, "
        "rate=48000, channels=2 ! audioconvert ! "
        "audio/x-raw, format=S16LE, rate=48000, channels=1 ! "
        "appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    assert info.format == "S16LE" and info.channels == 1
    bufs = sink.pull_all()
    x = np.concatenate([info.view(b) for b in bufs])
    peak = np.abs(x.astype(np.int32)).max()
    assert 24000 < peak < 28000  # 0.8 amplitude sine in S16
    p.set_state(State.NULL)


def test_audioresample_preserves_frequency():
    p = parse_launch(
        "audiotestsrc num-buffers=50 freq=1000 samplesperbuffer=480 "
        "! audio/x-raw, format=F64LE, rate=48000, channels=1 "
        "! audioresample ! audio/x-raw, rate=16000, format=F64LE ! "
        "appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    assert info.rate == 16000
    x = np.concatenate([info.view(b) for b in sink.pull_all()])[:, 0]
    # ~1/3 of the input samples
    assert abs(x.size - 50 * 480 / 3) < 50
    # dominant frequency still 1 kHz
    spec = np.abs(np.fft.rfft(x[200:] * np.hanning(x.size - 200)))
    freq = np.fft.rfftfreq(x.size - 200, 1 / 16000)
    assert abs(freq[np.argmax(spec)] - 1000) < 20
    p.set_state(State.NULL)


def test_audiomixer_adds_signals():
    p = parse_launch(
        "audiotestsrc wave=sine volume=0.2 num-buffers=10 "
        "samplesperbuffer=480 ! audio/x-raw, format=F64LE, rate=48000, "
        "channels=1 ! audiomixer name=mix ! appsink name=sink  ")
    mix = p.get_by_name("mix")
    src2 = make("audiotestsrc", wave="sine", volume=0.3, num_buffers=10,
                samplesperbuffer=480)
    from gstpu.core.registry import make as mk
    cf = mk("capsfilter")
    from gstpu.core.caps import parse_caps
    cf.set_property("caps", parse_caps(
        "audio/x-raw, format=F64LE, rate=48000, channels=1"))
    p.add(src2, cf)
    src2.link(cf)
    cf.link(mix)
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    x = np.concatenate([info.view(b) for b in sink.pull_all()])
    assert abs(float(np.abs(x).max()) - 0.5) < 0.01  # 0.2 + 0.3
    p.set_state(State.NULL)


def _push_text(h, texts):
    for i, t in enumerate(texts):
        h.push(Buffer(t.encode(), pts=i * 10**9, duration=10**9))


def test_regex_element():
    el = make("regex")
    el.set_property("commands", [{"operation": "replace-all",
                                  "pattern": r"\bcat\b",
                                  "replacement": "dog"}])
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    _push_text(h, ["the cat sat on the catalog"])
    assert h.pull().to_bytes() == b"the dog sat on the catalog"
    h.teardown()


def test_textwrap_element():
    h = Harness(make("textwrap", columns=10))
    h.set_caps("text/x-raw, format=utf8")
    _push_text(h, ["hello wonderful world of text"])
    out = h.pull().to_bytes().decode()
    assert all(len(line) <= 10 for line in out.splitlines())
    h.teardown()


def test_json_roundtrip():
    p = parse_launch("appsrc name=src ! jsongstenc ! jsongstparse ! "
                     "appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    from gstpu.core.caps import parse_caps
    src.set_property("caps", parse_caps("text/x-raw, format=utf8"))
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"line one\nline two", pts=5, duration=7))
    src.end_of_stream()
    p.run()
    out = sink.pull_all()
    assert out[0].to_bytes() == b"line one\nline two"
    assert out[0].pts == 5 and out[0].duration == 7
    p.set_state(State.NULL)


def test_textaccumulate():
    from gstpu.elements.text.textelements import \
        TextAccumulateSentenceMeta
    h = Harness("textaccumulate")
    h.set_caps("text/x-raw, format=utf8")
    _push_text(h, ["hello", "world.", "again"])
    outs = h.pull_all()
    assert outs[0].to_bytes() == b"hello"
    assert outs[1].to_bytes() == b"hello world."
    assert outs[1].get_meta(TextAccumulateSentenceMeta).complete
    assert outs[2].to_bytes() == b"again"  # restarted after sentence
    h.teardown()


def test_textahead():
    h = Harness(make("textahead", n_ahead=1))
    h.set_caps("text/x-raw, format=utf8")
    _push_text(h, ["a", "b", "c"])
    h.push_eos()
    outs = [b.to_bytes().decode() for b in h.pull_all()]
    assert outs == ["a\nb", "b\nc", "c"]
    h.teardown()
