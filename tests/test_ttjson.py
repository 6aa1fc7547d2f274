"""cea608tojson / jsontovtt tests."""

import json

import pytest

from gstpu import Buffer
from gstpu.codecs.cea608 import Cea608Encoder
from gstpu.core.harness import Harness
from gstpu.core.registry import make

SECOND = 10**9


def test_cea608tojson_popon():
    enc = Cea608Encoder()
    pairs = enc.encode_popon("HELLO")
    h = Harness(make("cea608tojson"))
    h.set_caps("closedcaption/x-cea-608, format=raw")
    for i, p in enumerate(pairs):
        h.push(Buffer(p, pts=i * 33_000_000))
    outs = h.pull_all()
    assert len(outs) == 1
    doc = json.loads(outs[0].to_bytes())
    assert doc["mode"] == "PopOn"
    chunks = doc["lines"][0]["chunks"]
    assert chunks[0]["text"] == "HELLO"
    assert chunks[0]["style"] == "White"
    h.teardown()


def test_jsontovtt_cues():
    from gstpu.elements.video.ttjson import lines_to_json
    h = Harness(make("jsontovtt", default_duration=SECOND))
    h.set_caps("application/x-json, format=cea608")
    h.push(Buffer(lines_to_json("FIRST"), pts=SECOND))
    h.push(Buffer(lines_to_json("SECOND\nLINE2"), pts=3 * SECOND))
    h.push_eos()
    text = b"".join(b.to_bytes() for b in h.pull_all()).decode()
    assert text.startswith("WEBVTT\n\n")
    assert "00:00:01.000 --> 00:00:03.000\nFIRST\n" in text
    assert "00:00:03.000 --> 00:00:04.000\nSECOND\nLINE2\n" in text
    h.teardown()


def test_full_608_to_vtt_pipeline():
    from gstpu import State, parse_launch
    from gstpu.codecs.cea608 import Cea608Encoder
    p = parse_launch('appsrc name=src caps="closedcaption/x-cea-608, '
                     'format=raw" ! cea608tojson ! jsontovtt ! '
                     'appsink name=out')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    for i, pair in enumerate(Cea608Encoder().encode_popon("VTT TEST")):
        src.push_buffer(Buffer(pair, pts=i * 33_000_000))
    src.end_of_stream()
    p.run()
    text = b"".join(b.to_bytes()
                    for b in p.get_by_name("out").pull_all()).decode()
    assert "WEBVTT" in text and "VTT TEST" in text and "-->" in text
    p.set_state(State.NULL)
