"""CEA-608 codec + caption element tests."""

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.codecs.cea608 import (Cea608Decoder, Cea608Encoder, odd_parity,
                                 strip_parity)
from gstpu.core.element import MessageType
from gstpu.core.harness import Harness
from gstpu.core.registry import make


def test_parity():
    assert odd_parity(0x20) == 0x20  # already odd: bit7 clear
    assert odd_parity(0x41) == 0xC1  # two ones: bit7 set
    for v in range(128):
        p = odd_parity(v)
        assert bin(p).count("1") % 2 == 1
        assert strip_parity(p) == v
    # corrupt byte rejected
    assert strip_parity(odd_parity(0x41) ^ 0x01) is None


def test_encode_decode_roundtrip():
    enc = Cea608Encoder()
    dec = Cea608Decoder()
    out = None
    for pair in enc.encode_popon("HELLO WORLD"):
        r = dec.push_pair(pair)
        if r is not None:
            out = r
    assert out == "HELLO WORLD"


def test_multiline_and_special_chars():
    enc = Cea608Encoder()
    dec = Cea608Decoder()
    text = "CAFÉ Ñ\nSECOND"
    out = None
    for pair in enc.encode_popon("CAFé ñ\nSECOND"):
        r = dec.push_pair(pair)
        if r is not None:
            out = r
    assert out == "CAFé ñ\nSECOND"


def test_tt_cea608_tt_pipeline():
    p = parse_launch("appsrc name=src ! text/x-raw, format=utf8 ! "
                     "tttocea608 ! cea608tott ! appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    from gstpu.core.caps import parse_caps
    src.set_property("caps", parse_caps("text/x-raw, format=utf8"))
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"FIRST CAPTION", pts=0))
    src.push_buffer(Buffer(b"SECOND ONE", pts=10**9))
    src.end_of_stream()
    p.run()
    outs = [b.to_bytes().decode() for b in sink.pull_all()]
    assert outs == ["FIRST CAPTION", "SECOND ONE"]
    p.set_state(State.NULL)


def test_ccdetect_posts_presence():
    h = Harness(make("ccdetect", window=0))
    h.set_caps("closedcaption/x-cea-608, format=raw")
    enc = Cea608Encoder()
    for pair in enc.encode_popon("HI"):
        h.push(Buffer(pair, pts=0))
    msgs = [m for m in h.bus.drain() if m.type is MessageType.ELEMENT]
    assert msgs and msgs[0].fields["cc608"] is True
    h.teardown()


def test_tttocea608_origin_and_rollup_timeout():
    """Round-5 knobs: origin-row/column land in the PAC, and
    roll-up-timeout erases stale display memory before new text."""
    from gstpu.codecs.cea608 import pac, odd_parity, EDM
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    el = make("tttocea608", mode="roll-up2", origin_row=8,
              origin_column=8, roll_up_timeout=500_000_000)
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    from gstpu import Buffer
    h.push(Buffer(b"hello", pts=0))
    out1 = h.pull_all()
    want_pac = bytes(odd_parity(x) for x in pac(8, 8))
    assert any(b.to_bytes() == want_pac for b in out1), \
        "PAC with origin row 8 / indent 8 not emitted"
    edm = bytes([odd_parity(0x14), odd_parity(EDM)])
    assert not any(b.to_bytes() == edm for b in out1)
    # 2 s later (past the 0.5 s timeout): display erased first
    h.push(Buffer(b"again", pts=2_000_000_000))
    out2 = h.pull_all()
    assert out2[0].to_bytes() == edm, "stale roll-up not erased"
    h.teardown()
