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
    b.add_meta(VideoCaptionMeta("cea608-raw", b"\xaa\xbb"))
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


def test_transcriberbin_with_mock_transcriber():
    """A toy transcriber (emits one word per audio buffer) drives the
    full audio->text->608->combiner->meta path."""
    from gstpu.core.base import BaseTransform
    from gstpu.core.registry import register_element, Rank
    from gstpu.core.video import VideoCaptionMeta

    name = "mocktranscriber"
    from gstpu.core.registry import _registry
    if name not in _registry:
        @register_element(name, Rank.NONE)
        class MockTranscriber(BaseTransform):
            PAD_TEMPLATES = [
                PadTemplate("sink", PadDirection.SINK,
                            PadPresence.ALWAYS,
                            Caps.new("audio/x-raw")),
                PadTemplate("src", PadDirection.SRC,
                            PadPresence.ALWAYS,
                            Caps.new("text/x-raw", format="utf8")),
            ]

            def transform_caps(self, direction, caps, filter):
                out = (Caps.new("text/x-raw", format="utf8")
                       if direction is PadDirection.SINK
                       else Caps.new("audio/x-raw"))
                if filter is not None:
                    out = filter.intersect(out)
                return out

            def transform(self, buf):
                return Buffer(b"HELLO", pts=buf.pts,
                              duration=buf.duration)

    tb = make("transcriberbin", transcriber="mocktranscriber")
    from gstpu.core.element import State
    vout = _capture(tb.static_pad("src_video"))
    aout = _capture(tb.static_pad("src_audio"))
    tb.set_state(State.PLAYING)

    acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    af, vf = _feeder(acaps), _feeder(vcaps)
    af.link(tb.static_pad("sink_audio"))
    vf.link(tb.static_pad("sink_video"))
    _start(af, acaps)
    _start(vf, vcaps)

    af.push(Buffer(bytes(96), pts=0, duration=SECOND))
    af.push_event(EosEvent())
    vi = VideoInfo("RGBA", 4, 4)
    import numpy as np
    vf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=0,
                           duration=SECOND))
    vf.push_event(EosEvent())

    assert len(aout) == 1                  # audio passthrough
    assert len(vout) == 1
    metas = [m for m in vout[0].metas
             if isinstance(m, VideoCaptionMeta)]
    assert metas                           # captions attached
    # the 608 pairs decode back to the mock transcript
    from gstpu.codecs.cea608 import Cea608Decoder
    dec = Cea608Decoder()
    text = None
    for m in metas:
        text = dec.push_pair(m.data) or text
    assert text == "HELLO"


def test_transcriberbin_passthrough_without_transcriber():
    from gstpu.core.element import State
    tb = make("transcriberbin")
    vout = _capture(tb.static_pad("src_video"))
    tb.set_state(State.PLAYING)
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    vf = _feeder(vcaps)
    vf.link(tb.static_pad("sink_video"))
    _start(vf, vcaps)
    vf.push(Buffer(bytes(64), pts=0))
    assert len(vout) == 1 and not vout[0].metas


def test_onvifmetadatacombiner():
    from gstpu.elements.net.onvif import OnvifMetadataFrameMeta
    cb = make("onvifmetadatacombiner")
    out = _capture(cb.static_pad("src"))
    mcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    mf = _feeder(mcaps)
    mf.link(cb.request_pad("media"))
    _start(mf, mcaps)
    xf = _feeder("application/x-onvif-metadata")
    xf.link(cb.request_pad("meta"))
    _start(xf, "application/x-onvif-metadata, encoding=utf8")
    xf.push(Buffer(b"<tt:MetadataStream/>", pts=10_000_000))
    xf.push_event(EosEvent())
    import numpy as np
    from gstpu.core.video import VideoInfo
    vi = VideoInfo("RGBA", 4, 4)
    mf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=0))
    mf.push_event(EosEvent())
    assert len(out) == 1
    metas = [m for m in out[0].metas
             if isinstance(m, OnvifMetadataFrameMeta)]
    assert metas and metas[0].data == b"<tt:MetadataStream/>"
    assert metas[0].pts == 10_000_000


def test_onvif_overlay_and_extractor():
    import numpy as np
    from gstpu.core.harness import Harness
    from gstpu.core.video import VideoInfo
    from gstpu.elements.net.onvif import (ONVIF_SCHEMA,
                                          OnvifMetadataFrameMeta)

    xml = (f'<tt:MetadataStream xmlns:tt="{ONVIF_SCHEMA}">'
           f'<tt:VideoAnalytics><tt:Frame UtcTime="2026-01-01T00:00:00Z">'
           f'<tt:Object ObjectId="1"><tt:Appearance><tt:Shape>'
           f'<tt:BoundingBox left="-0.5" top="0.5" right="0.5" '
           f'bottom="-0.5"/></tt:Shape></tt:Appearance></tt:Object>'
           f'</tt:Frame></tt:VideoAnalytics></tt:MetadataStream>'
           ).encode()
    vi = VideoInfo("RGBA", 80, 60)
    h = Harness(make("onvifmetadataoverlay"))
    h.set_caps("video/x-raw, format=RGBA, width=80, height=60, "
               "framerate=30/1")
    b = vi.make_buffer(np.zeros((60, 80, 4), np.uint8), pts=0)
    b.add_meta(OnvifMetadataFrameMeta(xml, 0))
    h.push(b)
    out = vi.view(h.pull())
    # box covers x 20..60, y 15..45 (normalized +-0.5)
    assert tuple(out[15, 40, :3]) == (255, 255, 0)   # top edge
    assert tuple(out[30, 20, :3]) == (255, 255, 0)   # left edge
    assert tuple(out[30, 40, :3]) == (0, 0, 0)       # interior empty
    h.teardown()

    ex = make("onvifmetadataextractor")
    h2 = Harness(ex)
    h2.set_caps("video/x-raw, format=RGBA, width=80, height=60, "
                "framerate=30/1")
    b2 = vi.make_buffer(np.zeros((60, 80, 4), np.uint8), pts=5)
    b2.add_meta(OnvifMetadataFrameMeta(xml, 123))
    h2.push(b2)                    # creates the meta pad
    mp = ex.static_pad("meta")
    got = _capture(mp)
    b3 = vi.make_buffer(np.zeros((60, 80, 4), np.uint8), pts=6)
    b3.add_meta(OnvifMetadataFrameMeta(b"<x/>", 456))
    h2.push(b3)
    assert [g.to_bytes() for g in got] == [b"<x/>"]
    assert got[0].pts == 456
    assert all(not v.metas for v in h2.pull_all())
    h2.teardown()


def test_translationbin_splices_translator():
    from gstpu.core.base import BaseTransform
    from gstpu.core.registry import _registry, register_element, Rank
    from gstpu.core.video import VideoCaptionMeta
    from gstpu.core.element import State

    if "mocktranslator" not in _registry:
        @register_element("mocktranslator", Rank.NONE)
        class MockTranslator(BaseTransform):
            PAD_TEMPLATES = [
                PadTemplate("sink", PadDirection.SINK,
                            PadPresence.ALWAYS,
                            Caps.new("text/x-raw", format="utf8")),
                PadTemplate("src", PadDirection.SRC,
                            PadPresence.ALWAYS,
                            Caps.new("text/x-raw", format="utf8")),
            ]

            def transform(self, buf):
                return Buffer(b"HOLA", pts=buf.pts,
                              duration=buf.duration)

    # reuse the mock transcriber registered by the earlier test
    import tests.test_cccombiner as _self  # noqa
    from gstpu.core.registry import make as _make
    from gstpu.core.registry import _registry
    if "mocktranscriber" not in _registry:
        test_transcriberbin_with_mock_transcriber()

    tb = make("translationbin", transcriber="mocktranscriber",
              translator="mocktranslator")
    vout = _capture(tb.static_pad("src_video"))
    tb.set_state(State.PLAYING)
    acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    af, vf = _feeder(acaps), _feeder(vcaps)
    af.link(tb.static_pad("sink_audio"))
    vf.link(tb.static_pad("sink_video"))
    _start(af, acaps)
    _start(vf, vcaps)
    af.push(Buffer(bytes(96), pts=0, duration=SECOND))
    af.push_event(EosEvent())
    import numpy as np
    from gstpu.core.video import VideoInfo
    vi = VideoInfo("RGBA", 4, 4)
    vf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=0,
                           duration=SECOND))
    vf.push_event(EosEvent())
    metas = [m for m in vout[0].metas
             if isinstance(m, VideoCaptionMeta)]
    from gstpu.codecs.cea608 import Cea608Decoder
    dec = Cea608Decoder()
    text = None
    for m in metas:
        text = dec.push_pair(m.data) or text
    assert text == "HOLA"                # translated, not HELLO
    tb.set_state(State.NULL)


def _run_tb(tb, n_audio=1, n_video=1):
    from gstpu.core.element import State
    vout = _capture(tb.static_pad("src_video"))
    aout = _capture(tb.static_pad("src_audio"))
    tb.set_state(State.PLAYING)
    acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    af, vf = _feeder(acaps), _feeder(vcaps)
    af.link(tb.static_pad("sink_audio"))
    vf.link(tb.static_pad("sink_video"))
    _start(af, acaps)
    _start(vf, vcaps)
    import numpy as np
    vi = VideoInfo("RGBA", 4, 4)
    for i in range(n_audio):
        af.push(Buffer(bytes(96), pts=i * SECOND, duration=SECOND))
    af.push_event(EosEvent())
    for i in range(n_video):
        vf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8),
                               pts=i * SECOND, duration=SECOND))
    vf.push_event(EosEvent())
    return aout, vout


def test_transcriberbin_cea708_translation_services():
    from gstpu.core.registry import _registry
    if "mocktranscriber" not in _registry:
        test_transcriberbin_with_mock_transcriber()
    """mux-method=cea708 with translation-languages: the transcript
    fans out to per-language DTVCC services muxed into one cc_data
    stream (reference transcriberbin translation path)."""
    from gstpu.core.registry import _registry, register_element, Rank
    from gstpu.core.base import BaseTransform
    if "mockupper" not in _registry:
        @register_element("mockupper", Rank.NONE)
        class MockUpper(BaseTransform):
            """'Translator': uppercases + suffixes the language."""
            PAD_TEMPLATES = [
                PadTemplate("sink", PadDirection.SINK,
                            PadPresence.ALWAYS,
                            Caps.new("text/x-raw", format="utf8")),
                PadTemplate("src", PadDirection.SRC,
                            PadPresence.ALWAYS,
                            Caps.new("text/x-raw", format="utf8")),
            ]

            def transform_caps(self, direction, caps, filter):
                out = Caps.new("text/x-raw", format="utf8")
                if filter is not None:
                    out = filter.intersect(out)
                return out

            def transform(self, buf):
                return Buffer(buf.to_bytes().upper() + b"-FR",
                              pts=buf.pts, duration=buf.duration)

    tb = make("transcriberbin", transcriber="mocktranscriber",
              mux_method="cea708")
    tb.translation_languages = {"fr": 2}
    tb.translators = {"fr": "mockupper"}
    aout, vout = _run_tb(tb)
    assert len(vout) == 1
    metas = [m for m in vout[0].metas
             if isinstance(m, VideoCaptionMeta)]
    assert metas
    # collect service texts from the muxed cc_data
    from gstpu.codecs.cea708 import (ccdata_split, parse_dtvcc,
                                     service_block_text)
    texts = {}
    acc = b"".join(m.data for m in metas)
    _, packets = ccdata_split(acc)
    for pkt in packets:
        _, blocks = parse_dtvcc(pkt)
        for svc, payload in blocks:
            t = service_block_text(payload)
            if t:
                texts[svc] = texts.get(svc, "") + t
    assert texts.get(1) == "HELLO"
    assert texts.get(2) == "HELLO-FR"


def test_transcriberbin_live_passthrough_toggle():
    tb = make("transcriberbin", transcriber="mocktranscriber")
    tb.passthrough = True
    aout, vout = _run_tb(tb)
    assert len(vout) == 1
    assert not [m for m in vout[0].metas
                if isinstance(m, VideoCaptionMeta)]


def test_transcriberbin_caption_source_inband():
    from gstpu.core.registry import _registry
    if "mocktranscriber" not in _registry:
        test_transcriberbin_with_mock_transcriber()
    """caption-source=inband keeps upstream caption metas and adds
    no transcription; =transcription strips inband metas."""
    from gstpu.core.element import State
    import numpy as np
    for source, keep_inband, expect_transcript in (
            ("inband", True, False), ("transcription", False, True)):
        tb = make("transcriberbin", transcriber="mocktranscriber",
                  caption_source=source)
        vout = _capture(tb.static_pad("src_video"))
        _capture(tb.static_pad("src_audio"))
        tb.set_state(State.PLAYING)
        acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
        vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
                 "framerate=30/1")
        af, vf = _feeder(acaps), _feeder(vcaps)
        af.link(tb.static_pad("sink_audio"))
        vf.link(tb.static_pad("sink_video"))
        _start(af, acaps)
        _start(vf, vcaps)
        vi = VideoInfo("RGBA", 4, 4)
        af.push(Buffer(bytes(96), pts=0, duration=SECOND))
        af.push_event(EosEvent())
        b = vi.make_buffer(np.zeros((4, 4, 4), np.uint8), pts=0,
                           duration=SECOND)
        b.add_meta(VideoCaptionMeta("cea608-raw", b"\xaa\xbb"))
        vf.push(b)
        vf.push_event(EosEvent())
        assert len(vout) == 1
        metas = [m for m in vout[0].metas
                 if isinstance(m, VideoCaptionMeta)]
        inband = [m for m in metas if m.data == b"\xaa\xbb"]
        assert bool(inband) == keep_inband, source
        transcript = [m for m in metas if m.data != b"\xaa\xbb"]
        assert bool(transcript) == expect_transcript, source


def test_tttocea608_rollup_mode():
    from gstpu.core.harness import Harness
    from gstpu.codecs.cea608 import odd_parity
    el = make("tttocea608", mode="roll-up2")
    h = Harness(el)
    h.set_caps("text/x-raw, format=utf8")
    h.push(Buffer(b"NEWS LINE", pts=0, duration=SECOND))
    pairs = [b.to_bytes() for b in h.pull_all()]
    h.teardown()
    # roll-up preamble: RU2 (0x14 0x25) then CR (0x14 0x2D)
    assert pairs[0] == bytes([odd_parity(0x14), odd_parity(0x25)])
    assert pairs[1] == bytes([odd_parity(0x14), odd_parity(0x2D)])


def test_transcriberbin_cea608_channel_routing():
    """mux-method=cea608 with translation-languages mapped to cc3:
    primary rides cc1 (field 1) and the translation cc3 (field 2),
    merged by cea608mux into one s334-1a stream (reference
    transcriberbin/imp.rs:77-109, cea608mux at :2495)."""
    test_transcriberbin_with_mock_transcriber()   # register mocks
    test_transcriberbin_cea708_translation_services()
    from gstpu.core.video import VideoCaptionMeta
    tb = make("transcriberbin", transcriber="mocktranscriber",
              mux_method="cea608")
    tb.translation_languages = {"fr": "cc3"}
    tb.translators = {"fr": "mockupper"}
    aout, vout = _run_tb(tb)
    assert len(vout) == 1
    metas = [m for m in vout[0].metas
             if isinstance(m, VideoCaptionMeta)]
    assert metas
    assert metas[0].caption_type == "cea608-s334-1a"
    # decode per field
    from gstpu.codecs.cea608 import Cea608Decoder
    decs = {0: Cea608Decoder(), 1: Cea608Decoder()}
    texts = {0: None, 1: None}
    for m in metas:
        d = m.data
        for i in range(0, len(d) - 2, 3):
            field = 0 if d[i] & 0x80 else 1
            t = decs[field].push_pair(d[i + 1:i + 3])
            if t:
                texts[field] = t
    assert texts[0] == "HELLO"           # cc1: primary
    assert texts[1] == "HELLO-FR"        # cc3: translated


def test_cea608mux_pts_ordered_merge():
    from gstpu.core.element import State
    from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                                  SegmentEvent, StreamStartEvent)
    mux = make("cea608mux")
    got = _capture(mux.static_pad("src"))
    mux.set_state(State.PLAYING)
    p1 = mux.request_pad("sink_cc1")
    p3 = mux.request_pad("sink_cc3")
    cc_caps = "closedcaption/x-cea-608, format=raw"
    feeders = []
    for p in (p1, p3):
        f = _feeder(cc_caps)
        f.link(p)
        _start(f, cc_caps)
        feeders.append(f)
    # out-of-order across pads: merge must order by pts
    p3.chain(Buffer(b"\x14\x2c", pts=2 * SECOND))
    p1.chain(Buffer(b"\x94\x2c", pts=1 * SECOND))
    p1.chain(Buffer(b"\x94\xae", pts=3 * SECOND))
    for f in feeders:
        f.push_event(EosEvent())
    assert [b.pts for b in got] == [SECOND, 2 * SECOND, 3 * SECOND]
    assert got[0].to_bytes()[0] & 0x80          # cc1 -> field 1
    assert not got[1].to_bytes()[0] & 0x80      # cc3 -> field 2
    assert got[0].to_bytes()[1:3] == b"\x94\x2c"


def test_transcriberbin_live_transcriber_swap():
    """Setting `transcriber` at PLAYING swaps the transcription
    subtree live (reference transcriberbin runtime relink): captions
    before the swap decode to the old transcript, after to the new,
    with no pipeline restart."""
    from gstpu.codecs.cea608 import Cea608Decoder
    from gstpu.core.element import State
    from gstpu.core.registry import Rank, _registry, register_element
    import numpy as np

    from gstpu.core.registry import _registry
    if "mocktranscriber" not in _registry:
        test_transcriberbin_with_mock_transcriber()
    if "mockworld" not in _registry:
        @register_element("mockworld", Rank.NONE)
        class MockWorld(type(make("mocktranscriber"))):
            def transform(self, buf):
                return Buffer(b"WORLD", pts=buf.pts,
                              duration=buf.duration)

    tb = make("transcriberbin", transcriber="mocktranscriber")
    vout = _capture(tb.static_pad("src_video"))
    _capture(tb.static_pad("src_audio"))
    tb.set_state(State.PLAYING)
    acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    af, vf = _feeder(acaps), _feeder(vcaps)
    af.link(tb.static_pad("sink_audio"))
    vf.link(tb.static_pad("sink_video"))
    _start(af, acaps)
    _start(vf, vcaps)
    vi = VideoInfo("RGBA", 4, 4)

    def one_frame(i):
        af.push(Buffer(bytes(96), pts=i * SECOND, duration=SECOND))
        vf.push(vi.make_buffer(np.zeros((4, 4, 4), np.uint8),
                               pts=i * SECOND, duration=SECOND))

    def decode(buf):
        dec = Cea608Decoder()
        text = None
        for m in [m for m in buf.metas
                  if isinstance(m, VideoCaptionMeta)]:
            text = dec.push_pair(m.data) or text
        return text

    one_frame(0)
    tb.transcriber = "mockworld"            # live swap
    one_frame(1)
    af.push_event(EosEvent())
    vf.push_event(EosEvent())
    assert len(vout) == 2
    assert decode(vout[0]) == "HELLO"
    assert decode(vout[1]) == "WORLD"
    tb.set_state(State.NULL)


def test_transcriberbin_latency_query():
    """The bin announces its transcription latency on the video path
    (reference `latency`/`translate-latency` properties)."""
    from gstpu.core.element import State
    from gstpu.core.query import LatencyQuery
    from gstpu.core.registry import _registry

    from gstpu.core.registry import _registry
    if "mocktranscriber" not in _registry:
        test_transcriberbin_with_mock_transcriber()
    tb = make("transcriberbin", transcriber="mocktranscriber",
              latency=1500)
    _capture(tb.static_pad("src_video"))
    _capture(tb.static_pad("src_audio"))
    tb.set_state(State.PLAYING)
    acaps = "audio/x-raw, format=S16LE, rate=48000, channels=1"
    vcaps = ("video/x-raw, format=RGBA, width=4, height=4, "
             "framerate=30/1")
    af, vf = _feeder(acaps), _feeder(vcaps)
    af.link(tb.static_pad("sink_audio"))
    vf.link(tb.static_pad("sink_video"))
    vf.query_function = lambda p, q: True   # upstream: live, 0 latency
    q = LatencyQuery()
    pad = tb.static_pad("src_video")
    assert pad.query_function(pad, q)
    assert q.min_latency == 1_500_000_000
    # passthrough drops the announced latency
    tb.passthrough = True
    q2 = LatencyQuery()
    assert pad.query_function(pad, q2)
    assert q2.min_latency == 0
    tb.set_state(State.NULL)
