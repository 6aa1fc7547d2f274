"""dashsink2 + uriplaylistbin tests."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, State, parse_launch
from gstpu.codecs.flac import encode_verbatim
from gstpu.core.audio import AudioInfo

SECOND = 10**9


def test_dashsink(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = parse_launch(
        "appsrc name=src ! audio/x-opus, rate=48000, channels=2 ! "
        "cmafmux fragment-duration=100000000 ! "
        "dashsink2 mpd-location=manifest.mpd target-duration=1")
    src = p.get_by_name("src")
    from gstpu.core.caps import parse_caps
    src.set_property("caps",
                     parse_caps("audio/x-opus, rate=48000, channels=2"))
    p.set_state(State.PLAYING)
    for i in range(12):
        src.push_buffer(Buffer(bytes([i]) * 30, pts=i * 20_000_000,
                               duration=20_000_000))
    src.end_of_stream()
    p.run()
    p.set_state(State.NULL)
    mpd = (tmp_path / "manifest.mpd").read_text()
    assert mpd.startswith('<?xml')
    assert 'type="static"' in mpd  # finalized at EOS
    assert "SegmentTemplate" in mpd
    assert 'initialization="init.mp4"' in mpd
    assert (tmp_path / "init.mp4").exists()
    assert (tmp_path / "segment-00001.m4s").exists()
    from gstpu.mux.boxes import parse_boxes
    seg = parse_boxes((tmp_path / "segment-00001.m4s").read_bytes())
    assert "moof" in [b.fourcc for b in seg]


def test_uriplaylistbin_gapless(tmp_path):
    # two short FLAC files played back-to-back with continuous pts
    rate = 8000
    files = []
    for k in (1, 2):
        pcm = (np.ones((rate, 1)) * 1000 * k).astype(np.int16)
        f = tmp_path / f"clip{k}.flac"
        f.write_bytes(encode_verbatim(pcm, rate, 16))
        files.append(f"file://{f}")
    p = parse_launch("uriplaylistbin name=pl ! appsink name=sink")
    pl = p.get_by_name("pl")
    pl.set_property("uris", files)
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run(timeout=60)
    bufs = sink.pull_all()
    assert sink.is_eos
    info = AudioInfo.from_caps(sink.caps)
    total = sum(info.view(b).shape[0] for b in bufs)
    assert total == 2 * rate
    # continuous timestamps across the item boundary
    pts = [b.pts for b in bufs]
    assert pts == sorted(pts)
    assert pts[0] == 0
    mid = next(i for i, b in enumerate(bufs)
               if info.view(b)[0, 0] == 2000)
    assert abs(bufs[mid].pts - SECOND) < 2_000_000  # second clip at ~1s
    p.set_state(State.NULL)


def test_uriplaylistbin_loops(tmp_path):
    rate = 8000
    pcm = np.zeros((rate // 2, 1), np.int16)
    f = tmp_path / "c.flac"
    f.write_bytes(encode_verbatim(pcm, rate, 16))
    p = parse_launch("uriplaylistbin name=pl ! appsink name=sink")
    p.get_by_name("pl").set_property("uris", [f"file://{f}"])
    p.get_by_name("pl").set_property("iterations", 3)
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run(timeout=60)
    info = AudioInfo.from_caps(sink.caps)
    total = sum(info.view(b).shape[0] for b in sink.pull_all())
    assert total == 3 * rate // 2
    p.set_state(State.NULL)


def test_hlsmultivariantsink(tmp_path):
    from gstpu.core.buffer import BufferFlags
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import Pad, PadDirection, PadPresence, \
        PadTemplate
    from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                                  SegmentEvent, StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("hlsmultivariantsink",
                playlist_location=str(tmp_path / "master.m3u8"),
                target_duration=2)
    pads = [
        sink.request_pad_with_settings(
            variant={"uri": "hi.m3u8", "bandwidth": 2_000_000,
                     "codecs": "avc1.64001f,mp4a.40.2"}),
        sink.request_pad_with_settings(
            variant={"uri": "iframe.m3u8", "bandwidth": 200_000,
                     "is_i_frame": True, "codecs": "avc1.64001f"}),
        sink.request_pad_with_settings(
            rendition={"media_type": "audio", "uri": "en.m3u8",
                       "group_id": "aud", "name": "English",
                       "language": "en", "default": True,
                       "autoselect": True}),
    ]

    def feeder():
        return Pad("f", PadDirection.SRC,
                   PadTemplate("src", PadDirection.SRC,
                               PadPresence.ALWAYS, Caps.any()))

    for pad in pads:
        f = feeder()
        f.link(pad)
        f.push_event(StreamStartEvent("s"))
        f.push_event(CapsEvent(parse_caps("video/quicktime")))
        f.push_event(SegmentEvent(Segment()))
        hdr = Buffer(b"init-seg")
        hdr.set_flag(BufferFlags.HEADER)
        f.push(hdr)
        f.push(Buffer(b"frag0", pts=0, duration=2 * 10**9))
        f.push(Buffer(b"frag1", pts=2 * 10**9, duration=2 * 10**9))
        f.push_event(EosEvent())

    master = (tmp_path / "master.m3u8").read_text()
    assert master.startswith("#EXTM3U")
    assert ('#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aud",NAME="English",'
            'LANGUAGE="en",DEFAULT=YES,AUTOSELECT=YES,URI="en.m3u8"'
            in master)
    assert ('#EXT-X-STREAM-INF:BANDWIDTH=2000000,'
            'CODECS="avc1.64001f,mp4a.40.2",AUDIO="aud"\nhi.m3u8'
            in master)
    assert ('#EXT-X-I-FRAME-STREAM-INF:BANDWIDTH=200000,'
            'CODECS="avc1.64001f",URI="iframe.m3u8"' in master)
    # every rendition got its own media playlist + init + segments
    for uri in ("hi", "iframe", "en"):
        pl = (tmp_path / f"{uri}.m3u8").read_text()
        assert "#EXT-X-ENDLIST" in pl
        assert f'#EXT-X-MAP:URI="{uri}_init.mp4"' in pl
        assert (tmp_path / f"{uri}_init.mp4").read_bytes() == b"init-seg"
        assert (tmp_path / f"{uri}_00001.m4s").read_bytes() == b"frag1"


def test_hlsmultivariantsink_unconfigured_pad_errors(tmp_path):
    from gstpu.core.registry import make
    sink = make("hlsmultivariantsink",
                playlist_location=str(tmp_path / "m.m3u8"))
    pad = sink.request_pad()
    with pytest.raises(ValueError):
        sink.configure_pad(pad)  # neither variant nor rendition
    with pytest.raises(ValueError):
        sink.configure_pad(pad, variant={"uri": "x.m3u8"})  # no bandwidth


def test_hlswebvttsink(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from gstpu import State, parse_launch
    from gstpu.codecs.cea608 import Cea608Encoder

    p = parse_launch('appsrc name=src caps="closedcaption/x-cea-608, '
                     'format=raw" ! cea608tojson ! jsontovtt '
                     'default_duration=1000000000 ! hlswebvttsink '
                     'target_duration=2 playlist_location=s.m3u8')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    base = 0
    for word in ("ONE", "TWO", "THREE"):
        for i, pair in enumerate(Cea608Encoder().encode_popon(word)):
            src.push_buffer(Buffer(pair, pts=base + i * 33_000_000))
        base += 3 * 10**9
    src.end_of_stream()
    p.run()
    p.set_state(State.NULL)
    pl = (tmp_path / "s.m3u8").read_text()
    assert "#EXT-X-ENDLIST" in pl
    segs = [ln for ln in pl.splitlines() if ln.endswith(".vtt")]
    assert len(segs) >= 2
    first = (tmp_path / segs[0]).read_text()
    assert first.startswith("WEBVTT\nX-TIMESTAMP-MAP=MPEGTS:")
    assert "ONE" in first and "-->" in first
    joined = "".join((tmp_path / s).read_text() for s in segs)
    assert "TWO" in joined and "THREE" in joined


def test_uriplaylistbin_http_items(tmp_path):
    """http(s) playlist items stream through reqwesthttpsrc
    (reference uriplaylistbin routes any URI via uridecodebin3)."""
    import http.server
    import threading
    rate = 8000
    pcm = (np.ones((rate // 4, 1)) * 3000).astype(np.int16)
    (tmp_path / "clip.flac").write_bytes(
        encode_verbatim(pcm, rate, 16))

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        p = parse_launch("uriplaylistbin name=pl ! appsink name=sink")
        pl = p.get_by_name("pl")
        pl.set_property(
            "uris", [f"http://127.0.0.1:{port}/clip.flac",
                     f"file://{tmp_path}/clip.flac"])
        sink = p.get_by_name("sink")
        p.set_state(State.PLAYING)
        p.run(timeout=60)
        bufs = sink.pull_all()
        assert sink.is_eos
        info = AudioInfo.from_caps(sink.caps)
        total = sum(info.view(b).shape[0] for b in bufs)
        assert total == 2 * (rate // 4)   # both items decoded
        p.set_state(State.NULL)
    finally:
        srv.shutdown()
