"""Reference-name aliases + small fill-in element tests."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.registry import make


def test_reference_names_resolve():
    from gstpu.core.registry import list_factories
    fs = set(list_factories())
    for name in ("rsidentity", "rsfilesrc", "rsfilesink", "udpsrc2",
                 "imagersdec", "imagersoverlay", "zlibcompress",
                 "zlibdecompress", "deflatecompress", "ts-queue",
                 "ts-udpsrc", "ts-appsrc", "ts-proxysink",
                 "rtponvifmetadatapay"):
        assert name in fs, name


def test_rssinesrc_pipeline():
    from gstpu.core.audio import AudioInfo
    p = parse_launch("rssinesrc num-buffers=4 freq=1000 volume=0.5 ! "
                     "appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(out.caps)
    assert info.rate == 48000 and info.format == "F32LE"
    samples = np.concatenate([info.view(b)[:, 0]
                              for b in out.pull_all()])
    assert len(samples) == 4096
    assert abs(samples.max() - 0.5) < 0.01
    # fundamental at 1 kHz
    spec = np.abs(np.fft.rfft(samples))
    peak_hz = np.argmax(spec) * 48000 / len(samples)
    assert abs(peak_hz - 1000) < 24


def test_rsrgb2gray():
    p = parse_launch("videotestsrc num-buffers=1 pattern=white ! "
                     "video/x-raw, format=RGB, width=8, height=8, "
                     "framerate=30/1 ! rsrgb2gray invert=true ! "
                     "appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    assert out.caps[0]["format"] == "GRAY8"
    frame = out.pull_all()[0].array
    assert (frame == 0).all()            # inverted white -> black
    p.set_state(State.NULL)


def test_input_selector_switch():
    from gstpu import Caps, FlowReturn
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    sel = make("ts-input-selector")
    out = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    sel.static_pad("src").link(cap)
    feeders = []
    for _ in range(2):
        f = Pad("f", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC,
                            PadPresence.ALWAYS, Caps.any()))
        f.link(sel.request_pad())
        f.push_event(StreamStartEvent("s"))
        f.push_event(CapsEvent(parse_caps("x/y")))
        f.push_event(SegmentEvent(Segment()))
        feeders.append(f)
    feeders[0].push(Buffer(b"a0"))
    feeders[1].push(Buffer(b"b0"))       # inactive: dropped
    sel.set_active("sink_1")
    feeders[0].push(Buffer(b"a1"))       # now dropped
    feeders[1].push(Buffer(b"b1"))
    assert [b.to_bytes() for b in out] == [b"a0", b"b1"]


def test_roq_mux_demux_pipeline():
    from gstpu.net.rtp.packet import RtpPacket
    p = parse_launch('appsrc name=src caps="application/x-rtp" ! '
                     'quinnroqmux flow_id=9 ! quinnroqdemux ! '
                     'appsink name=out')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    pkt = RtpPacket(payload_type=96, seqnum=1, timestamp=0, ssrc=5,
                    payload=b"media").to_bytes()
    src.push_buffer(Buffer(pkt, pts=0))
    src.end_of_stream()
    p.run()
    outs = p.get_by_name("out").pull_all()
    assert outs[0].to_bytes() == pkt
    assert outs[0].offset == 9           # flow id surfaced
    p.set_state(State.NULL)


def test_progressbin_messages():
    p = parse_launch("audiotestsrc num-buffers=30 "
                     "samplesperbuffer=4800 ! rsprogressbin ! "
                     "fakesink")
    p.set_state(State.PLAYING)
    p.run()
    msgs = [m for m in p.bus.drain()
            if m.type.name == "ELEMENT"
            and m.fields.get("name") == "progress"]
    assert len(msgs) >= 2
    p.set_state(State.NULL)


def test_reqwesthttpsrc_local_server(tmp_path):
    import http.server
    import threading

    payload = bytes(range(256)) * 40
    (tmp_path / "media.bin").write_bytes(payload)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        p = parse_launch(
            f"reqwesthttpsrc location=http://127.0.0.1:{port}/"
            f"media.bin blocksize=1000 ! appsink name=out")
        p.set_state(State.PLAYING)
        p.run()
        out = p.get_by_name("out")
        data = b"".join(b.to_bytes() for b in out.pull_all())
        assert data == payload
        assert out.caps[0].name == "application/x-http-data"
        p.set_state(State.NULL)
        # 404 fails state change cleanly
        from gstpu.core.element import StateChangeReturn
        bad = make("reqwesthttpsrc",
                   location=f"http://127.0.0.1:{port}/nope")
        assert bad.set_state(State.READY) is StateChangeReturn.FAILURE
    finally:
        srv.shutdown()


def test_rtpdtmfsrc_events():
    from gstpu.net.rtp.packet import RtpPacket
    p = parse_launch("ts-rtpdtmfsrc tones=1# tone_duration_ms=80 "
                     "packet_ms=40 ! appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    pkts = [RtpPacket.parse(b.to_bytes()) for b in out.pull_all()]
    assert len(pkts) == 4                  # 2 tones x 2 packets
    assert pkts[0].marker and not pkts[1].marker
    assert pkts[0].payload[0] == 1         # event '1'
    assert pkts[2].payload[0] == 11        # event '#'
    assert pkts[1].payload[1] & 0x80       # E bit on final packet
    assert [q.seqnum for q in pkts] == [0, 1, 2, 3]
    p.set_state(State.NULL)
