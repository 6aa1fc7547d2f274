"""compress / plumbing / videofx element tests."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, State, parse_launch
from gstpu.core.buffer import BufferFlags, OriginalBufferMeta
from gstpu.core.element import MessageType
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.core.video import VideoInfo


def test_flate_roundtrip_pipeline():
    p = parse_launch(
        "audiotestsrc num-buffers=10 ! audio/x-raw, format=S16LE, "
        "rate=8000, channels=1 ! flatecompress ! flatedecompress "
        "! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sink.is_eos
    # decompressed caps recovered the original raw audio caps
    assert sink.caps[0].name == "audio/x-raw"
    assert sink.caps[0]["rate"] == 8000
    total = sum(b.size for b in bufs)
    assert total == 10 * 1024 * 2
    p.set_state(State.NULL)


def test_flate_compressed_caps_carry_original():
    p = parse_launch(
        "audiotestsrc num-buffers=2 ! audio/x-raw, format=S16LE, "
        "rate=8000, channels=1 ! flatecompress ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    s = sink.caps[0]
    assert s.name in ("application/x-zlib-compressed",
                      "application/x-deflate-compressed")
    oc = s["original-caps"]
    assert isinstance(oc, Caps) and oc[0].name == "audio/x-raw"
    # data is actually compressed
    import zlib
    raw = b"".join(b.to_bytes() for b in sink.pull_all())
    out = zlib.decompressobj().decompress(raw)
    assert len(out) > 0
    p.set_state(State.NULL)


def test_originalbuffer_save_restore():
    p = parse_launch("appsrc name=src ! originalbuffersave ! "
                     "identity ! originalbufferrestore ! appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    src.set_property("caps", Caps.new("application/x-test"))
    p.set_state(State.PLAYING)
    original = np.arange(100, dtype=np.uint8)
    buf = Buffer(original.copy(), pts=123)
    src.push_buffer(buf)
    # simulate lossy transform between save and restore
    ident = None
    for el in p.iterate_elements():
        if el.ELEMENT_NAME == "identity":
            ident = el
    src.end_of_stream()
    p.run()
    out = sink.pull_all()[0]
    np.testing.assert_array_equal(out.array, original)
    assert out.pts == 123
    p.set_state(State.NULL)


def test_gopbuffer_delays_and_flushes():
    h = Harness(make("gopbuffer", minimum_duration=10**9))
    h.set_caps("video/x-h264-ish")
    SEC = 10**9
    n_pushed = 0
    for i in range(12):
        b = Buffer(bytes([i]), pts=i * SEC // 2)  # keyframe every 4
        if i % 4 != 0:
            b.set_flag(BufferFlags.DELTA_UNIT)
        h.push(b)
        n_pushed += 1
    assert len(h.buffers) < n_pushed  # still retaining a window
    h.push_eos()
    assert len(h.buffers) == n_pushed  # everything flushed at EOS
    # order preserved
    vals = [b.to_bytes()[0] for b in h.pull_all()]
    assert vals == list(range(12))
    h.teardown()


def test_inter_pipeline_bridge():
    p1 = parse_launch("audiotestsrc num-buffers=5 ! audio/x-raw, "
                      "format=F32LE, rate=8000, channels=1 ! "
                      "intersink producer-name=t1")
    p2 = parse_launch("intersrc producer-name=t1 ! appsink name=sink")
    sink = p2.get_by_name("sink")
    p2.set_state(State.PLAYING)
    p1.set_state(State.PLAYING)
    p1.run()
    p2.run(timeout=5)
    bufs = sink.pull_all()
    assert len(bufs) == 5
    assert sink.caps[0].name == "audio/x-raw"
    p1.set_state(State.NULL)
    p2.set_state(State.NULL)


def test_streamgrouper_rewrites_group():
    from gstpu.core.event import StreamStartEvent
    h = Harness("streamgrouper")
    h.set_caps("application/x-test")
    evs = [e for e in h.events if isinstance(e, StreamStartEvent)]
    assert evs and evs[0].group_id == 1
    h.teardown()


def test_roundedcorners():
    p = parse_launch("videotestsrc num-buffers=1 pattern=white ! "
                     "video/x-raw, format=I420, width=32, height=32 ! "
                     "roundedcorners border-radius-px=8 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    vi = VideoInfo.from_caps(sink.caps)
    assert vi.format == "A420"
    planes = vi.planes(sink.pull_all()[0])
    assert len(planes) == 4
    alpha = planes[3]
    assert alpha[0, 0] == 0          # corner transparent
    assert alpha[16, 16] == 255      # center opaque
    assert alpha[0, 16] == 255       # edge midpoints opaque
    p.set_state(State.NULL)


def test_colordetect_posts_message():
    p = parse_launch("videotestsrc num-buffers=2 pattern=red ! "
                     "video/x-raw, format=RGB, width=32, height=32 ! "
                     "colordetect ! fakesink")
    p.set_state(State.PLAYING)
    p.run()
    msgs = [m for m in p.bus.drain() if m.type is MessageType.ELEMENT
            and m.name == "colordetect"]
    assert len(msgs) == 1  # posted once (color unchanged on frame 2)
    assert msgs[0].fields["dominant_color"] == "red"
    p.set_state(State.NULL)


def test_videocompare_match():
    el = make("videocompare")
    el.set_property("max-dist-threshold", 0.1)
    h = Harness(el)  # links "sink" and "src"
    bus = h.bus
    h.set_caps("video/x-raw, format=RGB, width=64, height=64, "
               "framerate=30/1")
    sec = el.static_pad("sink_secondary")
    from gstpu.core.element import Pad, PadDirection, PadTemplate
    from gstpu.core.element import PadPresence
    feeder = Pad("feeder", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                             Caps.any()))
    feeder.link(sec)
    from gstpu.core.event import (CapsEvent, SegmentEvent, Segment,
                                  StreamStartEvent)
    from gstpu.core.caps import parse_caps
    feeder.push_event(StreamStartEvent("sec"))
    feeder.push_event(CapsEvent(parse_caps(
        "video/x-raw, format=RGB, width=64, height=64, framerate=30/1")))

    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    feeder.push(Buffer(frame.reshape(-1), pts=42))
    h.push(Buffer(frame.reshape(-1), pts=100))
    msgs = [m for m in bus.drain() if m.type is MessageType.ELEMENT]
    assert msgs and msgs[0].name == "videocompare"
    assert msgs[0].fields["distance"] <= 0.1
    # different frame: no message
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h.push(Buffer(other.reshape(-1), pts=133))
    assert not [m for m in bus.drain() if m.type is MessageType.ELEMENT]
    h.teardown()


def test_native_net_batched_udp():
    """Native media-plane IO (SURVEY 2.9): recvmmsg/sendmmsg batches
    through native/gstpu_net.cpp, and udpsrc drains via it."""
    import socket as _socket
    import time as _time

    from gstpu.native_net import recv_batch, send_batch
    rx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.setblocking(False)
    port = rx.getsockname()[1]
    tx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    pkts = [(bytes([i]) * (5 + i), ("127.0.0.1", port))
            for i in range(40)]
    assert send_batch(tx, pkts) == 40
    _time.sleep(0.05)
    got = []
    while True:
        batch = recv_batch(rx, 64)
        if not batch:
            break
        got.extend(batch)
    assert [g[0] for g in got] == [p[0] for p in pkts]
    rx.close()
    tx.close()


def test_udpsrc_batch_drain():
    import socket as _socket
    import time as _time

    from gstpu import State, parse_launch
    p = parse_launch("udpsrc port=0 name=src ! appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    tx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    for i in range(30):
        tx.sendto(bytes([i]) * 12, ("127.0.0.1", src.bound_port))
    deadline = _time.monotonic() + 5
    while len(sink.samples) < 30 and _time.monotonic() < deadline:
        p.iterate()
        _time.sleep(0.001)
    p.set_state(State.NULL)
    tx.close()
    assert len(sink.samples) == 30
    assert sink.samples[5].to_bytes() == bytes([5]) * 12


# ---------------------------------------------------------------------------
# brotli (RFC 7932 stored-mode framing, gstpu/codecs/brotli_rfc7932.py)
# ---------------------------------------------------------------------------

def test_brotli_known_empty_streams():
    from gstpu.codecs.brotli_rfc7932 import decompress
    # canonical minimal empty streams produced by the reference
    # brotli library: 0x3b (wbits 22) and 0x06 (wbits 16)
    assert decompress(b"\x3b") == b""
    assert decompress(b"\x06") == b""


def test_brotli_stored_roundtrip():
    import os
    from gstpu.codecs.brotli_rfc7932 import compress_stored, decompress
    for payload in (b"", b"x", b"hello brotli" * 100,
                    os.urandom(70_000)):
        enc = compress_stored(payload)
        assert decompress(enc) == payload


def test_brotli_rejects_prefix_coded_blocks():
    import pytest
    from gstpu.codecs.brotli_rfc7932 import BrotliError, decompress
    # wbits=16 ('0'), ISLAST=1, ISLASTEMPTY=0, MNIBBLES=4, MLEN-1=0
    # -> a compressed metablock follows: must raise, not misparse
    from gstpu.codecs.brotli_rfc7932 import _BitWriter
    w = _BitWriter()
    w.write(0, 1); w.write(1, 1); w.write(0, 1)
    w.write(0, 2); w.write(0, 16); w.write(0, 8)
    with pytest.raises(BrotliError, match="dictionary"):
        decompress(w.bytes_out())


def test_brotli_elements_pipeline_roundtrip():
    from gstpu import Buffer, State, parse_launch
    p = parse_launch("appsrc name=in caps=application/x-test ! "
                     "brotlicompress ! brotlidecompress ! "
                     "appsink name=out")
    src = p.get_by_name("in")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    payloads = [b"one", b"two" * 500, b"\x00" * 4096]
    for d in payloads:
        src.push_buffer(Buffer(d))
    src.end_of_stream()
    p.run()
    assert [b.to_bytes() for b in out.samples] == payloads
    p.set_state(State.NULL)


def test_brotli_ctypes_backend_roundtrip():
    """The in-image libbrotlienc/libbrotlidec backend (the one the
    elements pick when the python module is absent) round-trips and
    actually entropy-codes (compressible input shrinks)."""
    import os
    import pytest
    from gstpu.codecs import brotli_ctypes
    if not brotli_ctypes.available():
        pytest.skip("libbrotli not in image")
    for payload in (b"", b"x", b"hello brotli " * 400,
                    os.urandom(70_000)):
        enc = brotli_ctypes.compress(payload, quality=9)
        assert brotli_ctypes.decompress(enc) == payload
    big = b"the quick brown fox " * 2000
    assert len(brotli_ctypes.compress(big)) < len(big) // 10


def test_brotli_stored_mode_accepted_by_libbrotli():
    """Independent-oracle check: the from-spec RFC 7932 stored-mode
    writer's streams decode under the real brotli C library."""
    import os
    import pytest
    from gstpu.codecs import brotli_ctypes
    from gstpu.codecs.brotli_rfc7932 import compress_stored
    if not brotli_ctypes.available():
        pytest.skip("libbrotli not in image")
    for payload in (b"", b"y", b"stored" * 333, os.urandom(66_000)):
        assert brotli_ctypes.decompress(
            compress_stored(payload)) == payload


def test_brotli_elements_use_entropy_backend():
    """With libbrotli present the element pair entropy-codes: the
    wire buffers are far smaller than the payload, and the pipeline
    still round-trips bit-exactly."""
    import pytest
    from gstpu import Buffer, State, parse_launch
    from gstpu.codecs import brotli_ctypes
    if not brotli_ctypes.available():
        pytest.skip("libbrotli not in image")
    p = parse_launch("appsrc name=in caps=application/x-test ! "
                     "brotlicompress quality=9 ! appsink name=mid")
    src, mid = p.get_by_name("in"), p.get_by_name("mid")
    p.set_state(State.PLAYING)
    payload = b"abcdefgh" * 8192
    src.push_buffer(Buffer(payload))
    src.end_of_stream()
    p.run()
    wire = [b.to_bytes() for b in mid.samples]
    assert sum(len(w) for w in wire) < len(payload) // 20
    p.set_state(State.NULL)
    # each wire buffer is a complete RFC 7932 stream the C library
    # decodes independently (element-level roundtrip is covered by
    # test_brotli_elements_pipeline_roundtrip on the same backend)
    assert b"".join(brotli_ctypes.decompress(w) for w in wire) == payload


SECOND = 1_000_000_000
from gstpu import FlowReturn
from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                PadTemplate)

# -- round-5 reference-property parity ---------------------------------------

def test_gopbuffer_max_size_time_discards_oldest():
    from gstpu.core.buffer import BufferFlags
    gb = make("gopbuffer", minimum_duration=10 * SECOND,
              max_size_time=2 * SECOND)
    out = []
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    sink.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    sink.event_function = lambda p, e: True
    gb.static_pad("src").link(sink)
    feed = Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC,
                           PadPresence.ALWAYS, Caps.any()))
    feed.link(gb.static_pad("sink"))
    gb.set_state(State.PLAYING)
    # 6 one-second GOPs (keyframe + delta each); minimum-duration is
    # huge so nothing flows until EOS — the 2 s max bound must evict
    for i in range(6):
        k = Buffer(bytes([i]), pts=i * SECOND)
        feed.push(k)
        d = Buffer(bytes([i, i]), pts=i * SECOND + SECOND // 2)
        d.set_flag(BufferFlags.DELTA_UNIT)
        feed.push(d)
    from gstpu.core.event import EosEvent
    feed.push_event(EosEvent())
    # only the freshest ~2 s of GOPs survived the bound
    starts = [b.pts // SECOND for b in out if not
              b.has_flag(BufferFlags.DELTA_UNIT)]
    assert starts and len(starts) <= 3 and starts[-1] == 5
    assert 0 not in starts and 1 not in starts


def test_intersrc_queue_bounds_drop_oldest():
    sink = make("intersink", producer_name="bnd")
    src = make("intersrc", producer_name="bnd", max_buffers=3)
    src.set_state(State.PLAYING)
    sink.set_state(State.PLAYING)
    for i in range(10):
        sink.render(Buffer(bytes([i]), pts=i * SECOND))
    assert len(src._q) == 3
    assert [b.to_bytes() for b, _ in src._q] == [b"\x07", b"\x08",
                                                 b"\x09"]
    src.set_state(State.NULL)
    sink.set_state(State.NULL)


def test_intersink_event_types_forwarding():
    from gstpu.core.event import CustomEvent
    sink = make("intersink", producer_name="evt",
                event_types="eos,custom-downstream")
    src = make("intersrc", producer_name="evt")
    src.set_state(State.PLAYING)
    sink.set_state(State.PLAYING)
    ev = CustomEvent({"name": "marker", "x": 1})
    sink._event(sink.sinkpad, ev)
    assert list(src._pending_events) == [ev]
    src.set_state(State.NULL)
    sink.set_state(State.NULL)
