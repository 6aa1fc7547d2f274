"""Native library + G.711 element tests."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch, native
from gstpu.core.audio import AudioInfo


def test_native_available_and_crc():
    assert native.available()
    import zlib
    data = b"The quick brown fox jumps over the lazy dog"
    assert native.crc32(data) == zlib.crc32(data)
    assert native.crc32c(b"123456789") == 0xE3069283  # RFC test vector


def test_native_fallback_bit_parity():
    pcm = np.arange(-32768, 32767, 13, dtype=np.int16)
    nat = native.alaw_encode(pcm), native.mulaw_encode(pcm)
    lib = native._LIB
    native._LIB = None
    orig = native.load
    native.load = lambda build_if_missing=True: None
    try:
        fb = native.alaw_encode(pcm), native.mulaw_encode(pcm)
        np.testing.assert_array_equal(nat[0], fb[0])
        np.testing.assert_array_equal(nat[1], fb[1])
    finally:
        native.load = orig
        native._LIB = lib


def test_g711_quantization_bounds():
    pcm = np.linspace(-30000, 30000, 5000).astype(np.int16)
    for enc, dec in ((native.alaw_encode, native.alaw_decode),
                     (native.mulaw_encode, native.mulaw_decode)):
        rec = dec(enc(pcm)).astype(np.int32)
        rel = np.abs(rec - pcm) / np.maximum(np.abs(pcm.astype(np.int32)),
                                             256)
        assert rel.max() < 0.05  # logarithmic companding ~3%


def test_g711_elements_rtp_roundtrip():
    """Full chain: S16LE -> alawenc -> rtp pay/depay -> alawdec."""
    p = parse_launch(
        "audiotestsrc num-buffers=10 samplesperbuffer=160 freq=400 "
        "! audio/x-raw, format=S16LE, rate=8000, channels=1 "
        "! alawenc ! rtppcmapay2 ! rtppcmadepay2 ! alawdec "
        "! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sum(b.size for b in bufs) == 10 * 160 * 2
    info = AudioInfo.from_caps(sink.caps)
    assert info.format == "S16LE" and info.rate == 8000
    out = np.concatenate([info.view(b) for b in bufs])[:, 0]
    # signal survives companding: correlation with a 400 Hz sine
    t = np.arange(out.size) / 8000
    ref = np.sin(2 * np.pi * 400 * t)
    corr = np.corrcoef(out.astype(np.float64), ref)[0, 1]
    assert corr > 0.98
    p.set_state(State.NULL)


def test_mulaw_elements():
    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=80 "
        "! audio/x-raw, format=S16LE, rate=8000, channels=1 "
        "! mulawenc ! mulawdec ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    assert sum(b.size for b in sink.pull_all()) == 4 * 80 * 2
    p.set_state(State.NULL)
