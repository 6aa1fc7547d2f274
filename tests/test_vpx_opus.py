"""opusenc/opusdec + vp8enc/vp9enc/dec elements over the in-image
libopus/libvpx engines, and their RTP loopbacks — the codec slots the
reference's webrtcsink registry expects (net/webrtc/src/webrtcsink/
imp.rs:106-346); loopback style mirrors the reference's pay!depay
harness tests (net/rtp/src/*/tests)."""

import numpy as np
import pytest

import gstpu
from gstpu import parse_launch
from gstpu.core.element import State
from gstpu.native_codec import load as codec_shim

pytestmark = pytest.mark.skipif(codec_shim() is None,
                                reason="native codec shim unavailable")

SECOND = 1_000_000_000


def run_pipeline(desc: str):
    p = parse_launch(desc + " ! appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    p.set_state(State.NULL)
    return out.pull_all()


# ---------------------------------------------------------------------------
# opus
# ---------------------------------------------------------------------------

def _sine(n, rate=48000, ch=2, f=440.0):
    t = np.arange(n) / rate
    return np.stack([np.sin(2 * np.pi * f * (i + 1) * t)
                     for i in range(ch)], axis=1).astype(np.float32) * 0.5


def test_opus_element_loopback_psnr():
    bufs = run_pipeline(
        'audiotestsrc num-buffers=50 samplesperbuffer=960 freq=440 ! '
        'capsfilter caps="audio/x-raw, format=F32LE, rate=48000, '
        'channels=2" ! opusenc bitrate=128000 ! opusdec')
    dec = np.concatenate([np.frombuffer(b.to_bytes(), "<f4")
                          for b in bufs]).reshape(-1, 2)
    # at least 90% of the input duration survives (preskip + drain)
    assert len(dec) >= int(50 * 960 * 0.9)
    # a 440 Hz tone must come back as a 440 Hz tone: dominant DFT bin
    seg = dec[8000:8000 + 4800, 0] * np.hanning(4800)
    spec = np.abs(np.fft.rfft(seg))
    peak_hz = np.argmax(spec) * 48000 / 4800
    assert abs(peak_hz - 440) < 15, peak_hz


def test_opus_rtp_pay_depay_loopback():
    bufs = run_pipeline(
        'audiotestsrc num-buffers=30 samplesperbuffer=960 ! '
        'capsfilter caps="audio/x-raw, format=F32LE, rate=48000, '
        'channels=2" ! opusenc ! rtpopuspay2 ! rtpopusdepay2 ! opusdec')
    n = sum(len(b.to_bytes()) for b in bufs) // 8
    assert n >= int(30 * 960 * 0.9)


def test_opusenc_packet_timing():
    """20 ms default frames -> 960-sample packets, duration 20 ms."""
    bufs = run_pipeline(
        'audiotestsrc num-buffers=10 samplesperbuffer=480 ! '
        'capsfilter caps="audio/x-raw, format=F32LE, rate=48000, '
        'channels=1" ! opusenc')
    assert len(bufs) >= 4
    # steady-state packets are 20 ms; the drain tail may be shorter
    durs = {b.duration for b in bufs[:-1] if b.duration}
    assert durs == {20_000_000}, durs
    # PTS advance one frame per packet
    pts = [b.pts for b in bufs if b.pts is not None]
    deltas = {b - a for a, b in zip(pts, pts[1:])}
    assert deltas <= {20_000_000}, deltas


def test_opusenc_reconfigure_bitrate():
    from gstpu.core.harness import Harness
    h = Harness("opusenc")
    h.set_caps("audio/x-raw, format=F32LE, rate=48000, "
                       "channels=2, layout=interleaved")
    sig = _sine(960)
    h.push(gstpu.Buffer(sig.tobytes(), pts=0))
    enc = h.element
    out = enc.reconfigure_bitrate(32000)
    assert enc.bitrate == 32000
    h.push(gstpu.Buffer(sig.tobytes(), pts=20_000_000))
    assert h.pull_all() or out    # engine still produces packets


def test_opus_8k_mono():
    """Narrowband input (discovery pushes S16LE 8 kHz mono)."""
    bufs = run_pipeline(
        'audiotestsrc num-buffers=10 samplesperbuffer=160 ! '
        'audioconvert ! capsfilter caps="audio/x-raw, format=S16LE, '
        'rate=8000, channels=1" ! opusenc ! opusdec')
    assert sum(len(b.to_bytes()) for b in bufs) > 0


# ---------------------------------------------------------------------------
# vp8 / vp9
# ---------------------------------------------------------------------------

def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("codec", ["vp8", "vp9"])
def test_vpx_element_loopback_psnr(codec):
    raw = run_pipeline(
        'videotestsrc num-buffers=5 ! capsfilter caps="video/x-raw, '
        'format=I420, width=320, height=240"')
    dec = run_pipeline(
        'videotestsrc num-buffers=5 ! capsfilter caps="video/x-raw, '
        f'format=I420, width=320, height=240" ! {codec}enc deadline=1 '
        f'cpu-used=8 target-bitrate=2000000 ! {codec}dec')
    assert len(dec) == len(raw) == 5
    for r, d in zip(raw, dec):
        p = _psnr(np.frombuffer(r.to_bytes(), np.uint8),
                  np.frombuffer(d.to_bytes(), np.uint8))
        assert p > 30, p


@pytest.mark.parametrize("codec", ["vp8", "vp9"])
def test_vpx_rtp_pay_depay_loopback(codec):
    dec = run_pipeline(
        'videotestsrc num-buffers=5 ! capsfilter caps="video/x-raw, '
        f'format=I420, width=320, height=240" ! {codec}enc deadline=1 '
        f'cpu-used=8 ! rtp{codec}pay2 ! rtp{codec}depay2 ! {codec}dec')
    assert len(dec) == 5
    assert len(dec[0].to_bytes()) == 320 * 240 * 3 // 2


def test_vp8enc_keyframe_flags():
    from gstpu.core.buffer import BufferFlags
    bufs = run_pipeline(
        'videotestsrc num-buffers=8 ! capsfilter caps="video/x-raw, '
        'format=I420, width=64, height=64" ! vp8enc deadline=1 '
        'cpu-used=8 keyframe-max-dist=4')
    keys = [not b.has_flag(BufferFlags.DELTA_UNIT) for b in bufs]
    assert keys[0] is True
    assert any(keys[1:])          # forced keyframe within the gop


def test_vp8enc_reconfigure_bitrate():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    h = Harness(make("vp8enc", deadline=1, cpu_used=8))
    h.set_caps("video/x-raw, format=I420, width=64, "
                       "height=64, framerate=30/1")
    frame = np.full(64 * 64 * 3 // 2, 128, np.uint8).tobytes()
    h.push(gstpu.Buffer(frame, pts=0))
    enc = h.element
    enc.reconfigure_bitrate(100_000)
    assert enc.target_bitrate == 100_000
    h.push(gstpu.Buffer(frame, pts=SECOND // 30))
    h.push(gstpu.Buffer(frame, pts=2 * SECOND // 30))
    assert len(h.pull_all()) >= 2


# ---------------------------------------------------------------------------
# webrtcsink integration: the canonical codecs negotiate end to end
# ---------------------------------------------------------------------------

def test_webrtcsink_opus_audio_session():
    """A raw-audio webrtcsink stream encodes as OPUS (preferred codec)
    and the consumer session carries opus RTP (pt from the payloader).
    Mirrors the reference's webrtcsink audio flow (imp.rs codec
    registry: OPUS is the canonical audio codec)."""
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("webrtcsink")
    sink.set_state(State.PLAYING)
    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, gstpu.Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-raw, format=F32LE, rate=48000, channels=2, "
        "layout=interleaved")))
    feeder.push_event(SegmentEvent(Segment()))

    rtp = []
    sink.signalling_connect({"peerId": "p0"})
    sink.handle_signalling({"type": "startSession",
                            "sessionId": "s0", "peerId": "c0"})
    spad = sink._sessions["s0"]
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, gstpu.Caps.any()))
    cap.chain_function = lambda p, b: (rtp.append(b)
                                       or gstpu.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    spad.link(cap)

    chain = sink._encoders[pad.name]
    assert chain.encoding == "OPUS"
    sig = _sine(960)
    for i in range(8):
        feeder.push(gstpu.Buffer(sig.tobytes(),
                                 pts=i * 20_000_000))
    assert rtp, "no RTP packets produced for the opus stream"
    # RTP version bits + nonzero payload
    first = rtp[0].to_bytes()
    assert first[0] >> 6 == 2 and len(first) > 12
    sink.set_state(State.NULL)
