"""rav1enc device-transform=true: the restricted device-intra profile.

The TPU performs mode decision, 8x8 DCT, quantization and
reconstruction of every block in ONE jitted dispatch
(gstpu/ops/av1_intra.py make_intra_transform); the host engine
(libaom lossless=1) is purely the entropy/bitstream layer.  The
headline property tested here: the emitted AV1 bits decode under
libdav1d to EXACTLY the device transform+quant output — every lossy
decision in the stream was made on the device.  This is SURVEY §2.8
P4 (the ffv1enc split) applied to AV1; reference anchor
video/rav1e/src/rav1enc/imp.rs:757-788."""

import numpy as np
import pytest

import gstpu
from gstpu import State, parse_launch
from gstpu.core.video import VideoInfo

gstpu.init()


def _have_lossless_aom() -> bool:
    from gstpu.native_codec import NativeEncoder
    try:
        e = NativeEncoder("libaom-av1", 64, 64, (30, 1),
                          {"crf": 0, "b": 0, "g": 1, "threads": 1,
                           "aom-params": "lossless=1"})
        e.close()
        return True
    except RuntimeError:
        return False


needs_aom = pytest.mark.skipif(not _have_lossless_aom(),
                               reason="no libaom lossless")


def _content(W, H, n):
    """Compressible moving frames: gradient + drifting box."""
    rng = np.random.default_rng(7)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    base = (50 + 140 * gx / W + 40 * gy / H
            + 5 * rng.standard_normal((H, W))).astype(np.uint8)
    frames = []
    for i in range(n):
        y = np.roll(base, 2 * i, axis=1).copy()
        x0 = (6 * i) % max(1, W - 32)
        y[H // 4:H // 2, x0:x0 + 32] = 220
        u = ((gx[:H // 2, :W // 2] // 4 + i) % 200 + 20).astype(
            np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def _encode(frames, W, H, extra=""):
    vi = VideoInfo("I420", W, H)
    p = parse_launch(
        f'appsrc name=src caps="video/x-raw, format=I420, width={W}, '
        f'height={H}, framerate=30/1" ! '
        f'rav1enc device-transform=true {extra} ! appsink name=sink')
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    for i, (y, u, v) in enumerate(frames):
        src.push_buffer(vi.make_buffer(
            np.concatenate([y.ravel(), u.ravel(), v.ravel()]),
            pts=i * 33_333_333))
        while p.iterate():
            pass
    src.end_of_stream()
    p.run()
    pkts = [b.to_bytes() for b in sink.pull_all()]
    p.set_state(State.NULL)
    return pkts


def _decode(pkts):
    from gstpu.native_codec import NativeDecoder
    dec = NativeDecoder("libdav1d")
    got = []
    for i, q in enumerate(pkts):
        got += dec.send(q, i)
    got += dec.finish()
    dec.close()
    return [np.frombuffer(f[0], np.uint8) for f in got]


@needs_aom
def test_bits_decode_to_exact_device_reconstruction():
    """The flagship property: libdav1d's decode of the emitted AV1
    stream equals, byte for byte, the device transform pass's
    reconstruction — the engine added no lossy decision of its own."""
    from gstpu.ops.av1_intra import make_intra_transform
    W, H = 192, 128
    frames = _content(W, H, 6)
    pkts = _encode(frames, W, H, extra="quantizer=100")
    assert len(pkts) >= 6
    decoded = _decode(pkts)
    assert len(decoded) == 6

    xform = make_intra_transform(H, W)
    qstep = 0.125 * 2.0 ** (min(63, 100 // 4) / 6.0)
    for i, (y, u, v) in enumerate(frames):
        ry, ru, rv, _ = xform(y, u, v, np.float32(qstep))
        want = np.concatenate([np.asarray(ry).ravel(),
                               np.asarray(ru).ravel(),
                               np.asarray(rv).ravel()])
        assert np.array_equal(decoded[i], want), f"frame {i}"


@needs_aom
def test_non_multiple_of_8_geometry():
    """Plane dims that aren't /8 ride the in-graph edge-pad + crop
    path (Y 100x60 pads to 104x64; chroma 50x30 to 56x32)."""
    W, H = 100, 60
    frames = _content(W, H, 3)
    pkts = _encode(frames, W, H, extra="quantizer=60")
    decoded = _decode(pkts)
    assert len(decoded) == 3
    assert decoded[0].size == W * H * 3 // 2


@needs_aom
def test_transform_is_lossy_but_faithful():
    """The device quantizer actually bites (stream is not a lossless
    copy of the source) yet reconstruction stays faithful at a fine
    qstep (PSNR-Y > 34 dB)."""
    W, H = 192, 128
    frames = _content(W, H, 3)
    decoded = _decode(_encode(frames, W, H, extra="quantizer=100"))
    y_src = frames[0][0].astype(np.float64)
    y_dec = decoded[0][:W * H].reshape(H, W).astype(np.float64)
    assert not np.array_equal(y_src, y_dec)
    mse = np.mean((y_src - y_dec) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 34.0, psnr


@needs_aom
def test_qstep_rate_control_converges():
    """bitrate > 0: observed output bits steer the device qstep.
    Steady-state (second half) lands within 30% of target — tighter
    than the rc-mode=device band because the loop observes every
    frame, not every rc-interval."""
    W, H = 192, 128
    target = 600_000
    frames = _content(W, H, 48)
    pkts = _encode(frames, W, H, extra=f"bitrate={target}")
    assert len(pkts) == 48
    half = pkts[len(pkts) // 2:]
    bps = sum(len(d) for d in half) * 8 / (len(half) / 30.0)
    assert target * 0.70 < bps < target * 1.30, bps
    assert len(_decode(pkts)) == 48


def test_qstep_rc_model():
    """QstepRateControl: multiplicative correction walks qstep toward
    the target under a bits ~ c/qstep plant and stays clamped."""
    from gstpu.ops.av1_intra import QstepRateControl
    rc = QstepRateControl(target_bps=300_000, fps=30.0)
    c = 1e6                      # plant: bits = c / qstep
    q = rc.qstep
    for _ in range(40):
        q = rc.observe(c / q)
    assert abs(c / q - 300_000 / 30.0) / (300_000 / 30.0) < 0.02
    rc2 = QstepRateControl(1e12, 30.0)  # absurd target -> qmin clamp
    for _ in range(20):
        rc2.observe(1.0)
    assert rc2.qstep == rc2.qmin
