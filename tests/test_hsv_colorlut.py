"""hsvfilter/hsvdetector/colorlut: pixel-exact tests vs per-pixel numpy
goldens mirroring the reference Rust math (video/hsv/src/hsvutils.rs,
video/colorlut/src/colorlut/imp.rs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gstpu import State, parse_launch
from gstpu.core.buffer import Buffer
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.core.video import VideoInfo
from gstpu.ops.hsv import hsv_detect, hsv_filter, hsv_to_rgb, rgb_to_hsv
from gstpu.ops.lut import (CubeLut, apply_lut_1d, apply_lut_3d,
                           identity_lut, parse_cube)

EPS = 1e-5


# -- per-pixel goldens (literal transcription of hsvutils.rs) ----------

def golden_from_rgb(p):
    r, g, b = (np.float32(p[0]) / np.float32(255.0),
               np.float32(p[1]) / np.float32(255.0),
               np.float32(p[2]) / np.float32(255.0))
    value = np.float32(max(p)) / np.float32(255.0)
    chroma = value - np.float32(min(p)) / np.float32(255.0)
    if chroma == 0.0:
        hue = np.float32(0.0)
    elif abs(value - r) < EPS:
        hue = np.float32(60.0) * ((g - b) / chroma)
    elif abs(value - g) < EPS:
        hue = np.float32(60.0) * (np.float32(2.0) + (b - r) / chroma)
    elif abs(value - b) < EPS:
        hue = np.float32(60.0) * (np.float32(4.0) + (r - g) / chroma)
    else:
        hue = np.float32(0.0)
    if hue < 0.0:
        hue += np.float32(360.0)
    sat = np.float32(0.0) if value == 0.0 else chroma / value
    return (np.float32(np.fmod(hue, np.float32(360.0))),
            min(max(sat, 0.0), 1.0), min(max(value, 0.0), 1.0))


def golden_to_rgb(h, s, v):
    h, s, v = np.float32(h), np.float32(s), np.float32(v)
    c = v * s
    hp = h / np.float32(60.0)
    x = c * (np.float32(1.0) - abs(np.fmod(hp, np.float32(2.0))
                                   - np.float32(1.0)))
    if hp < 0.0:
        rgbp = (0.0, 0.0, 0.0)
    elif hp <= 1.0:
        rgbp = (c, x, 0.0)
    elif hp <= 2.0:
        rgbp = (x, c, 0.0)
    elif hp <= 3.0:
        rgbp = (0.0, c, x)
    elif hp <= 4.0:
        rgbp = (0.0, x, c)
    elif hp <= 5.0:
        rgbp = (x, 0.0, c)
    elif hp <= 6.0:
        rgbp = (c, 0.0, x)
    else:
        rgbp = (0.0, 0.0, 0.0)
    m = v - c
    return tuple(int(min(max((np.float32(ch) + m) * np.float32(255.0),
                             np.float32(0.0)), np.float32(255.0)))
                 for ch in rgbp)


def test_roundtrip_vs_golden():
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (500, 3), dtype=np.uint8)
    h, s, v = rgb_to_hsv(jnp.asarray(pix))
    h, s, v = np.asarray(h), np.asarray(s), np.asarray(v)
    for i, p in enumerate(pix):
        gh, gs, gv = golden_from_rgb(p)
        assert abs(h[i] - gh) < 1e-3, (i, p, h[i], gh)
        assert abs(s[i] - gs) < 1e-6
        assert abs(v[i] - gv) < 1e-6
    back = np.asarray(hsv_to_rgb(jnp.asarray(h), jnp.asarray(s),
                                 jnp.asarray(v)))
    for i in range(len(pix)):
        gr = golden_to_rgb(h[i], s[i], v[i])
        assert tuple(back[i]) == gr, (i, tuple(pix[i]), tuple(back[i]), gr)


def test_hsv_filter_identity():
    rng = np.random.default_rng(12)
    pix = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out = np.asarray(hsv_filter(jnp.asarray(pix), jnp.float32(0),
                                jnp.float32(1), jnp.float32(0),
                                jnp.float32(1), jnp.float32(0)))
    # identity through HSV roundtrip: off-by-one from float/u8 quant
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= 1


def test_hsv_filter_value_zero_black():
    pix = np.full((8, 8, 3), 200, np.uint8)
    out = np.asarray(hsv_filter(jnp.asarray(pix), jnp.float32(0),
                                jnp.float32(1), jnp.float32(0),
                                jnp.float32(0), jnp.float32(0)))
    assert out.max() == 0


def test_hsv_filter_hue_shift_red_to_green():
    pix = np.zeros((4, 4, 3), np.uint8)
    pix[..., 0] = 255  # pure red, hue 0
    out = np.asarray(hsv_filter(jnp.asarray(pix), jnp.float32(120.0),
                                jnp.float32(1), jnp.float32(0),
                                jnp.float32(1), jnp.float32(0)))
    assert (out[..., 1] == 255).all() and (out[..., 0] == 0).all()


def test_hsv_detect():
    pix = np.zeros((2, 2, 3), np.uint8)
    pix[0, 0] = (255, 0, 0)    # red: h=0 s=1 v=1
    pix[0, 1] = (0, 255, 0)    # green: h=120
    alpha = np.asarray(hsv_detect(
        jnp.asarray(pix), jnp.float32(0.0), jnp.float32(10.0),
        jnp.float32(1.0), jnp.float32(0.1), jnp.float32(1.0),
        jnp.float32(0.1)))
    assert alpha[0, 0] == 255   # red matches hue_ref=0
    assert alpha[0, 1] == 0     # green does not
    assert alpha[1, 1] == 0     # black fails sat/value window


def test_hsvfilter_element_pipeline():
    p = parse_launch("videotestsrc num-buffers=2 pattern=gradient ! "
                     "video/x-raw, format=RGBA, width=64, height=32 ! "
                     "hsvfilter hue-shift=90 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 2
    vi = VideoInfo.from_caps(sink.caps)
    frame = vi.view(bufs[0])
    assert frame.shape == (32, 64, 4)
    assert (frame[..., 3] == 255).all()  # alpha untouched
    p.set_state(State.NULL)


def test_hsvdetector_element_converts_format():
    p = parse_launch("videotestsrc num-buffers=1 pattern=red ! "
                     "video/x-raw, format=RGB, width=16, height=16 ! "
                     "hsvdetector hue-ref=0 hue-var=10 saturation-ref=1 "
                     "value-ref=1 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    vi = VideoInfo.from_caps(sink.caps)
    assert vi.format in ("RGBA", "BGRA", "ARGB", "ABGR")
    frame = vi.view(sink.pull_all()[0])
    # all-red frame matches -> alpha all 255
    assert (frame[..., 3] == 255).all()
    p.set_state(State.NULL)


# -- colorlut ---------------------------------------------------------

CUBE_3D = """# test cube
TITLE "invert"
LUT_3D_SIZE 2
1.0 1.0 1.0
0.0 1.0 1.0
1.0 0.0 1.0
0.0 0.0 1.0
1.0 1.0 0.0
0.0 1.0 0.0
1.0 0.0 0.0
0.0 0.0 0.0
"""

CUBE_1D = """LUT_1D_SIZE 3
0.0 0.0 0.0
0.25 0.5 0.75
1.0 1.0 1.0
"""


def test_parse_cube_3d_invert():
    lut = parse_cube(CUBE_3D)
    assert lut.is_3d and lut.size == 2
    pix = np.array([[[255, 0, 128, 7]]], np.uint8)
    out = np.asarray(apply_lut_3d(jnp.asarray(pix),
                                  jnp.asarray(lut.table_3d),
                                  jnp.asarray(lut.domain_scale),
                                  jnp.asarray(lut.domain_offset)))
    assert tuple(out[0, 0]) == (0, 255, 127, 7)  # inverted, alpha kept


def test_parse_cube_1d():
    lut = parse_cube(CUBE_1D)
    assert not lut.is_3d and lut.size == 3
    pix = np.array([[[128, 128, 128, 9]]], np.uint8)
    out = np.asarray(apply_lut_1d(jnp.asarray(pix),
                                  jnp.asarray(lut.table_1d),
                                  jnp.asarray(lut.domain_scale),
                                  jnp.asarray(lut.domain_offset)))
    # t = 128/255*2 = 1.0039 -> between entries 1 and 2
    r, g, b, a = out[0, 0]
    assert a == 9
    assert abs(int(r) - round((0.25 + (1 - 0.25) * 0.0039) * 255)) <= 1
    assert abs(int(g) - round((0.5 + 0.5 * 0.0039) * 255)) <= 1


def test_identity_lut_passthrough():
    lut = identity_lut(size=5)
    rng = np.random.default_rng(4)
    pix = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    out = np.asarray(apply_lut_3d(jnp.asarray(pix),
                                  jnp.asarray(lut.table_3d),
                                  jnp.asarray(lut.domain_scale),
                                  jnp.asarray(lut.domain_offset)))
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= 1


def test_colorlut_element(tmp_path):
    f = tmp_path / "invert.cube"
    f.write_text(CUBE_3D)
    p = parse_launch(f"videotestsrc num-buffers=1 pattern=white ! "
                     f"video/x-raw, format=RGBA, width=8, height=8 ! "
                     f"colorlut location={f} ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    vi = VideoInfo.from_caps(sink.caps)
    frame = vi.view(sink.pull_all()[0])
    assert (frame[..., :3] == 0).all()      # white inverted to black
    assert (frame[..., 3] == 255).all()
    p.set_state(State.NULL)


def test_colorlut_missing_location_fails():
    el = make("colorlut")
    from gstpu.core.element import StateChangeReturn
    assert el.set_state(State.READY) is StateChangeReturn.FAILURE


def test_pallas_hsv_kernel_matches_jnp():
    """The Pallas tile kernels (interpret mode on CPU) must be
    bit-identical to the jnp reference path."""
    import jax.numpy as jnp
    from gstpu.ops.hsv_pallas import hsv_filter_frame_pallas
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    args = (40.0, 1.2, -0.1, 0.9, 0.05)
    ref = np.asarray(hsv_filter(jnp.asarray(rgb),
                                *[jnp.float32(a) for a in args]))
    got = np.asarray(hsv_filter_frame_pallas(rgb, *args, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_colorlut_rgba64(tmp_path):
    """16-bit path (reference imp.rs supports RGBA64): invert LUT on
    deep-color pixels, both endiannesses, alpha untouched."""
    from gstpu.core.harness import Harness
    f = tmp_path / "invert.cube"
    f.write_text(CUBE_3D)
    for fmt, dt in (("RGBA64LE", "<u2"), ("RGBA64BE", ">u2")):
        h = Harness(make("colorlut", location=str(f)))
        h.set_caps(f"video/x-raw, format={fmt}, width=4, height=2, "
                   f"framerate=30/1")
        pix = np.zeros((2, 4, 4), dtype=dt)
        pix[..., 0] = 65535   # R max
        pix[..., 1] = 0
        pix[..., 2] = 32768
        pix[..., 3] = 1234    # alpha passthrough
        vi = VideoInfo(fmt, 4, 2)
        h.push(vi.make_buffer(pix))
        out = vi.view(h.pull())
        assert out.dtype == np.dtype(dt)
        assert (out[..., 0] == 0).all()
        assert (out[..., 1] == 65535).all()
        assert abs(int(out[0, 0, 2]) - (65535 - 32768)) <= 1
        assert (out[..., 3] == 1234).all()
        h.teardown()


def test_lut3d_mm_matches_gather_path():
    """The MXU reformulation agrees with the exact gather path to
    <=1 u8 LSB (bf16 hat weights)."""
    from gstpu.ops.lut import apply_lut_3d_mm, parse_cube
    lut = parse_cube(CUBE_3D)
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (64, 128, 4), dtype=np.uint8)
    a = np.asarray(apply_lut_3d(jnp.asarray(pix),
                                jnp.asarray(lut.table_3d),
                                jnp.asarray(lut.domain_scale),
                                jnp.asarray(lut.domain_offset)))
    b = np.asarray(apply_lut_3d_mm(jnp.asarray(pix),
                                   jnp.asarray(lut.table_3d),
                                   jnp.asarray(lut.domain_scale),
                                   jnp.asarray(lut.domain_offset),
                                   n_chunks=8))
    err = np.abs(a[..., :3].astype(int) - b[..., :3].astype(int))
    assert err.max() <= 1
    assert (a[..., 3] == b[..., 3]).all()


def test_lut3d_mm_precise_matches_gather_path_16bit():
    """ADVICE r1: 16-bit frames must use the f32 (precise) MXU
    contraction — parity vs the exact gather path within 1 u16 LSB."""
    from gstpu.ops.lut import apply_lut_3d_mm, parse_cube
    lut = parse_cube(CUBE_3D)
    rng = np.random.default_rng(12)
    pix = rng.integers(0, 65536, (32, 64, 4), dtype=np.uint16)
    a = np.asarray(apply_lut_3d(jnp.asarray(pix),
                                jnp.asarray(lut.table_3d),
                                jnp.asarray(lut.domain_scale),
                                jnp.asarray(lut.domain_offset),
                                max_val=65535))
    b = np.asarray(apply_lut_3d_mm(jnp.asarray(pix),
                                   jnp.asarray(lut.table_3d),
                                   jnp.asarray(lut.domain_scale),
                                   jnp.asarray(lut.domain_offset),
                                   max_val=65535, n_chunks=8,
                                   precise=True))
    err = np.abs(a[..., :3].astype(int) - b[..., :3].astype(int))
    assert err.max() <= 1
    assert (a[..., 3] == b[..., 3]).all()


def test_lut3d_pallas_kernel_matches_gather_path():
    """The Pallas VMEM LUT kernel (60fps/4K path) agrees with the
    exact gather path to <=1 u8 LSB (interpret mode on CPU; the same
    kernel runs compiled on TPU — see bench_video.py)."""
    from gstpu.ops.lut_pallas import apply_lut_3d_pallas
    from gstpu.ops.lut import parse_cube
    lut = parse_cube(CUBE_3D)
    rng = np.random.default_rng(21)
    pix = rng.integers(0, 256, (16, 128, 4), dtype=np.uint8)
    a = np.asarray(apply_lut_3d(jnp.asarray(pix),
                                jnp.asarray(lut.table_3d),
                                jnp.asarray(lut.domain_scale),
                                jnp.asarray(lut.domain_offset)))
    b = np.asarray(apply_lut_3d_pallas(jnp.asarray(pix),
                                       jnp.asarray(lut.table_3d),
                                       jnp.asarray(lut.domain_scale),
                                       jnp.asarray(lut.domain_offset),
                                       interpret=True))
    err = np.abs(a[..., :3].astype(int) - b[..., :3].astype(int))
    assert err.max() <= 1
    assert (a[..., 3] == b[..., 3]).all()
