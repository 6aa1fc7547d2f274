"""ffv1enc: gstpu's own TPU-split FFV1 encoder (the reference's
video/ffv1 crate is decode-only — ffv1dec/imp.rs — so the encoder is
a gstpu extension; SURVEY.md §2.8 P4 codec-internal compute split).

Layers under test, each against an independent oracle:
  1. spec model (gstpu/codecs/ffv1.py) round-trips itself;
  2. model bitstreams decode BIT-EXACTLY under libavcodec's ffv1
     decoder (independent implementation), inter frames included;
  3. the model decoder decodes libavcodec-ENCODED streams;
  4. the fused device pass (gstpu/ops/ffv1_pred.py) matches the
     numpy spec model sample-exactly;
  5. the native C++ range coder (native/gstpu_ffv1.cpp) emits
     byte-identical bitstreams to the model;
  6. the ffv1enc element end-to-end: ffv1enc ! ffv1dec is lossless.
"""

import numpy as np
import pytest

from gstpu.codecs import ffv1
from gstpu.core.buffer import Buffer

W, H = 89, 51          # odd sizes exercise the ceil-chroma borders


def _frames(n, w=W, h=H, seed=5):
    rng = np.random.default_rng(seed)
    cw, ch = -(-w >> 1), -(-h >> 1)
    out = []
    for i in range(n):
        # gradient + noise: exercises both smooth contexts and the
        # residual-fold wraparound
        y = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2 + i)
             % 256).astype(np.uint8)
        y = (y.astype(np.int32)
             + rng.integers(-20, 21, y.shape)).clip(0, 255).astype(np.uint8)
        u = rng.integers(0, 256, (ch, cw), np.uint8)
        v = rng.integers(0, 256, (ch, cw), np.uint8)
        out.append([y, u, v])
    return out


def test_model_roundtrip_gop():
    p = ffv1.Params(W, H)
    enc = ffv1.ModelEncoder(p, gop=3)
    dec = ffv1.ModelDecoder(W, H)
    for i, planes in enumerate(_frames(5)):
        bs, key = enc.encode(planes)
        assert key == (i % 3 == 0)
        got = dec.decode(bs)
        for a, b in zip(planes, got):
            assert np.array_equal(a, b)


def _have_av():
    try:
        from gstpu.native_codec import available
        return available("ffv1", encoder=False)
    except Exception:
        return False


@pytest.mark.skipif(not _have_av(), reason="libavcodec shim unavailable")
def test_model_encoder_conformance_vs_libavcodec():
    from gstpu.native_codec import NativeDecoder
    p = ffv1.Params(W, H)
    enc = ffv1.ModelEncoder(p, gop=4)     # inter frames included
    dec = NativeDecoder("ffv1", width=W, height=H)
    cw, ch = p.chroma_size
    n_checked = 0
    for i, planes in enumerate(_frames(6)):
        bs, _ = enc.encode(planes)
        for data, w_, h_, fmt, _pts in dec.send(bs, pts=i):
            assert (w_, h_, fmt) == (W, H, 0)
            ysz, csz = w_ * h_, cw * ch
            assert np.array_equal(data[:ysz].reshape(h_, w_), planes[0])
            assert np.array_equal(data[ysz:ysz + csz].reshape(ch, cw),
                                  planes[1])
            assert np.array_equal(data[ysz + csz:].reshape(ch, cw),
                                  planes[2])
            n_checked += 1
    assert n_checked == 6


@pytest.mark.skipif(not _have_av(), reason="libavcodec shim unavailable")
def test_model_decoder_decodes_libavcodec_streams():
    from gstpu.native_codec import NativeEncoder, available
    if not available("ffv1"):
        pytest.skip("libavcodec ffv1 encoder unavailable")
    w, h = 64, 48
    # coder=ac: the model implements the range coder; libavcodec's
    # ffv1 default is the Golomb-Rice VLC coder
    enc = NativeEncoder("ffv1", w, h, opts={"coder": "ac"})
    dec = ffv1.ModelDecoder(w, h)
    frames = _frames(3, w, h, seed=9)
    pkts = []
    for i, planes in enumerate(frames):
        i420 = np.concatenate([pl.ravel() for pl in planes])
        pkts += [d for d, *_ in enc.send(i420, i)]
    pkts += [d for d, *_ in enc.finish()]
    assert len(pkts) == len(frames)
    for planes, pkt in zip(frames, pkts):
        got = dec.decode(bytes(pkt))
        for a, b in zip(planes, got):
            assert np.array_equal(a, b)


def test_device_pass_matches_spec_model():
    from gstpu.ops.ffv1_pred import Predictor
    p = ffv1.Params(W, H)
    pred = Predictor(p.quant)
    rng = np.random.default_rng(1)
    for shape in [(H, W), (1, 1), (2, 3), (26, 45)]:
        pl = rng.integers(0, 256, shape, np.uint8)
        c_np, d_np = ffv1.predict_plane(pl, p.quant)
        c_dv, d_dv = pred(pl)
        assert np.array_equal(c_np, c_dv)
        assert np.array_equal(d_np.astype(np.int8), d_dv)
    stack = rng.integers(0, 256, (3, 17, 23), np.uint8)
    cb, db = pred.batched(stack)
    for i in range(3):
        c_np, d_np = ffv1.predict_plane(stack[i], p.quant)
        assert np.array_equal(c_np, cb[i])
        assert np.array_equal(d_np.astype(np.int8), db[i])


def test_gather_fallback_matches_spec_model():
    """A deliberately NON-monotone quant table must route every
    Predictor entry point through the gather fallback (staircase()
    returns None) and still match the numpy spec model exactly
    (ADVICE r4: this path previously shipped without CI coverage)."""
    from gstpu.ops.ffv1_pred import Predictor, staircase
    p = ffv1.Params(W, H)
    quant = [np.array(t, np.int64).copy() for t in p.quant]
    # swap two adjacent distinct values in the d8 ordering of table 0
    order = np.arange(-128, 128) & 0xFF
    quant[0][order[10]], quant[0][order[11]] = \
        int(quant[0][order[11]]) + 1, int(quant[0][order[10]])
    assert staircase(quant[0]) is None
    pred = Predictor(quant)
    assert pred.stair is None
    rng = np.random.default_rng(7)
    pl = rng.integers(0, 256, (H, W), np.uint8)
    c_np, d_np = ffv1.predict_plane(pl, quant)
    c_dv, d_dv = pred(pl)                                # __call__
    assert np.array_equal(c_np, c_dv)
    assert np.array_equal(d_np.astype(np.int8), d_dv)
    diff, lo, hip = (np.asarray(a) for a in pred.dispatch_packed(pl))
    assert np.array_equal(diff, d_np.astype(np.int8))
    hi = np.zeros((H, W), np.uint16)
    for k in range(4):
        col = np.arange(hip.shape[1]) * 4 + k
        keep = col < W
        hi[:, col[keep]] = ((hip[:, keep] >> (2 * k)) & 3).astype(
            np.uint16)
    assert np.array_equal(lo.astype(np.uint16) | (hi << 8), c_np)
    assert np.array_equal(np.asarray(pred.dispatch_diff(pl)),
                          d_np.astype(np.int8))
    planes = _frames(1, W, H, seed=3)[0]
    flat = np.concatenate([q.ravel() for q in planes])
    want = np.concatenate([ffv1.predict_plane(q, quant)[1]
                           .astype(np.int8).ravel() for q in planes])
    got = np.asarray(pred.dispatch_diff_i420(flat, W, H))
    assert np.array_equal(got, want)                     # _i420_gather
    stack = rng.integers(0, 256, (2, 17, 23), np.uint8)
    cb, db = pred.batched(stack)
    for i in range(2):
        c1, d1 = ffv1.predict_plane(stack[i], quant)
        assert np.array_equal(c1, cb[i])
        assert np.array_equal(d1.astype(np.int8), db[i])


def _have_native_coder():
    try:
        from gstpu.native_ffv1 import available
        return available()
    except Exception:
        return False


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_native_coder_byte_identical_to_model():
    p = ffv1.Params(W, H)
    from gstpu.native_ffv1 import NativeFrameCoder
    model = ffv1.ModelEncoder(p, gop=2)
    nat = NativeFrameCoder(p)
    for planes in _frames(4):
        bs_model, key = model.encode(planes)
        fields = [ffv1.predict_plane(pl, p.quant) for pl in planes]
        bs_nat = nat.encode(key, [f[0] for f in fields],
                            [f[1] for f in fields])
        assert bs_nat == bs_model
    nat.close()


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_packed_fields_byte_identical():
    """The 2.25-bytes/px packed device layout (diff, ctx_lo, ctx_hi4)
    must produce byte-identical bitstreams to the unpacked path, odd
    widths (hi4 row padding) included."""
    from gstpu.native_ffv1 import NativeFrameCoder
    from gstpu.ops.ffv1_pred import Predictor
    for w, h in [(W, H), (64, 48)]:
        p = ffv1.Params(w, h)
        pred = Predictor(p.quant)
        a, b = NativeFrameCoder(p), NativeFrameCoder(p)
        for i, planes in enumerate(_frames(3, w, h, seed=7)):
            fields = [ffv1.predict_plane(pl, p.quant) for pl in planes]
            want = a.encode(i == 0, [c for c, _ in fields],
                            [d for _, d in fields])
            packed = [tuple(np.asarray(x) for x in
                            pred.dispatch_packed(pl)) for pl in planes]
            got = b.encode_packed(i == 0, packed)
            assert got == want
        a.close()
        b.close()


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_plane_ctx_byte_identical():
    """The minimal 1-byte/px hop (device residuals + contexts
    re-derived natively from the source plane) must be byte-identical
    to the full-field path — border rules (row 0, col 0 two-rows-up
    tl, tr clamp) and odd widths included."""
    from gstpu.native_ffv1 import NativeFrameCoder
    from gstpu.ops.ffv1_pred import Predictor
    for w, h in [(W, H), (64, 48), (1, 7), (7, 1)]:
        p = ffv1.Params(w, h)
        pred = Predictor(p.quant)
        a, b = NativeFrameCoder(p), NativeFrameCoder(p)
        for i, planes in enumerate(_frames(3, w, h, seed=11)):
            fields = [ffv1.predict_plane(pl, p.quant) for pl in planes]
            want = a.encode(i == 0, [c for c, _ in fields],
                            [d for _, d in fields])
            diffs = [np.asarray(pred.dispatch_diff(pl))
                     for pl in planes]
            got = b.encode_from_plane(i == 0, planes, diffs)
            assert got == want, (w, h, i)
        a.close()
        b.close()


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_diff_only_byte_identical():
    """The zero-upload device hop (fe_encode_from_diff: the host sees
    ONLY the residual field and reconstructs the source inline, as a
    decoder would) must be byte-identical to every other entry point —
    inter frames (persistent context states), border rules and odd
    widths included."""
    from gstpu.native_ffv1 import NativeFrameCoder
    from gstpu.ops.ffv1_pred import Predictor
    for w, h in [(W, H), (64, 48), (1, 7), (7, 1)]:
        p = ffv1.Params(w, h)
        pred = Predictor(p.quant)
        a, b = NativeFrameCoder(p), NativeFrameCoder(p)
        for i, planes in enumerate(_frames(3, w, h, seed=13)):
            fields = [ffv1.predict_plane(pl, p.quant) for pl in planes]
            want = a.encode(i == 0, [c for c, _ in fields],
                            [d for _, d in fields])
            diffs = [np.asarray(pred.dispatch_diff(pl))
                     for pl in planes]
            got = b.encode_from_diff(i == 0, diffs)
            assert got == want, (w, h, i)
        a.close()
        b.close()


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_ffv1enc_device_resident_input_byte_identical():
    """Pushing DEVICE-RESIDENT frames (jax arrays) through the ffv1enc
    element must produce the same bitstream as host frames: the
    element routes them through the zero-upload fe_encode_from_diff
    path, where only 1 B/px ever crosses the device->host link."""
    import jax.numpy as jnp
    from gstpu.core.caps import Caps
    from gstpu.core.registry import make
    from gstpu.core.video import VideoInfo
    w, h = 112, 80
    vi = VideoInfo("I420", w, h)
    incaps = Caps.from_string(
        f"video/x-raw, format=I420, width={w}, height={h}, "
        f"framerate=25/1")
    frames = [np.concatenate([pl.ravel() for pl in planes])
              for planes in _frames(3, w, h, seed=17)]

    def run(payloads):
        enc = make("ffv1enc")
        enc.set_caps(incaps, Caps.new("video/x-ffv1"))
        assert enc._coder is not None
        out = []
        for i, f in enumerate(payloads):
            out += enc.transform(Buffer(f, pts=i))
        out += enc.drain()
        enc.stop()
        return [b.to_bytes() for b in out]

    host = run(frames)
    dev = run([jnp.asarray(f) for f in frames])
    assert dev == host


@pytest.mark.skipif(not _have_native_coder(),
                    reason="native ffv1 coder unavailable")
def test_native_coder_failed_attempt_preserves_states():
    """An undersized-cap attempt must not advance the adaptive context
    states: the retry (and every later frame) must produce the same
    bitstream a clean run would."""
    import ctypes
    from gstpu.native_ffv1 import NativeFrameCoder
    p = ffv1.Params(W, H)
    frames = _frames(3)
    fields = [[ffv1.predict_plane(pl, p.quant) for pl in planes]
              for planes in frames]

    def run(coder, poison_frame=None):
        out = []
        for i, f in enumerate(fields):
            if i == poison_frame:
                # direct low-cap call: must fail with -needed and
                # leave the states untouched
                ctx = np.concatenate(
                    [np.asarray(c, np.uint16).ravel() for c, _ in f])
                diff = np.concatenate(
                    [np.asarray(d, np.int8).ravel() for _, d in f])
                px = np.asarray([np.asarray(c).size for c, _ in f],
                                np.dtype(ctypes.c_long))
                buf = np.empty(8, np.uint8)
                n = coder._L.fe_encode(
                    coder._h, 0, len(f),
                    ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    diff.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                    px.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    8)
                assert n < -8
            out.append(coder.encode(i == 0, [c for c, _ in f],
                                    [d for _, d in f]))
        return out

    clean, poisoned = NativeFrameCoder(p), NativeFrameCoder(p)
    want = run(clean)
    got = run(poisoned, poison_frame=1)  # inter frame: states persist
    assert got == want
    clean.close()
    poisoned.close()


@pytest.mark.skipif(not _have_av(), reason="libavcodec shim unavailable")
def test_ffv1enc_ffv1dec_pipeline_lossless():
    from gstpu import State, parse_launch
    from gstpu.core.video import VideoInfo
    w, h = 112, 80
    vi = VideoInfo("I420", w, h)
    frames = _frames(4, w, h, seed=2)
    p = parse_launch(
        f'appsrc name=src caps="video/x-raw, format=I420, width={w}, '
        f'height={h}, framerate=30/1" ! ffv1enc gop=2 ! ffv1dec ! '
        f'appsink name=sink')
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    for i, planes in enumerate(frames):
        i420 = np.concatenate([pl.ravel() for pl in planes])
        src.push_buffer(vi.make_buffer(i420, pts=i * 33_333_333))
    src.end_of_stream()
    p.run()
    out = sink.pull_all()
    assert len(out) == len(frames)
    for planes, b in zip(frames, out):
        want = np.concatenate([pl.ravel() for pl in planes])
        assert np.array_equal(np.frombuffer(b.to_bytes(), np.uint8), want)
    p.set_state(State.NULL)
