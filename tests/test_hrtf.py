"""hrtfrender / sofalizer tests (reference audio/hrtf/tests/
hrtfrender.rs patterns: harness-driven, samples-in == samples-out
accounting, convolution correctness vs scipy golden)."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.audio import AudioInfo
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.elements.audio.hrtf import (HrirSphere, _sph_to_vec, load_sofa,
                                       write_sofa)
from gstpu.ops.fftconv import direct_conv_reference

RATE = 44100
IR_LEN = 32


def octahedron_sphere(rate=RATE, ir_len=IR_LEN):
    """6-vertex octahedron; each vertex gets a distinct delayed
    impulse as its IR so tests can identify which IR was used."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    faces = []
    for x in (0, 1):
        for y in (2, 3):
            for z in (4, 5):
                faces.append([x, y, z])
    indices = np.asarray(faces, np.uint32).reshape(-1)
    left = np.zeros((6, ir_len), np.float32)
    right = np.zeros((6, ir_len), np.float32)
    for v in range(6):
        left[v, v] = 1.0          # delta at delay v
        right[v, v + 6] = 0.5     # delta at delay v+6, half amplitude
    return verts, indices, left, right, rate


@pytest.fixture
def sphere_bytes():
    return HrirSphere.to_bytes(*octahedron_sphere())


def test_sphere_roundtrip(sphere_bytes):
    s = HrirSphere.from_bytes(sphere_bytes)
    assert s.rate == RATE
    assert s.ir_len == IR_LEN
    assert s.vertices.shape == (6, 3)
    # sampling exactly at vertex +z returns its IR
    ir = s.sample(np.array([0.0, 0.0, 1.0]))
    assert ir[0, 4] == pytest.approx(1.0)
    assert ir[1, 10] == pytest.approx(0.5)


def test_sphere_barycentric_blend(sphere_bytes):
    s = HrirSphere.from_bytes(sphere_bytes)
    # midway between +x and +z: blend of vertex 0 and vertex 4
    ir = s.sample(np.array([1.0, 0.0, 1.0]))
    assert ir[0, 0] > 0 and ir[0, 4] > 0
    assert ir[0].sum() == pytest.approx(1.0, abs=1e-5)


def test_hrtfrender_convolution_golden(sphere_bytes):
    el = make("hrtfrender", hrir_raw=sphere_bytes,
              interpolation_steps=1, block_length=128)
    el.set_property("spatial_objects",
                    [{"x": 0.0, "y": 0.0, "z": 1.0, "distance-gain": 1.0}])
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=1, "
               "layout=interleaved")
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (512, 1)).astype(np.float32)
    for off in range(0, 512, 128):
        h.push(Buffer(x[off:off + 128],
                      pts=off * 1_000_000_000 // RATE))
    out = np.concatenate([b.array.reshape(-1, 2) for b in h.pull_all()])
    assert out.shape == (512, 2)
    sph = HrirSphere.from_bytes(sphere_bytes)
    ir = sph.sample([0.0, 0.0, 1.0])
    want_l = direct_conv_reference(x[:, 0], ir[0])
    want_r = direct_conv_reference(x[:, 0], ir[1])
    np.testing.assert_allclose(out[:, 0], want_l, atol=2e-5)
    np.testing.assert_allclose(out[:, 1], want_r, atol=2e-5)
    h.teardown()


def test_hrtfrender_sample_accounting(sphere_bytes):
    """samples in == samples out including EOS drain (reference
    hrtfrender.rs asserts this)."""
    el = make("hrtfrender", hrir_raw=sphere_bytes, block_length=512)
    el.set_property("spatial_objects",
                    [{"x": 1.0, "y": 0.0, "z": 0.0},
                     {"x": -1.0, "y": 0.0, "z": 0.0}])
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=2, "
               "layout=interleaved")
    total = 0
    rng = np.random.default_rng(5)
    for i in range(7):
        n = [400, 512, 700, 100, 512, 333, 43][i]
        h.push(Buffer(rng.uniform(-1, 1, (n, 2)).astype(np.float32)))
        total += n
    h.push_eos()
    out = sum(b.array.reshape(-1, 2).shape[0] for b in h.pull_all())
    assert out == total
    h.teardown()


def test_hrtfrender_multichannel_sum(sphere_bytes):
    el = make("hrtfrender", hrir_raw=sphere_bytes,
              interpolation_steps=1, block_length=64)
    el.set_property("spatial_objects",
                    [{"x": 0.0, "y": 0.0, "z": 1.0},
                     {"x": 0.0, "y": 0.0, "z": 1.0}])
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=2, "
               "layout=interleaved")
    x = np.zeros((64, 2), np.float32)
    x[0] = 1.0  # impulse in both channels, same position
    h.push(Buffer(x))
    out = h.pull().array.reshape(-1, 2)
    # two coincident sources sum: left IR delta at 4 with amp 2
    assert out[4, 0] == pytest.approx(2.0, abs=1e-5)
    h.teardown()


def test_hrtfrender_latency(sphere_bytes):
    el = make("hrtfrender", hrir_raw=sphere_bytes, block_length=512)
    el.set_property("spatial_objects", [{"z": 1.0}])
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=1, "
               "layout=interleaved")
    q = h.query_latency()
    assert q.min_latency == 512 * 1_000_000_000 // RATE
    h.teardown()


# -- sofalizer --------------------------------------------------------

@pytest.fixture
def sofa_file(tmp_path):
    # 4 measurement positions on the horizontal plane
    positions = np.array([[0, 0, 1], [90, 0, 1], [180, 0, 1],
                          [270, 0, 1]], np.float64)
    irs = np.zeros((4, 2, 16))
    for m in range(4):
        irs[m, 0, m] = 1.0      # left: delta at delay m
        irs[m, 1, m + 4] = 0.5  # right
    path = str(tmp_path / "test.sofa")
    write_sofa(path, positions, irs, RATE)
    return path


def test_sofa_roundtrip(sofa_file):
    pos, irs, rate = load_sofa(sofa_file)
    assert pos.shape == (4, 3)
    assert irs.shape == (4, 2, 16)
    assert rate == RATE


def test_sofalizer_stereo(sofa_file):
    el = make("sofalizer", sofa_location=sofa_file, block_length=64)
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=2, "
               "layout=interleaved")
    x = np.zeros((64, 2), np.float32)
    x[0, 0] = 1.0  # impulse in left channel (speaker at +30 deg)
    h.push(Buffer(x))
    out = h.pull().array.reshape(-1, 2)
    # nearest measurement to azimuth +30 is 0 deg (m=0): delta at 0
    assert out[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert out[4, 1] == pytest.approx(0.5, abs=1e-5)
    h.teardown()


def test_upc_kernel_matches_direct_conv():
    """upc_block renders the exact linear convolution, streamed at
    either block or partition granularity (reference sofa/imp.rs
    uniformly partitioned convolution, partition-length 64)."""
    import jax.numpy as jnp
    from gstpu.ops.fftconv import upc_block, upc_init, upc_ir_rfft
    rng = np.random.default_rng(7)
    C, L, P, S, NB = 3, 200, 64, 256, 4
    ir = rng.standard_normal((C, 2, L)).astype(np.float32)
    x = rng.standard_normal((C, 1, S * NB)).astype(np.float32)
    h_f = upc_ir_rfft(jnp.asarray(ir), part_len=P)
    state = upc_init((C, 1), L, P)
    outs = []
    for b in range(NB):
        state, y = upc_block(state, jnp.asarray(x[..., b * S:(b + 1) * S]),
                             h_f, part_len=P)
        outs.append(np.asarray(y))
    y_blk = np.concatenate(outs, -1)
    gold = np.stack([[np.convolve(x[c, 0], ir[c, e])[:S * NB]
                      for e in range(2)] for c in range(C)])
    assert np.abs(y_blk - gold).max() < 1e-4
    # partition-granularity streaming is bit-identical: each P-sample
    # output depends only on input up to its own end
    state = upc_init((C, 1), L, P)
    outs = []
    for b in range(S * NB // P):
        state, y = upc_block(state, jnp.asarray(x[..., b * P:(b + 1) * P]),
                             h_f, part_len=P)
        outs.append(np.asarray(y))
    assert np.array_equal(np.concatenate(outs, -1), y_blk)


@pytest.fixture
def dense_sofa_file(tmp_path):
    """4 positions with dense random IRs spanning 3 partitions."""
    rng = np.random.default_rng(11)
    positions = np.array([[0, 0, 1], [90, 0, 1], [180, 0, 1],
                          [270, 0, 1]], np.float64)
    irs = rng.standard_normal((4, 2, 150)) * 0.1
    path = str(tmp_path / "dense.sofa")
    write_sofa(path, positions, irs, RATE)
    return path


def test_sofalizer_upc_golden(dense_sofa_file):
    """Element output == scipy/np golden convolution with the
    selected IRs, summed over virtual speakers."""
    el = make("sofalizer", sofa_location=dense_sofa_file,
              block_length=256, partition_length=64)
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=2, "
               "layout=interleaved")
    rng = np.random.default_rng(13)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    h.push(Buffer(x))
    out = np.concatenate([h.pull().array.reshape(-1, 2)
                          for _ in range(2)])
    _, irs, _ = load_sofa(dense_sofa_file)
    sel = el._select_irs(2)
    gold = np.zeros((512, 2))
    for c in range(2):
        for e in range(2):
            gold[:, e] += np.convolve(x[:, c], irs[sel[c], e])[:512]
    assert np.abs(out - gold).max() < 1e-4
    h.teardown()


def test_sofalizer_partition_granularity(dense_sofa_file):
    """block-length 256 and 64 (== partition) give identical output:
    the convolution's algorithmic granularity is the partition, not
    the block (reference imp.rs:37-44)."""
    outs = {}
    rng = np.random.default_rng(17)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    for blk in (256, 64):
        el = make("sofalizer", sofa_location=dense_sofa_file,
                  block_length=blk, partition_length=64)
        h = Harness(el)
        h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, "
                   "channels=2, layout=interleaved")
        h.push(Buffer(x))
        outs[blk] = np.concatenate(
            [h.pull().array.reshape(-1, 2) for _ in range(512 // blk)])
        h.teardown()
    assert np.array_equal(outs[256], outs[64])


def test_sofalizer_partition_validation(sofa_file):
    """block % partition != 0 is rejected (reference imp.rs:779-783)."""
    from gstpu.core.caps import parse_caps
    el = make("sofalizer", sofa_location=sofa_file, block_length=100,
              partition_length=64)
    assert el.start()
    caps = parse_caps(f"audio/x-raw, format=F32LE, rate={RATE}, "
                      "channels=2, layout=interleaved")
    assert el.set_caps(caps, None) is False


def test_sofalizer_rotation_switches_filter(sofa_file):
    el = make("sofalizer", sofa_location=sofa_file, block_length=64)
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, channels=1, "
               "layout=interleaved")
    x = np.zeros((64, 1), np.float32)
    x[0] = 1.0
    h.push(Buffer(x))
    out1 = h.pull().array.reshape(-1, 2)
    assert out1[0, 0] == pytest.approx(1.0, abs=1e-5)  # m=0 at 0 deg
    # rotate listener: front speaker now nearest to the 90 deg entry;
    # the crossfaded block blends old/new — push two blocks, check the
    # second is fully switched (delta at delay 1)
    el.set_property("rotation_yaw", -90.0)
    h.push(Buffer(x))
    h.push(Buffer(x))
    h.pull()              # crossfade block
    out3 = h.pull().array.reshape(-1, 2)
    assert out3[1, 0] == pytest.approx(1.0, abs=1e-4)
    h.teardown()
