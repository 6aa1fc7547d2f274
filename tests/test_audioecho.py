"""rsaudioecho bit-exactness + behavior tests.

Models the reference element's semantics
(audio/audiofx/src/audioecho/imp.rs) via a per-sample numpy golden
(gstpu.ops.echo.echo_reference) and requires the device kernel to match
bit-exactly — the exactness gate from BASELINE.md.
"""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.audio import AudioInfo
from gstpu.core.harness import Harness
from gstpu.ops.echo import echo_block, echo_reference, make_state

SECOND = 1_000_000_000


def _run_kernel(x, delay, max_delay, intensity, feedback, block=None):
    import jax.numpy as jnp
    tail = make_state((), max_delay)
    block = block or x.shape[0]
    outs = []
    for off in range(0, x.shape[0], block):
        tail, o = echo_block(tail, jnp.asarray(x[off:off + block]),
                             jnp.float64(intensity), jnp.float64(feedback),
                             delay=delay)
        outs.append(np.asarray(o))
    return np.concatenate(outs)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("delay,max_delay,block", [
    (100, 100, 64),     # delay == ring size, small blocks
    (50, 200, 64),      # delay < ring, block > delay (intra-block feedback)
    (500, 500, 1000),   # block spans 2x delay
    (7, 16, 5),         # tiny, awkward sizes
])
def test_kernel_bitexact_vs_reference(dtype, delay, max_delay, block):
    rng = np.random.default_rng(42)
    x = rng.uniform(-1, 1, size=2000).astype(dtype)
    for intensity, feedback in [(0.5, 0.0), (0.4, 0.6), (1.0, 1.0)]:
        got = _run_kernel(x, delay, max_delay, intensity, feedback, block)
        # bit-exact vs the correctly-rounded-FMA golden (XLA contracts
        # mul+add; see gstpu/ops/echo.py)
        golden_fma = echo_reference(x, delay, max_delay, intensity,
                                    feedback, fma=True)
        np.testing.assert_array_equal(got, golden_fma)
        # and within float tolerance of the strict-IEEE Rust semantics
        golden_strict = echo_reference(x, delay, max_delay, intensity,
                                       feedback)
        np.testing.assert_allclose(got, golden_strict, rtol=1e-5
                                   if dtype == np.float32 else 1e-12)


def test_element_pipeline_echo():
    p = parse_launch(
        "audiotestsrc num-buffers=20 samplesperbuffer=1024 wave=ticks "
        "! audio/x-raw, format=F64LE, rate=48000, channels=2 "
        "! rsaudioecho delay=100000000 max-delay=200000000 intensity=0.5 "
        "feedback=0.3 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 20
    info = AudioInfo.from_caps(sink.caps)
    out = np.concatenate([info.view(b) for b in bufs])

    # regenerate the source signal and compare with golden echo
    src = parse_launch("audiotestsrc num-buffers=20 samplesperbuffer=1024 "
                       "wave=ticks ! audio/x-raw, format=F64LE, rate=48000, "
                       "channels=2 ! appsink name=sink")
    s2 = src.get_by_name("sink")
    src.set_state(State.PLAYING)
    src.run()
    x = np.concatenate([info.view(b) for b in s2.pull_all()])
    d = (100000000 * 48000 * 2) // SECOND
    size = (200000000 * 48000 * 2) // SECOND
    golden = echo_reference(x.reshape(-1), d, size, 0.5, 0.3, fma=True)
    np.testing.assert_array_equal(out.reshape(-1), golden)
    p.set_state(State.NULL)
    src.set_state(State.NULL)


def test_element_harness_f32_continuity():
    from gstpu.core.registry import make
    el = make("rsaudioecho", delay=10_000_000,        # 10ms = 480 frames
              max_delay=20_000_000, intensity=0.6)
    h = Harness(el)
    h.set_caps("audio/x-raw, format=F32LE, rate=48000, channels=1, "
               "layout=interleaved")
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, size=(3000, 1)).astype(np.float32)
    for off in range(0, 3000, 1000):
        h.push(Buffer(x[off:off + 1000], pts=off * 1_000_000_000 // 48000))
    out = np.concatenate([b.array.reshape(-1) for b in h.pull_all()])
    d = (10_000_000 * 48000) // SECOND
    size = (20_000_000 * 48000) // SECOND
    golden = echo_reference(x.reshape(-1), d, size, 0.6, 0.0, fma=True)
    np.testing.assert_array_equal(out, golden)
    h.teardown()


def test_delay_clamped_to_max_delay():
    from gstpu.core.registry import make
    h = Harness(make("rsaudioecho", delay=2 * SECOND))  # > max-delay 1s default
    h.set_caps("audio/x-raw, format=F32LE, rate=8000, channels=1, "
               "layout=interleaved")
    x = np.ones((100, 1), np.float32)
    assert h.push(Buffer(x)).is_ok
    h.teardown()


def test_intensity_mutable_playing_delay_not():
    h = Harness("rsaudioecho")
    h.set_caps("audio/x-raw, format=F32LE, rate=8000, channels=1, "
               "layout=interleaved")
    h.element.set_property("intensity", 0.9)  # ok at PLAYING
    with pytest.raises(PermissionError):
        h.element.set_property("delay", 1000)
    h.teardown()
