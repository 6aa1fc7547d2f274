"""The DeviceContext CHAIN execution path (VERDICT r2 item 1): N
parse_launch pipelines of `rsaudioecho ! audioloudnorm ! ebur128level`
share one context; the context fuses the three stage kernels into one
jitted dispatch per 100 ms block round.

Gates:
  * context-chain lane outputs == the same math run directly at B=1
    through gstpu.ops (BITWISE on one backend — batching and chain
    fusion change nothing);
  * context-chain outputs vs the HOST `audioloudnorm` element (the
    sample-exact reference transcription oracle path): <= 1e-9 per
    sample, the tolerance test_loudnorm_device.py established for the
    device core;
  * the fused ebur128level posts `ebur128-level` bus messages with
    sane LUFS values without touching the data path.

First run compiles the f64 prime (~minutes on CPU); the persistent
compile cache in conftest makes later runs start in seconds.
"""

from __future__ import annotations

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.runtime.device_batch import DeviceContext

FRAME = 19_200
GATING = 64          # small device gating history for test speed
N_INNER = 4


@pytest.fixture
def chain_signals():
    rng = np.random.default_rng(7)
    n_frames = 30 + N_INNER
    return [0.2 * rng.standard_normal((n_frames, FRAME, 1))
            for _ in range(2)]


def _run_context_chain(sigs):
    DeviceContext.release("tchain")
    caps = ("audio/x-raw, format=F64LE, rate=192000, channels=1, "
            "layout=interleaved")
    pipes = [parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 context=tchain '
        f'context-block={FRAME} ! '
        f'audioloudnorm context=tchain device-gating-blocks={GATING} ! '
        f'ebur128level context=tchain mode=momentary,short-term '
        f'interval=200000000 device-gating-blocks={GATING} ! '
        f'appsink name=sink')
        for _ in sigs]
    for p in pipes:
        p.set_state(State.PLAYING)
    for k in range(sigs[0].shape[0]):
        for s, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(sigs[s][k], pts=k * 100_000_000))
            while p.iterate():
                pass
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()
    outs, msgs = [], []
    for p in pipes:
        bufs = p.get_by_name("sink").pull_all()
        outs.append(np.concatenate([np.asarray(b.array).reshape(-1)
                                    for b in bufs]))
        msgs.append([m for m in p.bus.drain()
                     if getattr(m, "name", "") == "ebur128-level"])
        p.set_state(State.NULL)
    DeviceContext.release("tchain")
    return outs, msgs


def _run_direct(sigs):
    """The same math straight through gstpu.ops at B=len(sigs)."""
    import jax.numpy as jnp

    from gstpu.ops.echo import echo_block, make_state
    from gstpu.ops.loudnorm_dev import (LoudnormParams, init_state,
                                        make_steps)

    B = len(sigs)
    params = LoudnormParams(channels=1, max_blocks=GATING)
    first, inner = make_steps(params)
    delay = (250_000_000 * 192_000) // 1_000_000_000
    tail = make_state((B,), delay)
    st = init_state(params, B)
    inten = jnp.full((B, 1), 0.4)
    fb = jnp.full((B, 1), 0.3)

    x = jnp.asarray(np.stack([s[:30].reshape(-1) for s in sigs]))
    tail, y = echo_block(tail, x, inten, fb, delay=delay)
    st, out0 = first(st, y)
    outs = [np.asarray(out0)]
    for k in range(30, sigs[0].shape[0]):
        xk = jnp.asarray(np.stack([s[k].reshape(-1) for s in sigs]))
        tail, y = echo_block(tail, xk, inten, fb, delay=delay)
        st, ok = inner(st, y)
        outs.append(np.asarray(ok))
    return np.concatenate(outs, axis=1)


def test_chain_context_matches_direct_same_batch_bitwise(
        chain_signals):
    """The element/context machinery must add ZERO numerical
    difference: context chain at B=2 == the same ops called directly
    at B=2, bitwise, every lane."""
    outs, msgs = _run_context_chain(chain_signals)
    ref = _run_direct(chain_signals)
    for s in range(len(chain_signals)):
        # the streaming region (the EOS tail is gated separately
        # against the host element below)
        assert outs[s].size > ref[s].size
        assert np.array_equal(outs[s][:ref[s].size], ref[s]), \
            f"stream {s}: chain-context path diverges from direct B=2"
    # the fused meter posted messages without altering the data
    assert msgs[0], "no ebur128-level messages posted"
    st = msgs[0][-1].fields["shortterm-loudness"]
    assert -70.0 < st < 0.0


def test_chain_context_vs_unbatched_b1_ulp(chain_signals):
    """Against a B=1 run, non-zero lanes may differ by XLA's
    batch-size-dependent gemm row packing (the biquad block matmuls)
    — bounded at the ulp class, NOT an error of the batching runtime
    (same-batch comparison above is bitwise)."""
    outs, _ = _run_context_chain(chain_signals)
    for s, sig in enumerate(chain_signals):
        ref = _run_direct([sig])[0]
        d = np.abs(outs[s][:ref.size] - ref).max()
        assert d <= 1e-14, f"stream {s} vs B=1: max diff {d}"


def test_chain_context_vs_host_element(chain_signals):
    """Context chain vs the host numpy audioloudnorm element (which is
    sample-exact vs the literal reference transcription)."""
    outs, _ = _run_context_chain(chain_signals)
    sig = chain_signals[0]
    caps = ("audio/x-raw, format=F64LE, rate=192000, channels=1, "
            "layout=interleaved")
    p = parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 ! audioloudnorm ! '
        f'appsink name=sink')
    p.set_state(State.PLAYING)
    for k in range(sig.shape[0]):
        p.get_by_name("src").push_buffer(
            Buffer(sig[k], pts=k * 100_000_000))
        while p.iterate():
            pass
    p.get_by_name("src").end_of_stream()
    p.run()
    host = np.concatenate([np.asarray(b.array).reshape(-1)
                           for b in p.get_by_name("sink").pull_all()])
    p.set_state(State.NULL)
    # FULL-length comparison: the context path now drains the 3 s
    # gain-lookahead tail at EOS via the device FINAL step
    # (ops/loudnorm_dev.make_final_step), like the host element
    assert outs[0].size == host.size, (outs[0].size, host.size)
    d = np.abs(outs[0] - host).max()
    assert d <= 1e-9, f"context chain vs host element: max diff {d}"


def test_chain_context_depth2_bit_identical(chain_signals):
    """depth=2 (overlapped distribution: batch k's outputs/aux are
    handed out only after batch k+1 is dispatched — the pipelining the
    TPU bench uses to avoid a device sync per block round) changes
    NOTHING in the data: outputs are byte-identical to depth=1 and the
    metering messages still arrive."""
    base_outs, base_msgs = _run_context_chain(chain_signals)

    DeviceContext.release("tchain")
    DeviceContext.acquire("tchain", FRAME, depth=2)
    outs, msgs = _run_context_chain.__wrapped__(chain_signals) \
        if hasattr(_run_context_chain, "__wrapped__") \
        else _run_context_chain_keep(chain_signals)
    for a, b in zip(base_outs, outs):
        assert a.shape == b.shape
        assert np.array_equal(a, b)
    assert all(m for m in msgs)


def _run_context_chain_keep(sigs):
    """_run_context_chain minus the initial release (the test
    pre-acquires the context with depth=2)."""
    caps = ("audio/x-raw, format=F64LE, rate=192000, channels=1, "
            "layout=interleaved")
    pipes = [parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 context=tchain '
        f'context-block={FRAME} ! '
        f'audioloudnorm context=tchain device-gating-blocks={GATING} ! '
        f'ebur128level context=tchain mode=momentary,short-term '
        f'interval=200000000 device-gating-blocks={GATING} ! '
        f'appsink name=sink')
        for _ in sigs]
    for p in pipes:
        p.set_state(State.PLAYING)
    for k in range(sigs[0].shape[0]):
        for s, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(sigs[s][k], pts=k * 100_000_000))
            while p.iterate():
                pass
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()
    outs, msgs = [], []
    for p in pipes:
        bufs = p.get_by_name("sink").pull_all()
        outs.append(np.concatenate([np.asarray(b.array).reshape(-1)
                                    for b in bufs]))
        msgs.append([m for m in p.bus.drain()
                     if getattr(m, "name", "") == "ebur128-level"])
        p.set_state(State.NULL)
    DeviceContext.release("tchain")
    return outs, msgs


# -- chain fusion (VERDICT r4 ask 6: the L2' fusion promise) -----------------

def _stage_probe(mode):
    """Build one chain, return (n_stages, stage_keys) then tear down."""
    DeviceContext.release("tfuse")
    caps = ("audio/x-raw, format=F64LE, rate=192000, channels=1, "
            "layout=interleaved")
    p = parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 context=tfuse '
        f'context-block={FRAME} ! '
        f'audioloudnorm context=tfuse device-gating-blocks={GATING} ! '
        f'ebur128level context=tfuse mode={mode} '
        f'device-gating-blocks={GATING} ! appsink name=sink')
    p.set_state(State.PLAYING)
    # one frame negotiates caps -> members finalize (no fire yet: the
    # loudnorm stage needs the 3 s priming window)
    p.get_by_name("src").push_buffer(
        Buffer(np.zeros((FRAME, 1)), pts=0))
    while p.iterate():
        pass
    ctx = DeviceContext.acquire("tfuse")
    assert ctx._build_chains()
    stages = ctx.chains[0].stages
    keys = [s.spec["key"][0] for s in stages]
    n_members = [len(s.members) for s in stages]
    p.set_state(State.NULL)
    DeviceContext.release("tfuse")
    return keys, n_members


def test_fusion_engages_for_momentary_shortterm():
    """loudnorm absorbs a momentary/short-term ebur128level into ONE
    stage: the gain machine's output-measurement pass IS the meter."""
    keys, n_members = _stage_probe("momentary,short-term")
    assert keys == ["rsaudioecho", "audioloudnorm+ebur128level"]
    assert n_members == [1, 2]


def test_fusion_declines_global_mode():
    """global gating needs the standalone meter state — no fusion."""
    keys, n_members = _stage_probe("momentary,global")
    assert keys == ["rsaudioecho", "audioloudnorm", "ebur128level"]
    assert n_members == [1, 1, 1]


def test_fusion_identity_vs_unfused(chain_signals, monkeypatch):
    """Fused == unfused: outputs BITWISE, meter messages equal (the
    fused meter reads loudnorm's ring_out; the standalone stage runs
    its own K-weighting chain over the same output — same math)."""
    fused_outs, fused_msgs = _run_context_chain(chain_signals)
    monkeypatch.setenv("GSTPU_NO_CHAIN_FUSION", "1")
    plain_outs, plain_msgs = _run_context_chain(chain_signals)
    for a, b in zip(fused_outs, plain_outs):
        assert a.shape == b.shape
        assert np.array_equal(a, b)
    assert len(fused_msgs[0]) == len(plain_msgs[0]) > 0
    for mf, mp in zip(fused_msgs[0], plain_msgs[0]):
        assert mf.fields["timestamp"] == mp.fields["timestamp"]
        for k in ("momentary-loudness", "shortterm-loudness"):
            df = mf.fields[k]
            dp = mp.fields[k]
            assert abs(df - dp) <= 1e-9, (k, df, dp)


def test_fused_chain_checkpoint_resume_bit_exact(chain_signals,
                                                 tmp_path):
    """SURVEY 5.4 x fusion: snapshot a live FUSED chain context
    mid-stream (the fused stage's state lives on the loudnorm
    member — layout is fusion-agnostic), wipe, restore, continue —
    outputs equal the uninterrupted run bit-for-bit."""
    from gstpu.runtime.device_batch import (restore_context,
                                            snapshot_context)

    def run(interrupt):
        DeviceContext.release("tchain")
        caps = ("audio/x-raw, format=F64LE, rate=192000, channels=1, "
                "layout=interleaved")
        pipes = [parse_launch(
            f'appsrc name=src caps="{caps}" ! '
            f'rsaudioecho delay=250000000 max-delay=250000000 '
            f'intensity=0.4 feedback=0.3 context=tchain '
            f'context-block={FRAME} ! '
            f'audioloudnorm context=tchain '
            f'device-gating-blocks={GATING} ! '
            f'ebur128level context=tchain mode=momentary,short-term '
            f'interval=200000000 device-gating-blocks={GATING} ! '
            f'appsink name=sink') for _ in chain_signals]
        for p in pipes:
            p.set_state(State.PLAYING)
        n_frames = chain_signals[0].shape[0]
        for k in range(n_frames):
            for s, p in enumerate(pipes):
                p.get_by_name("src").push_buffer(
                    Buffer(chain_signals[s][k], pts=k * 100_000_000))
                while p.iterate():
                    pass
            if interrupt and k == 31:
                ctx = DeviceContext.acquire("tchain")
                assert len(ctx.chains[0].stages) == 2  # fused
                path = str(tmp_path / "fused.ckpt.npz")
                snapshot_context(ctx, path)
                for m in ctx.members:
                    if m.spec is not None:
                        m.state = m.spec["init_state"]()
                restore_context(ctx, path)
        outs = []
        for p in pipes:
            p.get_by_name("src").end_of_stream()
            p.run()
            outs.append(np.concatenate(
                [np.asarray(b.array).reshape(-1)
                 for b in p.get_by_name("sink").pull_all()]))
            p.set_state(State.NULL)
        DeviceContext.release("tchain")
        return outs

    a = run(False)
    b = run(True)
    for x, y in zip(a, b):
        assert x.shape == y.shape
        assert np.array_equal(x, y)
