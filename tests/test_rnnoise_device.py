"""audiornnoise DeviceContext execution path (VERDICT r2 weak 4):
N pipelines batch the full STFT -> spectral-gate -> iSTFT denoiser
into one device dispatch per block round; parity vs the host
element."""

import numpy as np

from gstpu import Buffer, State, parse_launch
from gstpu.runtime.device_batch import DeviceContext

FRAME = 480


def _run(sigs, ctx: bool):
    DeviceContext.release("rn")
    caps = ("audio/x-raw, format=F32LE, rate=48000, channels=1, "
            "layout=interleaved")
    extra = f"context=rn context-block={10 * FRAME} " if ctx else ""
    pipes = [parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'audiornnoise {extra}! appsink name=sink') for _ in sigs]
    for p in pipes:
        p.set_state(State.PLAYING)
    n_blocks = sigs[0].shape[0]
    for k in range(n_blocks):
        for s, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(sigs[s][k].astype(np.float32).reshape(-1, 1),
                       pts=k * 100_000_000))
            while p.iterate():
                pass
    outs = []
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()
        outs.append(np.concatenate(
            [np.asarray(b.array).reshape(-1)
             for b in p.get_by_name("sink").pull_all()]))
        p.set_state(State.NULL)
    DeviceContext.release("rn")
    return outs


def test_rnnoise_context_matches_host_element():
    rng = np.random.default_rng(3)
    sigs = [0.1 * rng.standard_normal((4, 10 * FRAME))
            for _ in range(3)]
    batched = _run(sigs, ctx=True)
    host = _run(sigs, ctx=False)
    for s in range(3):
        n = min(batched[s].size, host[s].size)
        assert n >= 3 * 10 * FRAME
        d = np.abs(batched[s][:n] - host[s][:n]).max()
        assert d <= 1e-6, f"stream {s}: {d}"   # f32 output quantum


def test_rnnoise_context_vad_mute():
    """voice-activity-threshold=1.0 mutes everything (gate VAD < 1)."""
    rng = np.random.default_rng(4)
    sig = 0.1 * rng.standard_normal((3, 10 * FRAME))
    DeviceContext.release("rnv")
    caps = ("audio/x-raw, format=F32LE, rate=48000, channels=1, "
            "layout=interleaved")
    p = parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'audiornnoise context=rnv context-block={10 * FRAME} '
        f'voice_activity_threshold=1.0 ! appsink name=sink')
    p.set_state(State.PLAYING)
    for k in range(3):
        p.get_by_name("src").push_buffer(
            Buffer(sig[k].astype(np.float32).reshape(-1, 1)))
        while p.iterate():
            pass
    p.get_by_name("src").end_of_stream()
    p.run()
    out = np.concatenate([np.asarray(b.array).reshape(-1)
                          for b in p.get_by_name("sink").pull_all()])
    assert np.abs(out).max() == 0.0
    p.set_state(State.NULL)
    DeviceContext.release("rnv")


def _gru_weights(rng):
    def gru(inputs, units):
        return {"W": rng.normal(0, 0.1, (3 * units, inputs)),
                "U": rng.normal(0, 0.1, (3 * units, units)),
                "b": rng.normal(0, 0.1, 3 * units)}
    w = {"input_dense_W": rng.normal(0, 0.1, (24, 42)),
         "input_dense_b": rng.normal(0, 0.1, 24),
         "denoise_output_W": rng.normal(0, 0.1, (22, 96)),
         "denoise_output_b": rng.normal(0, 0.1, 22),
         "vad_output_W": rng.normal(0, 0.1, (1, 24)),
         "vad_output_b": rng.normal(0, 0.1, 1)}
    for name, d in (("vad_gru", gru(24, 24)),
                    ("noise_gru", gru(90, 48)),
                    ("denoise_gru", gru(114, 96))):
        for k, v in d.items():
            w[f"{name}_{k}"] = v
    return w


def test_gru_device_twin_matches_host_oracle():
    """make_device_gru_denoiser runs the ENTIRE RNNoise chain (STFT +
    42-feature frontend incl. pitch search + GRU stack + iSTFT) on
    device, batched; parity vs the host DenoiseState+GruModel oracle
    at the fp-reassociation level."""
    import jax
    import jax.numpy as jnp

    from gstpu.ops.rnnoise import (DenoiseState, GruModel,
                                   make_device_gru_denoiser)
    rng = np.random.default_rng(7)
    w = _gru_weights(rng)
    B, F = 3, 12
    t = np.arange(F * FRAME) / 48000
    x = np.stack([0.3 * np.sin(2 * np.pi * (200 + 60 * b) * t)
                  + 0.05 * rng.standard_normal(F * FRAME)
                  for b in range(B)]) * 32767.0

    host_out = np.zeros_like(x)
    host_vad = np.zeros((B, F))
    for b in range(B):
        ds = DenoiseState(GruModel(w))
        for f in range(F):
            y, v = ds.process_frame(x[b, f * FRAME:(f + 1) * FRAME])
            host_out[b, f * FRAME:(f + 1) * FRAME] = y
            host_vad[b, f] = v

    step, init = make_device_gru_denoiser(w, frames_per_block=F)
    st, out, vads = step(init(B), jnp.asarray(x))
    assert np.abs(np.asarray(out) - host_out).max() < 1e-9 * 32767
    assert np.abs(np.asarray(vads) - host_vad).max() < 1e-12


def test_gru_device_twin_f32_production_precision():
    """The f32 variant (TPU production mode — reference RNNoise is
    itself f32) tracks the f64 host oracle within single-precision
    accumulation error over the chain."""
    import jax.numpy as jnp

    from gstpu.ops.rnnoise import (DenoiseState, GruModel,
                                   make_device_gru_denoiser)
    rng = np.random.default_rng(17)
    w = _gru_weights(rng)
    B, F = 2, 10
    t = np.arange(F * FRAME) / 48000
    x = np.stack([0.3 * np.sin(2 * np.pi * (220 + 40 * b) * t)
                  + 0.05 * rng.standard_normal(F * FRAME)
                  for b in range(B)]) * 32767.0

    host_out = np.zeros_like(x)
    for b in range(B):
        ds = DenoiseState(GruModel(w))
        for f in range(F):
            y, _ = ds.process_frame(x[b, f * FRAME:(f + 1) * FRAME])
            host_out[b, f * FRAME:(f + 1) * FRAME] = y

    step, init = make_device_gru_denoiser(w, frames_per_block=F,
                                          dtype=jnp.float32)
    _, out, _ = step(init(B), jnp.asarray(x, jnp.float32))
    # absolute error on the +-32767 scale; f32 eps * scale * chain
    # depth ~ O(1)
    assert np.abs(np.asarray(out) - host_out).max() < 8.0


def test_rnnoise_gru_context_matches_host_element(tmp_path):
    """The element's DeviceContext path with model-location batches
    the GRU chain across streams and matches the streaming host-GRU
    element sample for sample (f32 output quantum)."""
    path = str(tmp_path / "w.npz")
    np.savez(path, **_gru_weights(np.random.default_rng(11)))
    rng = np.random.default_rng(5)
    sigs = [0.1 * rng.standard_normal((3, 10 * FRAME))
            for _ in range(3)]

    def run(ctx: bool):
        DeviceContext.release("rng")
        caps = ("audio/x-raw, format=F32LE, rate=48000, channels=1, "
                "layout=interleaved")
        extra = (f"context=rng context-block={10 * FRAME} "
                 if ctx else "engine=host ")
        pipes = [parse_launch(
            f'appsrc name=src caps="{caps}" ! '
            f'audiornnoise model-location={path} {extra}! '
            f'appsink name=sink') for _ in sigs]
        for p in pipes:
            p.set_state(State.PLAYING)
        for k in range(sigs[0].shape[0]):
            for s, p in enumerate(pipes):
                p.get_by_name("src").push_buffer(
                    Buffer(sigs[s][k].astype(np.float32)
                           .reshape(-1, 1), pts=k * 100_000_000))
                while p.iterate():
                    pass
        outs = []
        for p in pipes:
            p.get_by_name("src").end_of_stream()
            p.run()
            outs.append(np.concatenate(
                [np.asarray(b.array).reshape(-1)
                 for b in p.get_by_name("sink").pull_all()]))
            p.set_state(State.NULL)
        DeviceContext.release("rng")
        return outs

    batched = run(True)
    host = run(False)
    for s in range(3):
        n = min(batched[s].size, host[s].size)
        assert n >= 2 * 10 * FRAME
        d = np.abs(batched[s][:n] - host[s][:n]).max()
        assert d <= 1e-6, f"stream {s}: {d}"
