"""BASELINE config #5: audiornnoise -> rav1enc 1080p intra.

Runs both halves of the config through the element runtime and
reports the slower one as the chain realtime multiple: a 1080p@30
I420 stream through `rav1enc` (speed 10, intra-friendly keyint) and a
48 kHz mono stream through `audiornnoise` (GRU engine, synthetic
weights).  The AV1 bitstream is decoded back with libdav1d to assert
conformance.  Supplementary evidence (the driver contract metric is
bench.py).

Note: this container exposes ONE host CPU core (nproc=1); rav1e
1080p all-intra at ~2 fps is the engine's single-core speed — the
reference's rav1enc wraps the same engine and would measure the same
here.  Entropy coding is inherently host-side; the TPU carries the
DSP chains (bench.py / bench_video.py).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def bench_rav1enc(n_frames=48):
    from gstpu import State, parse_launch
    from gstpu.core.video import VideoInfo
    from gstpu.native_codec import NativeDecoder
    W, H = 1920, 1080
    vi = VideoInfo("I420", W, H)
    rng = np.random.default_rng(0)
    base = ((np.arange(H)[:, None] + np.arange(W)[None, :])
            % 256).astype(np.uint8)
    frames = []
    for i in range(n_frames):
        y = np.roll(base, 8 * i, axis=1)
        u = np.full((H // 2, W // 2), 90 + (i % 8), np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    p = parse_launch(
        f'appsrc name=src caps="video/x-raw, format=I420, width={W}, '
        f'height={H}, framerate=30/1" ! rav1enc speed-preset=10 '
        f'quantizer=120 max-key-frame-interval=1 ! appsink name=sink')
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    p.set_state(State.PLAYING)
    t0 = time.perf_counter()
    for i, f in enumerate(frames):
        src.push_buffer(vi.make_buffer(f, pts=i * 33_333_333))
        while p.iterate():
            pass
    src.end_of_stream()
    p.run()
    wall = time.perf_counter() - t0
    pkts = [b.to_bytes() for b in sink.pull_all()]
    p.set_state(State.NULL)
    fps = len(frames) / wall
    # conformance: all frames decode with libdav1d
    dec = NativeDecoder("libdav1d")
    got = []
    for i, q in enumerate(pkts):
        got += dec.send(q, i)
    got += dec.finish()
    dec.close()
    assert len(got) == len(frames), (len(got), len(frames))
    return fps, len(pkts)


def bench_rnnoise(seconds=8.0):
    from gstpu import Buffer, State, parse_launch
    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        rng = np.random.default_rng(1)

        def gru(i, u):
            return {"W": rng.normal(0, .1, (3 * u, i)),
                    "U": rng.normal(0, .1, (3 * u, u)),
                    "b": rng.normal(0, .1, 3 * u)}
        w = {"input_dense_W": rng.normal(0, .1, (24, 42)),
             "input_dense_b": rng.normal(0, .1, 24),
             "denoise_output_W": rng.normal(0, .1, (22, 96)),
             "denoise_output_b": rng.normal(0, .1, 22),
             "vad_output_W": rng.normal(0, .1, (1, 24)),
             "vad_output_b": rng.normal(0, .1, 1)}
        for n, d in (("vad_gru", gru(24, 24)),
                     ("noise_gru", gru(90, 48)),
                     ("denoise_gru", gru(114, 96))):
            for k, v in d.items():
                w[f"{n}_{k}"] = v
        np.savez(tf.name, **w)
        p = parse_launch(
            f'appsrc name=src caps="audio/x-raw, format=F32LE, '
            f'rate=48000, channels=1, layout=interleaved" ! '
            f'audiornnoise model-location={tf.name} ! '
            f'appsink name=sink')
        src = p.get_by_name("src")
        p.set_state(State.PLAYING)
        n = int(seconds * 48000)
        x = rng.uniform(-0.2, 0.2, n).astype(np.float32)
        t0 = time.perf_counter()
        for off in range(0, n, 4800):
            src.push_buffer(Buffer(x[off:off + 4800].reshape(-1, 1)))
            while p.iterate():
                pass
        src.end_of_stream()
        p.run()
        wall = time.perf_counter() - t0
        p.set_state(State.NULL)
        return seconds / wall


def bench_rnnoise_fleet(n_streams=64, rounds=20, settle=3):
    """N audiornnoise streams batched through one DeviceContext: the
    full RNNoise GRU chain (STFT + 42-feature frontend + GRU stack +
    iSTFT) runs as ONE device dispatch per 100 ms block round
    (ops/rnnoise.make_device_gru_denoiser).  Aggregate realtime
    multiple across the fleet — the P7 multi-stream shape from
    SURVEY.md §2.8 applied to BASELINE config #5's denoise half.
    precision=f32: the TPU production mode (reference RNNoise is
    f32; device-vs-host parity at both precisions is gated in
    tests/test_rnnoise_device.py)."""
    import jax
    import jax.numpy as jnp

    from gstpu import Buffer, State, parse_launch
    from gstpu.runtime.device_batch import DeviceContext, DeviceRow

    block = 4800                        # 10 frames = 100 ms @48k mono
    ctx_name = "bench-rnnoise"
    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        rng = np.random.default_rng(1)

        def gru(i, u):
            return {"W": rng.normal(0, .1, (3 * u, i)),
                    "U": rng.normal(0, .1, (3 * u, u)),
                    "b": rng.normal(0, .1, 3 * u)}
        w = {"input_dense_W": rng.normal(0, .1, (24, 42)),
             "input_dense_b": rng.normal(0, .1, 24),
             "denoise_output_W": rng.normal(0, .1, (22, 96)),
             "denoise_output_b": rng.normal(0, .1, 22),
             "vad_output_W": rng.normal(0, .1, (1, 24)),
             "vad_output_b": rng.normal(0, .1, 1)}
        for n, d in (("vad_gru", gru(24, 24)),
                     ("noise_gru", gru(90, 48)),
                     ("denoise_gru", gru(114, 96))):
            for k, v in d.items():
                w[f"{n}_{k}"] = v
        np.savez(tf.name, **w)

        DeviceContext.release(ctx_name)
        pipes = [parse_launch(
            f'appsrc name=src caps="audio/x-raw, format=F32LE, '
            f'rate=48000, channels=1, layout=interleaved" ! '
            f'audiornnoise model-location={tf.name} precision=f32 '
            f'context={ctx_name} context-block={block} ! '
            f'appsink name=sink') for _ in range(n_streams)]
        for p in pipes:
            p.set_state(State.PLAYING)

        # device-synthesized decorrelated speech-ish banks
        B = n_streams
        key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, 8)

        def make_bank(k):
            t = jnp.arange(block, dtype=jnp.float32) / 48_000.0
            base = 0.2 * jnp.sin(2 * jnp.pi * (150.0 + 20 * k) * t)
            return (base[None, :] + 0.02 * jax.random.normal(
                keys[k], (B, block), dtype=jnp.float32))

        banks = [make_bank(k) for k in range(8)]
        for b in banks:
            b.block_until_ready()
        checksum = jax.jit(jnp.sum)

        def push_round(bank, k):
            for i, p in enumerate(pipes):
                p.get_by_name("src").push_buffer(
                    Buffer(DeviceRow(bank, i), pts=k * 100_000_000))
                while p.iterate():
                    pass

        sinks = [p.get_by_name("sink") for p in pipes]
        t0 = time.perf_counter()
        push_round(banks[0], 0)         # compile
        out0 = sinks[0].samples[-1].data
        float(checksum(out0.parent if isinstance(out0, DeviceRow)
                       else out0))
        print(f"rnnoise fleet compile+first: "
              f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
        for k in range(settle):
            push_round(banks[(k + 1) % 8], 1 + k)
        for s in sinks:
            s.samples.clear()

        t0 = time.perf_counter()
        for k in range(rounds):
            push_round(banks[k % 8], 8 + k)
        last = sinks[0].samples[-1].data
        float(checksum(last.parent if isinstance(last, DeviceRow)
                       else last))      # force a real device sync
        wall = time.perf_counter() - t0
        got = sum(len(s.samples) for s in sinks)
        assert got == n_streams * rounds, (got, n_streams * rounds)
        for p in pipes:
            p.set_state(State.NULL)
        DeviceContext.release(ctx_name)
        audio_s = n_streams * rounds * block / 48_000.0
        return audio_s / wall


def main():
    enc_fps, n_pkts = bench_rav1enc()
    rn_rt = bench_rnnoise()
    fleet_rt = bench_rnnoise_fleet()
    enc_rt = enc_fps / 30.0
    print(f"rav1enc 1080p: {enc_fps:.1f} fps ({enc_rt:.2f}x rt), "
          f"{n_pkts} conformant packets; audiornnoise GRU: "
          f"{rn_rt:.1f}x rt single-stream, {fleet_rt:.1f}x aggregate "
          f"batched fleet", file=sys.stderr)
    print(json.dumps({
        "metric": "realtime-multiple/chip, BASELINE config #5 "
                  "(audiornnoise GRU + rav1enc 1080p intra, "
                  "libdav1d-verified bitstream)",
        "value": round(min(enc_rt, fleet_rt), 2), "unit": "x",
        "vs_baseline": round(min(enc_rt, fleet_rt), 2),
        "rav1enc_1080p_fps": round(enc_fps, 1),
        "audiornnoise_rt_single": round(rn_rt, 1),
        "audiornnoise_fleet_rt": round(fleet_rt, 1),
        "fleet_streams": 64}))


if __name__ == "__main__":
    main()
