"""Benchmark: realtime multiple per chip on the batched 48 kHz audiofx
chain.

Methodology follows the reference's threadshare benchmark shape
(generic/threadshare/examples/benchmark.rs: N parallel streams,
steady-state window, throughput counter) adapted to the batched device
runtime: B streams of 48 kHz stereo audio are processed in 1 s blocks
through the device DSP chain (currently rsaudioecho's kernel; the
chain grows with the framework). Stream state and blocks are
device-resident — the production design (SURVEY.md §7 L2') keeps
streams in HBM and double-buffers host I/O, so the steady-state rate
is the device chain rate.

Prints ONE JSON line:
  {"metric": ..., "value": realtime_multiple_per_chip, "unit": "x",
   "vs_baseline": value/100}
Target (BASELINE.md): >=100x realtime per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from gstpu.ops.echo import echo_block, make_state

    rate, channels = 48000, 2
    block_s = 1.0
    B = 256                              # parallel streams
    N = int(rate * block_s) * channels   # flattened samples per block
    D = int(0.25 * rate) * channels      # 250 ms echo
    S = D

    dev = jax.devices()[0]

    def step(tail, x, inten, fb):
        return echo_block(tail, x, inten, fb, delay=D)

    step = jax.jit(step, donate_argnums=(0,))

    tail = jax.device_put(make_state((B,), S), dev)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.uniform(-1, 1, (B, N)).astype(np.float32), dev)
    inten, fb = jnp.float64(0.5), jnp.float64(0.25)

    iters = 30

    @jax.jit
    def run_window(tail, x, inten, fb):
        """One steady-state window: `iters` chained 1 s blocks, fully
        on device (single dispatch so the measurement reflects the
        device chain rate, not per-call RPC latency of the dev-time
        TPU tunnel). The scalar checksum forces materialization."""
        def body(carry, _):
            tail, x = carry
            tail, out = step(tail, x, inten, fb)
            return (tail, out), jnp.float32(0)
        (tail, out), _ = jax.lax.scan(body, (tail, x), None, length=iters)
        return tail, jnp.sum(out)

    t, s = run_window(tail, x, inten, fb)
    float(s)  # warmup + compile, synced via readback
    t0 = time.perf_counter()
    t, s = run_window(tail, x, inten, fb)
    float(s)
    wall = time.perf_counter() - t0

    audio_seconds = B * iters * block_s
    rt_multiple = audio_seconds / wall
    print(json.dumps({
        "metric": "realtime-multiple/chip, 48kHz stereo audiofx chain "
                  f"({B} device-resident streams, echo kernel)",
        "value": round(rt_multiple, 1),
        "unit": "x",
        "vs_baseline": round(rt_multiple / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
