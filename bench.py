"""Benchmark: realtime multiple per chip on the batched 48 kHz audiofx
chain.

Methodology follows the reference's threadshare benchmark shape
(generic/threadshare/examples/benchmark.rs: N parallel streams,
steady-state window, throughput counter) on the fused device chain
(gstpu.parallel.chains): echo -> BS.1770 K-weighting (associative-scan
biquads) -> loudness gain -> soft limiter, one jitted step per 1 s
block, stream state resident in HBM (the production design,
SURVEY.md §7 L2': host IO is double-buffered around this steady
state). A single-dispatch scan window with a scalar readback is used
so the number reflects the device chain rate, not the per-call RPC
latency of the dev-time TPU tunnel.

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
    from gstpu.parallel.chains import make_audiofx_chain

    rate = 48000
    block_s = 1.0
    B = 256                        # parallel streams
    N = int(rate * block_s)        # mono samples per block
    D = int(0.25 * rate)           # 250 ms echo

    step, init_state = make_audiofx_chain(rate, D, D)
    state = init_state(B)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(-1, 1, (B, N)).astype(np.float32))
    inten, fb = jnp.float64(0.5), jnp.float64(0.25)
    target = jnp.float64(10 ** (-24 / 20))

    iters = 20
    checksum = jax.jit(lambda y: jnp.sum(y))

    # warm up / compile (the scalar float() forces a real sync through
    # the dev-time tunnel, where block_until_ready is unreliable)
    state, out, _ = step(state, x, inten, fb, target)
    float(checksum(out))

    t0 = time.perf_counter()
    for _ in range(iters):
        # chain via data dependency: each step consumes the previous
        # output block (steady-state stream processing)
        state, out, _ = step(state, out, inten, fb, target)
    float(checksum(out))
    wall = time.perf_counter() - t0

    audio_seconds = B * iters * block_s
    rt_multiple = audio_seconds / wall
    print(json.dumps({
        "metric": "realtime-multiple/chip, 48kHz audiofx chain "
                  f"({B} device-resident streams: echo + K-weighted "
                  "loudness gain + limiter)",
        "value": round(rt_multiple, 1),
        "unit": "x",
        "vs_baseline": round(rt_multiple / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
