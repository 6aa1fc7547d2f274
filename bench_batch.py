"""DeviceContext element-runtime benchmark (VERDICT r2 item 1).

Two measurements, both through REAL parse_launch pipelines:

1. chain  — N pipelines of the flagship BASELINE chain
       appsrc ! rsaudioecho ! audioloudnorm ! ebur128level ! appsink
   at 192 kHz F64 stereo, every element a member of ONE DeviceContext.
   The context discovers the chains from pad topology and compiles
   echo + the full loudnorm core (gain machine, 3 s lookahead,
   true-peak limiter — gstpu.ops.loudnorm_dev) + the device meter
   into one fused jitted dispatch per 100 ms block round.  Inputs are
   device-resident DeviceRow banks (synthesized on device like
   bench.py: the dev tunnel's ~45 MB/s H2D would otherwise be the
   measurement; production IO is double-buffered around this steady
   state) and outputs stay device-resident until the final checksum.

2. echo — the round-2 comparison set (per-stream dispatch vs batched
   vs batched+overlap) on 48 kHz mono rsaudioecho with HOST data,
   kept for continuity with BENCH_r02-era numbers.

Prints ONE JSON line: the chain realtime multiple is the contract
value; echo numbers ride as extra fields.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FRAME = 19_200
SECOND = 1_000_000_000


def run_chain(n_streams: int, frames: int = 20, channels: int = 2,
              settle: int = 4):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from gstpu import Buffer, State, parse_launch
    from gstpu.runtime.device_batch import DeviceContext, DeviceRow

    C = channels
    block = FRAME * C
    ctx_name = "bench-chain"
    DeviceContext.release(ctx_name)
    # depth=2: distribution of batch k happens after batch k+1 is
    # dispatched, so the host never waits for the device inside a
    # round (bit-identical outputs —
    # tests/test_chain_context.py::test_chain_context_depth2...)
    ctx = DeviceContext.acquire(ctx_name, block, depth=2)
    caps = (f"audio/x-raw, format=F64LE, rate=192000, channels={C}, "
            f"layout=interleaved")
    pipes = [parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 context={ctx_name} '
        f'context-block={block} ! '
        f'audioloudnorm context={ctx_name} ! '
        f'ebur128level context={ctx_name} '
        f'mode=momentary,short-term ! '
        f'appsink name=sink') for _ in range(n_streams)]
    for p in pipes:
        p.set_state(State.PLAYING)

    # device-synthesized input banks (decorrelated streams)
    B = n_streams

    def make_bank(n_flat, freq, key):
        t = jnp.arange(n_flat // C, dtype=jnp.float64) / 192_000.0
        base = (0.15 * jnp.sin(2 * jnp.pi * freq * t)
                + 0.05 * jnp.sin(2 * jnp.pi * 97.0 * t))
        sig = jnp.repeat(base[:, None], C, axis=1).reshape(-1)
        noise = 1e-3 * jax.random.normal(key, (B, n_flat),
                                         dtype=jnp.float64)
        return sig[None, :] + noise

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 14)
    prime_bank = make_bank(30 * block, jnp.float64(440.0), keys[0])
    banks = [make_bank(block, jnp.float64(300.0 + 40 * k), keys[k + 1])
             for k in range(12)]
    prime_bank.block_until_ready()
    for b in banks:
        b.block_until_ready()
    checksum = jax.jit(lambda y: jnp.sum(y))

    def push_round(bank, k):
        for i, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(DeviceRow(bank, i), pts=k * 100_000_000))
            while p.iterate():
                pass

    t0 = time.perf_counter()
    push_round(prime_bank, 0)      # 3 s priming frame + compile
    ctx.flush_pending()            # warm-up only: see the output now
    sinks = [p.get_by_name("sink") for p in pipes]
    out0 = sinks[0].samples[-1].data
    float(checksum(out0.parent if isinstance(out0, DeviceRow)
                   else out0))
    print(f"chain prime+compile: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    t0 = time.perf_counter()
    push_round(banks[0], 30)
    ctx.flush_pending()
    out0 = sinks[0].samples[-1].data
    float(checksum(out0.parent if isinstance(out0, DeviceRow)
                   else out0))
    print(f"chain step compile+first: "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    for k in range(settle):
        push_round(banks[(k + 1) % 12], 31 + k)
    for s in sinks:
        s.samples.clear()

    t0 = time.perf_counter()
    for k in range(frames):
        push_round(banks[k % 12], 40 + k)
    ctx.flush_pending()            # hand out the overlapped last round
    last = sinks[0].samples[-1].data
    float(checksum(last.parent if isinstance(last, DeviceRow)
                   else last))                    # force a real sync
    wall = time.perf_counter() - t0

    got = sum(len(s.samples) for s in sinks)
    # depth=2 lag: the settle phase's last round lands inside the
    # window and the flush adds the final one -> frames+1 per stream
    assert got == n_streams * (frames + 1), (got,
                                             n_streams * (frames + 1))
    audio_s = n_streams * frames * FRAME / 192_000.0
    for p in pipes:
        p.set_state(State.NULL)
    DeviceContext.release(ctx_name)
    return audio_s / wall


def run_echo_mode(ctx_name, n_streams, blocks, block, signals,
                  depth=1):
    from gstpu import Buffer, State, parse_launch
    from gstpu.runtime.device_batch import DeviceContext

    if ctx_name:
        DeviceContext.release(ctx_name)
        DeviceContext.acquire(ctx_name, block, depth=depth)
    extra = (f"context={ctx_name} context-block={block} "
             if ctx_name else "")
    pipes = [parse_launch(
        f'appsrc name=src caps="audio/x-raw, format=F64LE, '
        f'rate=48000, channels=1, layout=interleaved" ! '
        f'rsaudioecho delay=10000000 max-delay=10000000 '
        f'intensity=0.4 feedback=0.3 {extra}! appsink name=sink')
        for _ in range(n_streams)]
    for p in pipes:
        p.set_state(State.PLAYING)
    for i, p in enumerate(pipes):
        p.get_by_name("src").push_buffer(
            Buffer(signals[i][0].reshape(-1, 1)))
        while p.iterate():
            pass
    t0 = time.perf_counter()
    for k in range(1, blocks):
        for i, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(signals[i][k].reshape(-1, 1)))
            while p.iterate():
                pass
    total = 0
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()
        total += sum(b.size for b in p.get_by_name("sink").pull_all())
    wall = time.perf_counter() - t0
    for p in pipes:
        p.set_state(State.NULL)
    if ctx_name:
        DeviceContext.release(ctx_name)
    audio_s = n_streams * (blocks - 1) * block / 48_000.0
    return audio_s / wall


def main():
    import os

    import gstpu
    gstpu.init()
    # persistent compile cache (same as bench.py)
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    n_chain = int(os.environ.get("GSTPU_BENCH_STREAMS", 64))
    chain_rt = run_chain(n_chain)
    print(f"element-runtime chain ({n_chain} pipelines): "
          f"{chain_rt:.1f}x realtime", file=sys.stderr)
    # optional second size: bench.py's ops ceiling runs B=96 while
    # this bench's history is at 64 — docs/profile_chain_r5.md showed
    # ~21 of the headline-gap "x" were batch size, so an
    # apples-to-apples leg can be recorded without breaking the
    # 64-stream trend line
    n2 = int(os.environ.get("GSTPU_BENCH_STREAMS2", 0))
    chain_rt2 = run_chain(n2) if n2 else None
    if chain_rt2 is not None:
        print(f"element-runtime chain ({n2} pipelines): "
              f"{chain_rt2:.1f}x realtime", file=sys.stderr)

    n_streams, blocks, block = 64, 12, 4_800
    rng = np.random.default_rng(0)
    signals = [[rng.uniform(-1, 1, block) for _ in range(blocks)]
               for _ in range(n_streams)]
    per_stream = run_echo_mode(None, n_streams, blocks, block, signals)
    batched = run_echo_mode("bench-ctx", n_streams, blocks, block,
                            signals)
    batched2 = run_echo_mode("bench-ctx2", n_streams, blocks, block,
                             signals, depth=2)
    print(f"echo per-stream {per_stream:.1f}x / batched {batched:.1f}x"
          f" / overlapped {batched2:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": f"realtime-multiple/chip through the element runtime"
                  f": {n_chain} parse_launch pipelines of rsaudioecho!"
                  f"audioloudnorm!ebur128level (192kHz F64 stereo) "
                  f"fused to ONE device dispatch per 100ms block by "
                  f"their shared DeviceContext",
        "value": round(chain_rt, 1), "unit": "x",
        "vs_baseline": round(chain_rt / 100.0, 3),
        "echo_per_stream_dispatch": round(per_stream, 1),
        "echo_batched": round(batched, 1),
        "echo_batched_overlapped": round(batched2, 1),
        **({f"chain_b{n2}": round(chain_rt2, 1)}
           if chain_rt2 is not None else {}),
    }))


if __name__ == "__main__":
    main()
