"""DeviceContext batching benchmark (VERDICT r1 #3 evidence).

Measures the SAME 64-stream rsaudioecho workload through the element
runtime three ways on the real chip:
  per-stream  — each element dispatches its own per-buffer kernel
                (the round-1 default path)
  batched     — elements share a DeviceContext: one fused (64, N)
                dispatch per block round
  batched d2  — + double-buffered distribution (submit batch k, then
                materialize batch k-1: host demux overlaps device
                compute)

Prints ONE JSON line with the batched realtime multiple and the
speedups as extra fields (supplementary to bench.py's contract
metric).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_mode(ctx_name, n_streams, blocks, block, signals, depth=1):
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
    # warm (compile)
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
    # force remaining output materialization
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
    n_streams, blocks, block = 64, 12, 4_800
    rng = np.random.default_rng(0)
    signals = [[rng.uniform(-1, 1, block) for _ in range(blocks)]
               for _ in range(n_streams)]
    per_stream = run_mode(None, n_streams, blocks, block, signals)
    print(f"per-stream dispatch: {per_stream:.1f}x realtime",
          file=sys.stderr)
    batched = run_mode("bench-ctx", n_streams, blocks, block, signals)
    print(f"batched dispatch:    {batched:.1f}x realtime",
          file=sys.stderr)
    batched2 = run_mode("bench-ctx2", n_streams, blocks, block,
                        signals, depth=2)
    print(f"batched + overlap:   {batched2:.1f}x realtime",
          file=sys.stderr)
    print(json.dumps({
        "metric": "realtime-multiple/chip, 64 appsrc!rsaudioecho!"
                  "appsink element pipelines on one DeviceContext "
                  "(fused (64,4800) dispatch/block)",
        "value": round(max(batched, batched2), 1), "unit": "x",
        "vs_baseline": round(max(batched, batched2) / 100.0, 3),
        "per_stream_dispatch": round(per_stream, 1),
        "batched": round(batched, 1),
        "batched_overlapped": round(batched2, 1),
    }))


if __name__ == "__main__":
    main()
