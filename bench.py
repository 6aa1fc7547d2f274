"""Benchmark: realtime multiple per chip on the BASELINE audiofx
chain with the REAL elements on device (VERDICT r1 #1):

    rsaudioecho -> audioloudnorm -> ebur128level
    192 kHz F64 stereo, batched over parallel streams.

The loudnorm stage is the full reference algorithm (gain state
machine, 3 s lookahead, true-peak limiter state machine, gated
loudness) from gstpu.ops.loudnorm_dev — the SAME code the
`audioloudnorm` element executes (control-flow-exact vs the numpy
element, which is sample-exact vs the literal reference
transcription; see tests/test_loudnorm_device.py).  No stand-ins.

Methodology follows the reference's threadshare benchmark shape
(generic/threadshare/examples/benchmark.rs: N parallel streams,
steady-state window, throughput counter): stream state stays resident
in HBM; each jitted step consumes one 100 ms frame per stream.  Steps
are chained by data dependency (output feeds the next input) so the
number reflects the device chain rate, not the dev-tunnel's 45 MB/s
H2D path — production IO is double-buffered around this steady state
(SURVEY.md §7 L2').  A scalar readback forces a real sync (the
tunnel's block_until_ready is unreliable).

Self-checks (printed to stderr, not part of the JSON):
  * per-stream outputs of a (B) batch match a B=1 run bitwise on the
    same backend — the element/chain identity is structural;
  * the fused meter reports the output near the -24 LUFS target.

Prints ONE JSON line:
  {"metric": ..., "value": realtime_multiple_per_chip, "unit": "x",
   "vs_baseline": value/100}
Target (BASELINE.md): >=100x realtime per chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the heavy f64 chain compiles
    once per machine; later runs (including the driver's) start in
    seconds instead of minutes over the dev tunnel."""
    import os

    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          0)
    except Exception:
        pass                      # older jax: defaults are fine


def _wait_for_device(window_s: float | None = None,
                     probe_timeout_s: float = 90.0) -> None:
    """Bounded wait-and-retry for the TPU tunnel (VERDICT r4 #2).

    The axon tunnel's client retries device discovery forever when
    the remote side is down; round 4's single 240 s fail-fast meant
    one transient flap voided the whole round's driver capture.
    Instead: probe for a device in a SUBPROCESS (so a hung tunnel
    client can't wedge this process) every ~probe_timeout_s, for up
    to window_s total.  First successful probe → return; window
    exhausted → exit 2 with a clear note (recoverable by the driver,
    unlike a silent multi-hour hang).  Measurement-discipline
    analogue: /root/reference/ci/run-cargo-test.sh:19-28."""
    import os
    import subprocess
    import time as _time

    if window_s is None:
        window_s = float(os.environ.get("GSTPU_BENCH_WAIT_S", 900))
    deadline = _time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); print(len(d), d[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if r.returncode == 0 and r.stdout.strip():
                print(f"bench: device probe ok (attempt {attempt}): "
                      f"{r.stdout.strip()}", file=sys.stderr, flush=True)
                return
            note = (r.stderr or r.stdout).strip().splitlines()[-1:]
            print(f"bench: device probe failed (attempt {attempt}): "
                  f"{note}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench: device probe hung >{probe_timeout_s:.0f}s "
                  f"(attempt {attempt}) — tunnel likely down, retrying",
                  file=sys.stderr, flush=True)
        if _time.monotonic() >= deadline:
            print(f"bench: no usable jax device within {window_s:.0f}s "
                  f"({attempt} probes) — aborting instead of hanging",
                  file=sys.stderr, flush=True)
            raise SystemExit(2)
        _time.sleep(min(15.0, max(1.0, deadline - _time.monotonic())))


def _device_watchdog(timeout_s: float = 240.0):
    """Backstop: hard-exit if the in-process jax init still hangs
    AFTER a probe subprocess already saw a live device.  Returns a
    cancel() to call once devices are live."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(timeout_s):
            print(f"bench: no usable jax device after {timeout_s:.0f}s "
                  f"(TPU tunnel down?) — aborting instead of hanging",
                  file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def main() -> None:
    quick = "--quick" in sys.argv[1:] or bool(
        __import__("os").environ.get("GSTPU_BENCH_QUICK"))
    _wait_for_device()
    cancel_watchdog = _device_watchdog()
    import jax
    _enable_compile_cache()
    jax.config.update("jax_enable_x64", True)
    print(f"bench: devices {jax.devices()}"
          + (" [quick]" if quick else ""), file=sys.stderr, flush=True)
    cancel_watchdog()
    import jax.numpy as jnp
    from gstpu.parallel.chains import make_audiofx_exact_chain

    C = 2
    B = int(__import__("os").environ.get("GSTPU_BENCH_STREAMS", 96))
    prime, step, init, n_prime, n_step = make_audiofx_exact_chain(
        channels=C, echo_delay=48_000 * C, max_delay=48_000 * C)

    # inputs are synthesized ON DEVICE: shipping ~1 GB of f64 test
    # signal through the 45 MB/s dev tunnel would swamp the run
    from functools import partial

    @partial(jax.jit, static_argnums=(0,))
    def _make_signal(n_flat, freq, key):
        t = jnp.arange(n_flat // C, dtype=jnp.float64) / 192_000.0
        base = (0.15 * jnp.sin(2 * jnp.pi * freq * t)
                + 0.05 * jnp.sin(2 * jnp.pi * 97.0 * t))
        sig = jnp.repeat(base[:, None], C, axis=1).reshape(-1)
        noise = 1e-3 * jax.random.normal(key, (B, n_flat),
                                         dtype=jnp.float64)
        return sig[None, :] + noise              # decorrelated streams

    key = jax.random.PRNGKey(0)
    x0 = _make_signal(n_prime, jnp.float64(440.0), key)
    x0.block_until_ready()
    inten, fb = jnp.float64(0.4), jnp.float64(0.3)

    checksum = jax.jit(lambda y: jnp.sum(y))

    state = init(B)
    t0 = time.perf_counter()
    state, out = prime(state, x0, inten, fb)
    float(checksum(out))
    print(f"prime (3 s lookahead) + compile: "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)

    # warm-up / compile the steady-state step
    t0 = time.perf_counter()
    state, out, meters = step(state, out, inten, fb)
    float(checksum(out))
    print(f"step compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)

    # input bank: 12 distinct realistic frames pre-uploaded to HBM and
    # cycled (production feeds via double-buffered H2D; the dev tunnel
    # is 45 MB/s, so uploading per-step would measure the tunnel).
    n_bank = 4 if quick else 12
    keys = jax.random.split(key, n_bank + 1)
    bank = [_make_signal(n_step, jnp.float64(300.0 + 40 * k),
                         keys[k + 1]) for k in range(n_bank)]
    for fr in bank:
        fr.block_until_ready()
    for k in range(3 if quick else 6):            # settle the gain
        state, out, meters = step(state, bank[k % n_bank], inten, fb)
    float(checksum(out))

    iters = 8 if quick else 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, out, meters = step(state, bank[i % n_bank], inten, fb)
    float(checksum(out))
    wall = time.perf_counter() - t0

    audio_seconds = B * iters * 0.1
    rt = audio_seconds / wall

    # single-dispatch ceiling: the same per-100ms step scanned over
    # the bank INSIDE one jit — immune to the dev tunnel's dispatch
    # round-trips, so it isolates chip throughput from link latency
    # (per-dispatch rt above swings with tunnel RTT day to day;
    # docs/profile_chain_r5.md).  Production streaming cannot scan —
    # blocks arrive one round at a time — so `value` stays the
    # per-dispatch number.
    scan_rt = None
    try:                        # fail-soft: never void the capture
        # always a 4-bank scan so --quick and full mode share ONE
        # compiled executable (the quick pass pre-warms the cache the
        # driver's full pass reuses; a 12-bank shape would compile
        # again for minutes over the tunnel)
        n_scan = min(4, n_bank)
        banks_arr = jnp.stack(bank[:n_scan])

        @jax.jit
        def scan_rounds(st, xs):
            def body(s, x):
                s2, out2, _m = step(s, x, inten, fb)
                return s2, jnp.sum(out2)
            return jax.lax.scan(body, st, xs)

        state, sums = scan_rounds(state, banks_arr)  # compile + warm
        sums.block_until_ready()
        reps = 1 if quick else 5
        t0 = time.perf_counter()
        for _ in range(reps):
            state, sums = scan_rounds(state, banks_arr)
        sums.block_until_ready()
        scan_wall = time.perf_counter() - t0
        scan_rt = B * reps * n_scan * 0.1 / scan_wall
        print(f"single-dispatch scan ceiling: {scan_rt:.1f}x realtime"
              f" ({1e3 * scan_wall / (reps * n_scan):.2f} ms/round vs"
              f" {1e3 * wall / iters:.2f} ms/round dispatched)",
              file=sys.stderr)
    except Exception as e:
        print(f"scan-ceiling leg skipped: {e}", file=sys.stderr)
    st = float(jnp.mean(meters["shortterm"]))
    print(f"fused ebur128level shortterm(out): {st:.2f} LUFS "
          f"(target -24)", file=sys.stderr)

    # structural-identity self-check: lane 0 of the batch == B=1 run.
    # Lane-0 inputs are identical in both runs; per-stream math must
    # not depend on batch size (element == chain identity).
    try:
        if quick:
            raise RuntimeError("--quick: self-check elided")
        state1 = init(1)
        stateB = init(B)
        state1, f1 = prime(state1, x0[:1], inten, fb)
        stateB, fN = prime(stateB, x0, inten, fb)
        dmax = float(np.abs(np.asarray(f1[0])
                            - np.asarray(fN[0])).max())
        for _ in range(3):
            state1, f1, _m = step(state1, fN[:1], inten, fb)
            stateB, fN, _m = step(stateB, fN, inten, fb)
            dmax = max(dmax, float(np.abs(np.asarray(f1[0])
                                          - np.asarray(fN[0])).max()))
        # bitwise on CPU (tested in tests/test_loudnorm_device.py);
        # on TPU the f64 EMULATION rounds batch-layout-dependently —
        # report the measured bound (expected ~1e-13, the emulation's
        # own precision class; 0.0 means bitwise).
        print(f"B=1 vs B={B} lane-0 max |diff|: {dmax:.3e} "
              f"({'bitwise' if dmax == 0.0 else 'f64-emulation bound'})",
              file=sys.stderr)
    except Exception as e:                        # self-check only
        print(f"identity self-check skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "realtime-multiple/chip, 192kHz F64 stereo audiofx "
                  f"chain ({B} device-resident streams: rsaudioecho + "
                  "full audioloudnorm (gain machine + true-peak "
                  "limiter) + fused ebur128level)",
        "value": round(rt, 1),
        "unit": "x",
        "vs_baseline": round(rt / 100.0, 3),
        **({"scan_ceiling_rt": round(scan_rt, 1)}
           if scan_rt is not None else {}),
    }))


if __name__ == "__main__":
    main()
