"""BASELINE row 3, second half: `sofalizer` SOFA binaural render
>= 100x realtime per chip (reference audio/hrtf/src/sofa/imp.rs:37-44
— partitioned FIR, dynamic filter re-selection with crossfade on
listener rotation, imp.rs:129-167).

Shape follows bench_hrtf.py: the element's hot path — uniformly
partitioned convolution (64-tap partitions, the reference's
partition-length default, sofa/imp.rs:37) of C virtual speakers
against the SOFA-selected (L, R) HRIR pair, channel sum — runs
device-resident over B streams.  The whole block's sub-frames are one
batched rfft, the frequency-domain delay line a gather, the partition
sum one reduce, the inverse one batched irfft: a single fused dispatch
per block with the reference's 64-sample algorithmic granularity
(gstpu.ops.fftconv.upc_block — the same kernel the element runs).
The listener ROTATES during the steady state: every 16th block
re-selects HRIRs and renders the reference's both-filter crossfade
blend, so the measured number includes the rotation path, not just
the static one.

A parity leg runs the REAL `sofalizer` element (Harness) through the
same yaw schedule, crossfade block included, and reports max|diff|
inside the metric string.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

RATE = 44_100
BLOCK = 256          # reference block length (sofa/imp.rs:38)
PART = 64            # reference partition length (sofa/imp.rs:37)
IR_LEN = 512         # HRIR taps
C = 6                # 5.1 virtual speakers
M = 24               # SOFA measurement ring (15 deg spacing)
ROT_EVERY = 16       # blocks between listener yaw steps


def _enable_compile_cache() -> None:
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
        pass


def make_sofa_file(rng) -> str:
    """Synthetic SOFA: M-point azimuth ring, decaying-noise HRIRs."""
    from gstpu.elements.audio.hrtf import write_sofa
    pos = np.stack([np.arange(M) * (360.0 / M),
                    np.zeros(M), np.full(M, 1.5)], axis=1)
    irs = rng.standard_normal((M, 2, IR_LEN)).astype(np.float32)
    irs *= np.exp(-np.arange(IR_LEN) / 100.0)[None, None, :] \
        .astype(np.float32)
    f = tempfile.NamedTemporaryFile(suffix=".sofa", delete=False)
    write_sofa(f.name, pos, irs, RATE)
    return f.name


def make_steps(irs):
    """Jitted steady + crossfade block steps, B streams x C channels:
    the element's own 64-tap UPC kernel (upc_block) batched over
    streams.  IRs are passed REAL and rfft'd in-graph (complex
    device_put wedges the dev tunnel)."""
    import jax
    import jax.numpy as jnp

    from gstpu.ops.fftconv import upc_block, upc_init, upc_ir_rfft

    def render(state, x, irs_cur):
        B = x.shape[0]
        h_f = upc_ir_rfft(irs_cur, part_len=PART)   # (C, 2, K, F)
        st, y = upc_block(state, x.reshape(B * C, 1, -1),
                          jnp.tile(h_f, (B, 1, 1, 1)), part_len=PART)
        return st, jnp.sum(y.reshape(B, C, 2, -1), axis=1)

    @jax.jit
    def step(state, x, irs_cur):
        return render(state, x, irs_cur)

    @jax.jit
    def step_fade(state, x, irs_old, irs_new):
        # reference crossfade: render both filter sets from the SAME
        # state, blend linearly over the block (sofa/imp.rs:129-167)
        _, y_old = render(state, x, irs_old)
        st, y_new = render(state, x, irs_new)
        ramp = jnp.linspace(0.0, 1.0, y_new.shape[-1])
        return st, y_old * (1 - ramp) + y_new * ramp

    def init(B):
        return upc_init((B * C, 1), IR_LEN, PART)

    return step, step_fade, init


def element_output(sofa_path, x, yaw_schedule):
    """The REAL sofalizer element through the same yaw schedule."""
    from gstpu.core.buffer import Buffer
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    el = make("sofalizer", sofa_location=sofa_path,
              block_length=BLOCK, partition_length=PART)
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, "
               f"channels={C}, layout=interleaved")
    outs = []
    for k, yaw in enumerate(yaw_schedule):
        el.rotation_yaw = yaw
        h.push(Buffer(x[k * BLOCK:(k + 1) * BLOCK],
                      pts=k * BLOCK * 1_000_000_000 // RATE))
        outs += h.pull_all()
    h.teardown()
    return np.concatenate([np.asarray(b.array).reshape(-1, 2)
                           for b in outs])


def main() -> None:
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp

    import gstpu
    gstpu.init()
    from gstpu.core.registry import make

    B = int(__import__("os").environ.get("GSTPU_SOFA_STREAMS", 48))
    rng = np.random.default_rng(0)
    sofa_path = make_sofa_file(rng)

    # selection oracle: the element's own nearest-measurement logic
    sel_el = make("sofalizer", sofa_location=sofa_path,
                  block_length=BLOCK)
    assert sel_el.start()
    irs_all = sel_el._irs.astype(np.float32)        # (M, 2, L)

    def sel_irs(yaw: float) -> np.ndarray:
        sel_el.rotation_yaw = yaw
        return irs_all[sel_el._select_irs(C)]       # (C, 2, L)

    step, step_fade, init = make_steps(irs_all)
    print("steps built", file=sys.stderr, flush=True)

    # ---- parity leg: element == kernel through a rotating schedule
    n_blk = 8
    yaw_schedule = [0.0] * 4 + [15.0] * 4           # fade at block 4
    x_par = (rng.standard_normal((n_blk * BLOCK, C)) * 0.3) \
        .astype(np.float32)
    el_out = element_output(sofa_path, x_par, yaw_schedule)
    hist = init(1)
    cur = sel_irs(0.0)
    outs = []
    for k, yaw in enumerate(yaw_schedule):
        new = sel_irs(yaw)
        xk = jnp.asarray(
            x_par[k * BLOCK:(k + 1) * BLOCK].T[None])
        if not np.array_equal(new, cur):
            hist, y = step_fade(hist, xk, jnp.asarray(cur),
                                jnp.asarray(new))
            cur = new
        else:
            hist, y = step(hist, xk, jnp.asarray(cur))
        outs.append(np.asarray(y)[0].T)
    ker = np.concatenate(outs)
    dmax = float(np.abs(ker - el_out).max())
    print(f"element vs bench kernel max|diff|: {dmax:.3e}",
          file=sys.stderr)
    assert dmax < 1e-5, dmax

    # ---- device-resident steady state with rotation every 16 blocks
    key = jax.random.PRNGKey(1)
    bank = [0.3 * jax.random.normal(jax.random.fold_in(key, i),
                                    (B, C, BLOCK), dtype=jnp.float32)
            for i in range(8)]
    for b in bank:
        b.block_until_ready()
    yaws = [15.0 * k for k in range(M)]             # full circle
    ir_bank = [jnp.asarray(sel_irs(y)) for y in yaws]
    for b in ir_bank:
        b.block_until_ready()
    hist = init(B)
    checksum = jax.jit(jnp.sum)
    t0 = time.perf_counter()
    hist, y = step(hist, bank[0], ir_bank[0])
    hist, y = step_fade(hist, bank[1], ir_bank[0], ir_bank[1])
    float(checksum(y))
    print(f"compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    for k in range(4):
        hist, y = step(hist, bank[k % 8], ir_bank[0])
    float(checksum(y))

    iters = 400
    t0 = time.perf_counter()
    rot = 0
    for i in range(iters):
        if i % ROT_EVERY == ROT_EVERY - 1:          # rotate + fade
            old = ir_bank[rot % M]
            rot += 1
            hist, y = step_fade(hist, bank[i % 8], old,
                                ir_bank[rot % M])
        else:
            hist, y = step(hist, bank[i % 8], ir_bank[rot % M])
    float(checksum(y))
    wall = time.perf_counter() - t0
    audio_s = B * iters * BLOCK / RATE
    rt = audio_s / wall
    print(json.dumps({
        "metric": f"realtime-multiple/chip, sofalizer SOFA binaural "
                  f"render ({B} streams x {C}ch 5.1 -> stereo, block "
                  f"{BLOCK}, IR {IR_LEN}, {RATE} Hz, listener "
                  f"rotation + crossfade every {ROT_EVERY} blocks; "
                  f"true 64-tap uniformly partitioned convolution, "
                  f"same kernel as the element; "
                  f"kernel vs element max|diff|={dmax:.1e})",
        "value": round(rt, 1), "unit": "x",
        "vs_baseline": round(rt / 100.0, 3)}))


if __name__ == "__main__":
    main()
