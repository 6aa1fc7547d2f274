"""Attribution experiment for VERDICT r4 ask #6: where do the
element-path's missing x go (130.5x vs the 166.3x ops ceiling)?

Measures, on the SAME live chip, 20-iteration steady-state loops of:
  A. ops exact-chain step (bench.py's kernel) at B=96  (the 166.3x config)
  B. ops exact-chain step at B=64                      (batch-size leg)
  C. element-runtime composed kernel at B=64, no pipeline machinery
     (the DeviceContext._fused step extracted after priming real
     parse_launch pipelines)
  D. element-runtime full path at B=64 = bench_batch.run_chain
     (run separately; pass its number via env for the summary)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import gstpu

gstpu.init()
import jax

jax.config.update("jax_enable_x64", True)
cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp
import numpy as np

ITERS = 20
FRAME = 19_200
C = 2


def make_banks(B, n_flat, n_bank=12):
    def mk(freq, key):
        t = jnp.arange(n_flat // C, dtype=jnp.float64) / 192_000.0
        base = (0.15 * jnp.sin(2 * jnp.pi * freq * t)
                + 0.05 * jnp.sin(2 * jnp.pi * 97.0 * t))
        sig = jnp.repeat(base[:, None], C, axis=1).reshape(-1)
        noise = 1e-3 * jax.random.normal(key, (B, n_flat),
                                         dtype=jnp.float64)
        return sig[None, :] + noise
    keys = jax.random.split(jax.random.PRNGKey(0), n_bank + 1)
    prime = mk(jnp.float64(440.0), keys[0])
    banks = [mk(jnp.float64(300.0 + 40 * k), keys[k + 1])
             for k in range(n_bank)]
    prime.block_until_ready()
    for b in banks:
        b.block_until_ready()
    return prime, banks


def ops_leg(B):
    from gstpu.parallel.chains import make_audiofx_exact_chain
    prime_f, step_f, init, n_prime, n_step = make_audiofx_exact_chain(
        channels=C, echo_delay=48_000 * C, max_delay=48_000 * C)
    x0, banks = make_banks(B, n_step)
    xp, _ = make_banks(B, n_prime, n_bank=1)
    inten, fb = jnp.float64(0.4), jnp.float64(0.3)
    state = init(B)
    state, out = prime_f(state, xp, inten, fb)
    out.block_until_ready()
    for k in range(6):
        state, out, meters = step_f(state, banks[k % 12], inten, fb)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, out, meters = step_f(state, banks[i % 12], inten, fb)
    out.block_until_ready()
    wall = time.perf_counter() - t0
    rt = B * ITERS * 0.1 / wall
    return dict(B=B, wall_s=round(wall, 4),
                ms_per_fire=round(1e3 * wall / ITERS, 2),
                rt=round(rt, 1))


def elem_kernel_leg(B):
    """Prime real pipelines, then drive the composed _fused step
    directly: pure device time of the element-composed kernel."""
    from gstpu import Buffer, State, parse_launch
    from gstpu.runtime.device_batch import DeviceContext, DeviceRow
    block = FRAME * C
    ctx_name = "attrib-chain"
    DeviceContext.release(ctx_name)
    ctx = DeviceContext.acquire(ctx_name, block, depth=2)
    caps = (f"audio/x-raw, format=F64LE, rate=192000, channels={C}, "
            f"layout=interleaved")
    pipes = [parse_launch(
        f'appsrc name=src caps="{caps}" ! '
        f'rsaudioecho delay=250000000 max-delay=250000000 '
        f'intensity=0.4 feedback=0.3 context={ctx_name} '
        f'context-block={block} ! '
        f'audioloudnorm context={ctx_name} ! '
        f'ebur128level context={ctx_name} mode=momentary,short-term ! '
        f'appsink name=sink') for _ in range(B)]
    for p in pipes:
        p.set_state(State.PLAYING)
    prime_bank, banks = make_banks(B, 30 * block, n_bank=1)
    _, banks = make_banks(B, block)
    for i, p in enumerate(pipes):
        p.get_by_name("src").push_buffer(
            Buffer(DeviceRow(prime_bank, i), pts=0))
        while p.iterate():
            pass
    ctx.flush_pending()
    step, prime, n_stages, _final = ctx._fused
    ids, states = ctx._batched
    uni_vals = tuple(tuple(c.members[j].spec["uniforms"]()
                           for c in ctx.chains)
                     for j in range(n_stages))

    def dev_uniform(vals):
        if len(set(vals)) == 1:
            return jnp.float64(vals[0])
        return jnp.asarray(np.asarray(vals, np.float64)[:, None])
    unis = tuple(tuple(dev_uniform(u) for u in zip(*uni_vals[j]))
                 for j in range(n_stages))
    for k in range(6):
        states, out, aux = step(states, banks[k % 12], unis)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        states, out, aux = step(states, banks[i % 12], unis)
    out.block_until_ready()
    wall = time.perf_counter() - t0
    # aux materialization cost (2 leaves, what consume_batch_aux pays)
    t0 = time.perf_counter()
    for i in range(ITERS):
        states, out, aux = step(states, banks[i % 12], unis)
        np.asarray(aux[2]["momentary"])
        np.asarray(aux[2]["shortterm"])
    out.block_until_ready()
    wall_aux = time.perf_counter() - t0
    for p in pipes:
        p.set_state(State.NULL)
    DeviceContext.release(ctx_name)
    rt = B * ITERS * 0.1 / wall
    return dict(B=B, wall_s=round(wall, 4),
                ms_per_fire=round(1e3 * wall / ITERS, 2),
                rt=round(rt, 1),
                rt_with_aux_reads=round(B * ITERS * 0.1 / wall_aux, 1))


def main():
    legs = {}
    legs["ops_B96"] = ops_leg(96)
    print("ops_B96", legs["ops_B96"], file=sys.stderr, flush=True)
    legs["ops_B64"] = ops_leg(64)
    print("ops_B64", legs["ops_B64"], file=sys.stderr, flush=True)
    legs["elem_kernel_B64"] = elem_kernel_leg(64)
    print("elem_kernel_B64", legs["elem_kernel_B64"], file=sys.stderr,
          flush=True)
    print(json.dumps(legs))


if __name__ == "__main__":
    main()
