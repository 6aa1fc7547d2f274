import time
import numpy as np
import jax, jax.numpy as jnp
from gstpu.ops.hsv import hsv_filter
from gstpu.ops.lut import identity_lut
from gstpu.ops.lut_pallas import apply_lut_3d_pallas

W, H = 3840, 2160
lut = identity_lut(size=17)
table = jnp.asarray(lut.table_3d); scale = jnp.asarray(lut.domain_scale); offset = jnp.asarray(lut.domain_offset)
args = (jnp.float32(12.0), jnp.float32(1.1), jnp.float32(0.0), jnp.float32(0.9), jnp.float32(0.02))

@jax.jit
def chain1(frame):
    out = hsv_filter(frame, *args)
    return apply_lut_3d_pallas(out, table, scale, offset)

@jax.jit
def chainN(frames):
    F = frames.shape[0]
    out = jax.vmap(lambda f: hsv_filter(f, *args))(frames)
    C = out.shape[-1]
    flat = out.reshape(F * H, W, C)
    res = apply_lut_3d_pallas(flat, table, scale, offset)
    return res.reshape(F, H, W, res.shape[-1])

rng = np.random.default_rng(0)
def sync(x): return float(jnp.sum(x[..., ::512, ::512, 0].astype(jnp.float32)))

f1 = jnp.asarray(rng.integers(0, 256, (H, W, 4), dtype=np.uint8))
sync(chain1(f1))
t0 = time.monotonic()
outs = [chain1(f1) for _ in range(30)]
sync(outs[-1]); dt = time.monotonic() - t0
print(f"single-frame: {30/dt:.1f} fps", flush=True)

for F in (2, 4, 8):
    fN = jnp.asarray(rng.integers(0, 256, (F, H, W, 4), dtype=np.uint8))
    sync(chainN(fN))
    t0 = time.monotonic()
    outs = [chainN(fN) for _ in range(15)]
    sync(outs[-1]); dt = time.monotonic() - t0
    print(f"batch F={F}: {15*F/dt:.1f} fps", flush=True)
