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
rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 256, (H, W, 4), dtype=np.uint8))

def sync(x): return float(jnp.sum(x[..., ::512, ::512, 0].astype(jnp.float32)))

hsv_j = jax.jit(lambda f: hsv_filter(f, *args))
lut_j = jax.jit(lambda f: apply_lut_3d_pallas(f, table, scale, offset))

hsvout = hsv_j(frame); sync(hsvout)
lutout = lut_j(hsvout); sync(lutout)

for name, fn, inp in (("hsv", hsv_j, frame), ("lut", lut_j, hsvout)):
    t0 = time.monotonic()
    outs = [fn(inp) for _ in range(30)]
    sync(outs[-1]); dt = time.monotonic() - t0
    print(f"{name}: {dt/30*1000:.2f} ms/frame ({30/dt:.1f} fps)", flush=True)
