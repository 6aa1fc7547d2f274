import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from gstpu.ops.lut import identity_lut

n = 17
lut = identity_lut(size=17)
t3 = jnp.transpose(jnp.asarray(lut.table_3d), (0, 3, 1, 2)).reshape(3*n, n*n).astype(jnp.bfloat16)

def make_kern(TP):
    def _k(xyz_ref, t3_ref, out_ref):
        xc = xyz_ref[0, 0:1, :]
        yc = xyz_ref[0, 1:2, :]
        zc = xyz_ref[0, 2:3, :]
        grid = jax.lax.broadcasted_iota(jnp.int32, (n, TP), 0).astype(jnp.float32)
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(zc - grid))
        gy = jax.lax.broadcasted_iota(jnp.int32, (n, n, TP), 0).astype(jnp.float32)
        gx = jax.lax.broadcasted_iota(jnp.int32, (n, n, TP), 1).astype(jnp.float32)
        wyr = jnp.maximum(0.0, 1.0 - jnp.abs(yc[None] - gy))
        wxr = jnp.maximum(0.0, 1.0 - jnp.abs(xc[None] - gx))
        v1 = (wyr * wxr).astype(jnp.bfloat16).reshape(n*n, TP)
        s = jax.lax.dot_general(t3_ref[:], v1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0, :, :] = jnp.sum(s.reshape(n, 3, TP) * wz[:, None, :], axis=0)
    @jax.jit
    def kern(xyz_t):
        nt = xyz_t.shape[0]
        return pl.pallas_call(
            _k, grid=(nt,),
            in_specs=[pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
                      pl.BlockSpec((3*n, n*n), lambda i: (i*0, i*0))],
            out_specs=pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
            out_shape=jax.ShapeDtypeStruct((nt, 3, TP), jnp.float32),
        )(xyz_t, t3)
    return kern

NPIX = 3840 * 2160
rng = np.random.default_rng(0)
def sync(x): return float(jnp.sum(jnp.ravel(x)[::65536]))
for TP in (1024, 2048, 4096, 8192):
    NT = NPIX // TP
    xt = jnp.asarray(rng.uniform(0, 16, (NT, 3, TP)).astype(np.float32))
    k = make_kern(TP)
    try:
        sync(k(xt))
    except Exception as e:
        print(f"TP={TP}: compile failed {type(e).__name__}", flush=True)
        continue
    t0 = time.monotonic()
    outs = [k(xt) for _ in range(30)]
    sync(outs[-1]); dt = time.monotonic() - t0
    print(f"TP={TP}: {dt/30*1000:.2f} ms", flush=True)
