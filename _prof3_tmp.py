import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from gstpu.ops.lut import identity_lut
from gstpu.ops import lut_pallas as LP

n = 17
TP = LP.TP
lut = identity_lut(size=17)
t3 = jnp.transpose(jnp.asarray(lut.table_3d), (0, 3, 1, 2)).reshape(3*n, n*n).astype(jnp.bfloat16)

def _lut_kernel_v2(n, xyz_ref, t3_ref, out_ref):
    xc = xyz_ref[0, 0:1, :]
    yc = xyz_ref[0, 1:2, :]
    zc = xyz_ref[0, 2:3, :]
    grid = jax.lax.broadcasted_iota(jnp.int32, (n, TP), 0).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xc - grid))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc - grid))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(zc - grid))
    v1 = (wy[:, None, :] * wx[None, :, :]).astype(jnp.bfloat16).reshape(n*n, TP)
    s = jax.lax.dot_general(t3_ref[:], v1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[0, :, :] = jnp.sum(s.reshape(n, 3, TP) * wz[:, None, :], axis=0)

@jax.jit
def kern_v2(xyz_t):
    nt = xyz_t.shape[0]
    return pl.pallas_call(
        partial(_lut_kernel_v2, n),
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
                  pl.BlockSpec((3*n, n*n), lambda i: (i*0, i*0))],
        out_specs=pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
        out_shape=jax.ShapeDtypeStruct((nt, 3, TP), jnp.float32),
    )(xyz_t, t3)

@jax.jit
def kern_v1(xyz_t):
    nt = xyz_t.shape[0]
    return pl.pallas_call(
        partial(LP._lut_kernel, n),
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
                  pl.BlockSpec((3*n, n*n), lambda i: (i*0, i*0))],
        out_specs=pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
        out_shape=jax.ShapeDtypeStruct((nt, 3, TP), jnp.float32),
    )(xyz_t, t3)

rng = np.random.default_rng(0)
NT = 8100
xt = jnp.asarray(rng.uniform(0, 16, (NT, 3, TP)).astype(np.float32))
def sync(x): return float(jnp.sum(jnp.ravel(x)[::65536]))

a = kern_v1(xt); sync(a)
b = kern_v2(xt); sync(b)
print("max abs diff:", float(jnp.max(jnp.abs(a - b))), flush=True)
for name, fn in (("v1", kern_v1), ("v2", kern_v2)):
    t0 = time.monotonic()
    outs = [fn(xt) for _ in range(30)]
    sync(outs[-1]); dt = time.monotonic() - t0
    print(f"{name}: {dt/30*1000:.2f} ms", flush=True)
