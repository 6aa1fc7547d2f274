import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from gstpu.ops.lut import identity_lut
from gstpu.ops import lut_pallas as LP

W, H = 3840, 2160
lut = identity_lut(size=17)
table = jnp.asarray(lut.table_3d); scale = jnp.asarray(lut.domain_scale); offset = jnp.asarray(lut.domain_offset)
rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 256, (H, W, 4), dtype=np.uint8))
n = 17
TP = LP.TP

@jax.jit
def prep(pix):
    shape = pix.shape
    flat = pix.reshape(-1, shape[-1])
    npix = flat.shape[0]
    pad = (-npix) % TP
    rgb = jnp.pad(flat[:, :3], ((0, pad), (0, 0)))
    rgbf = rgb.astype(jnp.float32) / 255
    xyz = jnp.clip(rgbf * scale + offset, 0.0, 1.0) * (n - 1.0)
    return xyz.T.reshape(3, -1, TP).transpose(1, 0, 2)

t3 = jnp.transpose(jnp.asarray(lut.table_3d), (0, 3, 1, 2)).reshape(3*n, n*n).astype(jnp.bfloat16)

@jax.jit
def kern(xyz_t):
    nt = xyz_t.shape[0]
    return pl.pallas_call(
        partial(LP._lut_kernel, n),
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
                  pl.BlockSpec((3*n, n*n), lambda i: (i*0, i*0))],
        out_specs=pl.BlockSpec((1, 3, TP), lambda i: (i, i*0, i*0)),
        out_shape=jax.ShapeDtypeStruct((nt, 3, TP), jnp.float32),
    )(xyz_t, t3)

@jax.jit
def post(out_t, pix):
    shape = pix.shape
    flat = pix.reshape(-1, shape[-1])
    npix = flat.shape[0]
    res = out_t.transpose(1, 0, 2).reshape(3, -1).T[:npix]
    res = jnp.floor(jnp.clip(res, 0.0, 1.0) * 255 + 0.5).astype(pix.dtype)
    res = jnp.concatenate([res, flat[:, 3:]], axis=-1)
    return res.reshape(shape)

def sync(x): return float(jnp.sum(jnp.ravel(x)[::65536].astype(jnp.float32)))

xt = prep(frame); sync(xt)
ot = kern(xt); sync(ot)
fin = post(ot, frame); sync(fin)
for name, fn, inp in (("prep", prep, frame), ("kern", kern, xt), ("post", lambda o: post(o, frame), ot)):
    t0 = time.monotonic()
    outs = [fn(inp) for _ in range(30)]
    sync(outs[-1]); dt = time.monotonic() - t0
    print(f"{name}: {dt/30*1000:.2f} ms", flush=True)
