"""Color LUT kernels + .cube parser.

Re-implements the reference colorlut element's core
(video/colorlut/src/parser.rs + colorlut/imp.rs:203-540): Adobe .cube
1D/3D LUT parsing and per-pixel linear / trilinear sampling. The
sampling kernels are jitted JAX gathers over whole frames; the GPU
analogue in the reference is the D3D12 compute shader
(d3d12colorlut/shader.rs) — this is the TPU equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CubeLut:
    """Parsed .cube LUT. 1D: tables (3, N); 3D: table (N, N, N, 3)
    indexed [b, g, r] (red fastest in the file)."""

    domain_scale: np.ndarray  # (3,)
    domain_offset: np.ndarray  # (3,)
    table_1d: np.ndarray | None = None
    table_3d: np.ndarray | None = None

    @property
    def is_3d(self) -> bool:
        return self.table_3d is not None

    @property
    def size(self) -> int:
        return (self.table_3d.shape[0] if self.is_3d
                else self.table_1d.shape[1])


class CubeParseError(ValueError):
    pass


def parse_cube(text: str) -> CubeLut:
    """Parse Adobe .cube text (parser.rs:57-110 semantics)."""
    domain_min = np.zeros(3, np.float32)
    domain_max = np.ones(3, np.float32)
    size_1d = None
    size_3d = None
    values: list[list[float]] = []

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        key = parts[0].upper()
        if key == "TITLE":
            continue
        if key == "LUT_1D_SIZE":
            size_1d = int(parts[1])
        elif key == "LUT_3D_SIZE":
            size_3d = int(parts[1])
        elif key == "DOMAIN_MIN":
            domain_min = np.array([float(v) for v in parts[1:4]], np.float32)
        elif key == "DOMAIN_MAX":
            domain_max = np.array([float(v) for v in parts[1:4]], np.float32)
        else:
            try:
                values.append([float(v) for v in parts[:3]])
            except ValueError:
                raise CubeParseError(f"bad LUT line: {line!r}")

    if (size_1d is None) == (size_3d is None):
        raise CubeParseError("need exactly one of LUT_1D_SIZE/LUT_3D_SIZE")
    data = np.asarray(values, np.float32)
    rng = domain_max - domain_min
    if np.any(rng <= 0):
        raise CubeParseError("invalid domain")
    scale = 1.0 / rng
    offset = -domain_min / rng
    if size_1d is not None:
        if data.shape != (size_1d, 3):
            raise CubeParseError(
                f"expected {size_1d} 1D entries, got {data.shape[0]}")
        return CubeLut(scale, offset, table_1d=data.T.copy())
    n = size_3d
    if data.shape != (n ** 3, 3):
        raise CubeParseError(
            f"expected {n**3} 3D entries, got {data.shape[0]}")
    # file order: red fastest -> reshape to [b, g, r, 3]
    return CubeLut(scale, offset, table_3d=data.reshape(n, n, n, 3))


def identity_lut(size: int = 2, three_d: bool = True) -> CubeLut:
    g = np.linspace(0.0, 1.0, size, dtype=np.float32)
    if not three_d:
        return CubeLut(np.ones(3, np.float32), np.zeros(3, np.float32),
                       table_1d=np.stack([g, g, g]))
    b, gg, r = np.meshgrid(g, g, g, indexing="ij")
    table = np.stack([r, gg, b], axis=-1).astype(np.float32)
    return CubeLut(np.ones(3, np.float32), np.zeros(3, np.float32),
                   table_3d=table)


def _norm(v01: jax.Array, scale: jax.Array, offset: jax.Array) -> jax.Array:
    return jnp.clip(v01 * scale + offset, 0.0, 1.0)


def _round_half_up(x: jax.Array) -> jax.Array:
    # Rust f32::round() (half away from zero); inputs are >= 0 here
    return jnp.floor(x + 0.5)


@partial(jax.jit, static_argnames=("max_val",))
def apply_lut_1d(pix: jax.Array, table: jax.Array, scale: jax.Array,
                 offset: jax.Array, *, max_val: int = 255) -> jax.Array:
    """pix: (..., C>=3) uint; per-channel linear interpolation
    (imp.rs:482-492). Alpha (channel 3+) passes through."""
    n = table.shape[1]
    rgb = pix[..., :3].astype(jnp.float32) / max_val
    x = _norm(rgb, scale, offset) * (n - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
    x1 = jnp.minimum(x0 + 1, n - 1)
    t = x - x0.astype(jnp.float32)
    out = []
    for c in range(3):
        tab = table[c]
        v0 = tab[x0[..., c]]
        v1 = tab[x1[..., c]]
        out.append(v0 + (v1 - v0) * t[..., c])
    res = jnp.stack(out, axis=-1)
    res = _round_half_up(jnp.clip(res, 0.0, 1.0) * max_val)
    res = res.astype(pix.dtype)
    if pix.shape[-1] > 3:
        res = jnp.concatenate([res, pix[..., 3:]], axis=-1)
    return res


@partial(jax.jit, static_argnames=("max_val",))
def apply_lut_3d(pix: jax.Array, table: jax.Array, scale: jax.Array,
                 offset: jax.Array, *, max_val: int = 255) -> jax.Array:
    """pix: (..., C>=3) uint; trilinear 3D LUT sampling
    (imp.rs:493-527). table: (N, N, N, 3) indexed [b, g, r]."""
    n = table.shape[0]
    rgb = pix[..., :3].astype(jnp.float32) / max_val
    xyz = _norm(rgb, scale, offset) * (n - 1.0)
    i0 = jnp.clip(jnp.floor(xyz).astype(jnp.int32), 0, n - 1)
    i1 = jnp.minimum(i0 + 1, n - 1)
    t = xyz - i0.astype(jnp.float32)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]

    def at(xi, yi, zi):
        return table[zi, yi, xi]  # [b, g, r] layout

    c00 = at(x0, y0, z0) + (at(x1, y0, z0) - at(x0, y0, z0)) * tx
    c10 = at(x0, y1, z0) + (at(x1, y1, z0) - at(x0, y1, z0)) * tx
    c01 = at(x0, y0, z1) + (at(x1, y0, z1) - at(x0, y0, z1)) * tx
    c11 = at(x0, y1, z1) + (at(x1, y1, z1) - at(x0, y1, z1)) * tx
    c0 = c00 + (c10 - c00) * ty
    c1 = c01 + (c11 - c01) * ty
    res = c0 + (c1 - c0) * tz
    res = _round_half_up(jnp.clip(res, 0.0, 1.0) * max_val)
    res = res.astype(pix.dtype)
    if pix.shape[-1] > 3:
        res = jnp.concatenate([res, pix[..., 3:]], axis=-1)
    return res


def _lut3d_mm_tables(table: jax.Array, dtype=jnp.bfloat16):
    """(n,n,n,3) [z,y,x] -> T2[(y x), (z c)] for the MXU path."""
    n = table.shape[0]
    t2 = jnp.transpose(table, (1, 2, 0, 3)).reshape(n * n, n * 3)
    return t2.astype(dtype)


@partial(jax.jit, static_argnames=("max_val", "n_chunks", "precise"))
def apply_lut_3d_mm(pix: jax.Array, table: jax.Array, scale: jax.Array,
                    offset: jax.Array, *, max_val: int = 255,
                    n_chunks: int = 64,
                    precise: bool = False) -> jax.Array:
    """MXU trilinear 3D LUT: hat-basis weights per axis, the y*x
    outer product contracted against the table with one shared bf16
    matmul per pixel chunk, then the z axis reduced per pixel.

    The TPU-native reformulation of apply_lut_3d: XLA's gather costs
    ~3 ns/index (8 corner fetches -> ~0.5 s/4K frame); this runs the
    same interpolation as matmuls at ~30 fps/4K.  bf16 hat weights
    bound the error at 1 u8 LSB (measured 0.8% of pixels) — the same
    precision class as the reference's d3d12 GPU texture filtering.
    CPU tests keep the exact gather path.

    precise=True keeps the contraction in f32 (XLA runs it on the MXU
    as a multi-pass bf16 decomposition): required for 16-bit frames,
    where bf16's ~2^-9 relative error would be ~100 u16 LSBs.
    """
    n = table.shape[0]
    mm_dtype = jnp.float32 if precise else jnp.bfloat16
    t2 = _lut3d_mm_tables(table, mm_dtype)
    shape = pix.shape
    flat = pix.reshape(-1, shape[-1])
    npix = flat.shape[0]
    pad = (-npix) % n_chunks
    rgbf = jnp.pad(flat[:, :3], ((0, pad), (0, 0)))
    rgb = rgbf.astype(jnp.float32) / max_val
    xyz = jnp.clip(_norm(rgb, scale, offset), 0, 1) * (n - 1.0)

    def chunk(xc):
        grid = jnp.arange(n, dtype=jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xc[:, 0:1] - grid))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(xc[:, 1:2] - grid))
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(xc[:, 2:3] - grid))
        v1 = (wy[:, :, None] * wx[:, None, :]).reshape(-1, n * n)
        # TPU f32 matmuls default to bf16 passes: the precise path
        # must pin HIGHEST or the f32 cast buys nothing on device.
        prec = (jax.lax.Precision.HIGHEST if precise
                else jax.lax.Precision.DEFAULT)
        s = jnp.matmul(v1.astype(mm_dtype), t2,
                       precision=prec).astype(jnp.float32)
        return jnp.sum(wz[:, :, None] * s.reshape(-1, n, 3), axis=1)

    out = jax.lax.map(chunk,
                      xyz.reshape(n_chunks, -1, 3)).reshape(-1, 3)
    out = out[:npix]
    res = _round_half_up(jnp.clip(out, 0.0, 1.0) * max_val)
    res = res.astype(pix.dtype)
    if shape[-1] > 3:
        res = jnp.concatenate([res, flat[:, 3:]], axis=-1)
    return res.reshape(shape)
