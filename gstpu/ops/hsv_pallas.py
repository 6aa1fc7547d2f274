"""Pallas TPU kernels for the HSV filter hot loop.

The per-pixel RGB->HSV->RGB adjust (gstpu/ops/hsv.py) as hand-tiled
Pallas kernels: planes tiled (8, 128) onto the VPU, uniforms in SMEM
so property changes never recompile. Two pallas_call stages
(RGB->adjusted-HSV, HSV->RGB): Mosaic fails to legalize the fused
single-kernel version, and the split costs one HBM round-trip that XLA
pipelines anyway. Bit-identical to the jnp reference path (same branch
cascade); the element uses Pallas on TPU, jnp elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8
TILE_COLS = 128
EPSILON = 1e-5


def _fmod(a, m):
    """Floored modulo (== jnp.mod for floats); jnp.mod's rem lowering
    trips a Mosaic legalization bug in multi-output kernels."""
    return a - m * jnp.floor(a / m)


def _rgb_to_hsv_adjust_tile(params_ref, r_ref, g_ref, b_ref,
                            h_ref, s_ref, v_ref):
    r = r_ref[:] * (1.0 / 255.0)
    g = g_ref[:] * (1.0 / 255.0)
    b = b_ref[:] * (1.0 / 255.0)

    value = jnp.maximum(jnp.maximum(r, g), b)
    chroma = value - jnp.minimum(jnp.minimum(r, g), b)
    safe = jnp.where(chroma == 0.0, 1.0, chroma)
    hue = jnp.where(
        chroma == 0.0, 0.0,
        jnp.where(jnp.abs(value - r) < EPSILON,
                  60.0 * ((g - b) / safe),
                  jnp.where(jnp.abs(value - g) < EPSILON,
                            60.0 * (2.0 + (b - r) / safe),
                            jnp.where(jnp.abs(value - b) < EPSILON,
                                      60.0 * (4.0 + (r - g) / safe),
                                      0.0))))
    hue = jnp.where(hue < 0.0, hue + 360.0, hue)
    hue = _fmod(hue, 360.0)
    sat = jnp.where(value == 0.0, 0.0,
                    chroma / jnp.where(value == 0.0, 1.0, value))
    sat = jnp.clip(sat, 0.0, 1.0)
    value = jnp.clip(value, 0.0, 1.0)

    hue = _fmod(hue + params_ref[0], 360.0)
    h_ref[:] = jnp.where(hue < 0.0, hue + 360.0, hue)
    s_ref[:] = jnp.clip(params_ref[1] * sat + params_ref[2], 0.0, 1.0)
    v_ref[:] = jnp.clip(params_ref[3] * value + params_ref[4], 0.0, 1.0)


def _hsv_to_rgb_tile(h_ref, s_ref, v_ref, ro_ref, go_ref, bo_ref):
    hue, sat, value = h_ref[:], s_ref[:], v_ref[:]
    c = value * sat
    hp = hue / 60.0
    x = c * (1.0 - jnp.abs(_fmod(hp, 2.0) - 1.0))
    zero = jnp.zeros_like(c)
    table = [(c, x, zero), (x, c, zero), (zero, c, x),
             (zero, x, c), (x, zero, c), (c, zero, x)]
    outs = []
    for comp in range(3):
        o = zero
        for i in reversed(range(6)):
            o = jnp.where(hp <= (i + 1.0), table[i][comp], o)
        o = jnp.where(hp < 0.0, zero, o)
        outs.append(jnp.clip((o + (value - c)) * 255.0, 0.0, 255.0))
    ro_ref[:] = outs[0]
    go_ref[:] = outs[1]
    bo_ref[:] = outs[2]


@partial(jax.jit, static_argnames=("interpret",))
def hsv_filter_planes(r: jax.Array, g: jax.Array, b: jax.Array,
                      params: jax.Array, *, interpret: bool = False):
    """r/g/b: (M, 128k) f32 planes with M % 8 == 0; params: (5,) f32
    [hue_shift, sat_mul, sat_off, val_mul, val_off]."""
    M, N = r.shape
    grid = (M // TILE_ROWS, N // TILE_COLS)
    spec = pl.BlockSpec((TILE_ROWS, TILE_COLS), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    shapes = tuple(jax.ShapeDtypeStruct((M, N), jnp.float32)
                   for _ in range(3))
    h, s, v = pl.pallas_call(
        _rgb_to_hsv_adjust_tile, grid=grid,
        in_specs=[pspec, spec, spec, spec],
        out_specs=(spec, spec, spec), out_shape=shapes,
        interpret=interpret)(params, r, g, b)
    return pl.pallas_call(
        _hsv_to_rgb_tile, grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec), out_shape=shapes,
        interpret=interpret)(h, s, v)


def hsv_filter_frame_pallas(rgb_u8, hue_shift, sat_mul, sat_off,
                            val_mul, val_off, interpret: bool = False):
    """(H, W, 3) uint8 -> same, via the Pallas kernels (pads to tile
    multiples)."""
    h, w = rgb_u8.shape[:2]
    n = h * w
    cols = TILE_COLS
    rows = -(-n // cols)
    rows_pad = -(-rows // TILE_ROWS) * TILE_ROWS
    total = rows_pad * cols

    flat = jnp.asarray(rgb_u8.reshape(-1, 3), jnp.float32)
    planes = [jnp.pad(flat[:, c], (0, total - n)).reshape(rows_pad, cols)
              for c in range(3)]
    params = jnp.asarray([hue_shift, sat_mul, sat_off, val_mul,
                          val_off], jnp.float32)
    ro, go, bo = hsv_filter_planes(planes[0], planes[1], planes[2],
                                   params, interpret=interpret)
    out = jnp.stack([ro.reshape(-1)[:n], go.reshape(-1)[:n],
                     bo.reshape(-1)[:n]], axis=-1)
    return out.astype(jnp.uint8).reshape(h, w, 3)
