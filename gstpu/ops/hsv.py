"""HSV conversion + filter/detector kernels.

Vectorized re-implementation of the reference's per-pixel HSV math
(video/hsv/src/hsvutils.rs:40-201, hsvfilter/imp.rs:76-127,
hsvdetector/imp.rs:100-161) as jitted JAX ops over whole frames.
f32 math, same branch structure and rounding (truncating u8 casts) for
pixel-exact parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPSILON = 1e-5


def rgb_to_hsv(rgb_u8: jax.Array):
    """(..., 3) uint8 -> (h, s, v) f32 arrays (hsvutils::from_rgb)."""
    f = rgb_u8.astype(jnp.float32) / 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    value = jnp.max(f, axis=-1)
    chroma = value - jnp.min(f, axis=-1)
    # stop fusion from recomputing the max/min reductions inside
    # every branch of the hue selection below (see hsv_to_rgb)
    r, g, b, value, chroma = jax.lax.optimization_barrier(
        (r, g, b, value, chroma))

    safe = jnp.where(chroma == 0.0, 1.0, chroma)
    h_r = 60.0 * ((g - b) / safe)
    h_g = 60.0 * (2.0 + (b - r) / safe)
    h_b = 60.0 * (4.0 + (r - g) / safe)
    hue = jnp.where(
        chroma == 0.0, 0.0,
        jnp.where(jnp.abs(value - r) < EPSILON, h_r,
                  jnp.where(jnp.abs(value - g) < EPSILON, h_g,
                            jnp.where(jnp.abs(value - b) < EPSILON, h_b,
                                      0.0))))
    hue = jnp.where(hue < 0.0, hue + 360.0, hue)
    hue = jnp.mod(hue, 360.0)
    hue = jax.lax.optimization_barrier(hue)
    sat = jnp.where(value == 0.0, 0.0, chroma / jnp.where(value == 0.0, 1.0,
                                                          value))
    return hue, jnp.clip(sat, 0.0, 1.0), jnp.clip(value, 0.0, 1.0)


def hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    """(h, s, v) f32 -> (..., 3) uint8 (hsvutils::to_rgb; truncating
    casts like Rust `as u8`)."""
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    # materialize the selector inputs: without this barrier XLA's
    # fusion clones the entire upstream graph into every branch of
    # the 6-deep where cascade below (x3 components), a ~36x
    # recompute that took the 4K chain from ~150 fps to ~6 fps
    c, hp, x, v = jax.lax.optimization_barrier((c, hp, x, v))
    zero = jnp.zeros_like(c)

    # cascade exactly like the reference's if/else-if chain
    def chain(comp_idx):
        table = [
            (c, x, zero), (x, c, zero), (zero, c, x),
            (zero, x, c), (x, zero, c), (c, zero, x),
        ]
        out = zero  # hp > 6 or hp < 0
        for i in reversed(range(6)):
            out = jnp.where(hp <= (i + 1.0), table[i][comp_idx], out)
        return jnp.where(hp < 0.0, zero, out)

    m = v - c
    comps = [jnp.clip((chain(i) + m) * 255.0, 0.0, 255.0) for i in range(3)]
    return jnp.stack(comps, axis=-1).astype(jnp.uint8)


@jax.jit
def hsv_filter(rgb_u8: jax.Array, hue_shift: jax.Array,
               sat_mul: jax.Array, sat_off: jax.Array,
               val_mul: jax.Array, val_off: jax.Array) -> jax.Array:
    """hsvfilter transform: shift hue, scale/offset S and V
    (hsvfilter/imp.rs:96-127). Uniform params — no recompile on
    property change."""
    h, s, v = rgb_to_hsv(rgb_u8)
    h = jnp.mod(h + hue_shift, 360.0)
    h = jnp.where(h < 0.0, h + 360.0, h)
    s = jnp.clip(sat_mul * s + sat_off, 0.0, 1.0)
    v = jnp.clip(val_mul * v + val_off, 0.0, 1.0)
    return hsv_to_rgb(h, s, v)


@jax.jit
def hsv_detect(rgb_u8: jax.Array, hue_ref: jax.Array, hue_var: jax.Array,
               sat_ref: jax.Array, sat_var: jax.Array,
               val_ref: jax.Array, val_var: jax.Array) -> jax.Array:
    """hsvdetector match mask: 255 where the pixel is within the HSV
    key window (circular hue), else 0 (hsvdetector/imp.rs:130-161)."""
    h, s, v = rgb_to_hsv(rgb_u8)
    shifted = h + (180.0 - hue_ref)
    shifted = jnp.where(shifted < 0.0, shifted + 360.0, shifted)
    shifted = jnp.mod(shifted, 360.0)
    match = ((jnp.abs(shifted - 180.0) <= hue_var)
             & (jnp.abs(s - sat_ref) <= sat_var)
             & (jnp.abs(v - val_ref) <= val_var))
    return jnp.where(match, jnp.uint8(255), jnp.uint8(0))
