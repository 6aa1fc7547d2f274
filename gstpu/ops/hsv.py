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
    return _rgb_planes_to_hsv(rgb_u8[..., 0], rgb_u8[..., 1],
                              rgb_u8[..., 2])


def _rgb_planes_to_hsv(r_u8, g_u8, b_u8):
    """Plane-level core of rgb_to_hsv: lets RGBA-native callers skip
    the (..., 3) channel gather (minor-dim u8 relayouts at 4K were
    the element-path bottleneck)."""
    r = r_u8.astype(jnp.float32) / 255.0
    g = g_u8.astype(jnp.float32) / 255.0
    b = b_u8.astype(jnp.float32) / 255.0
    value = jnp.maximum(jnp.maximum(r, g), b)
    chroma = value - jnp.minimum(jnp.minimum(r, g), b)
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
    return jnp.stack(_hsv_to_rgb_comps(h, s, v),
                     axis=-1).astype(jnp.uint8)


def _hsv_to_rgb_comps(h: jax.Array, s: jax.Array,
                      v: jax.Array) -> list:
    """hsv_to_rgb before the channel stack: three f32 planes in
    [0, 255] so RGBA-native callers can interleave alpha passthrough
    channels with ONE stack."""
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
    return [jnp.clip((chain(i) + m) * 255.0, 0.0, 255.0)
            for i in range(3)]


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


@partial(jax.jit, static_argnames=("rgb_idx",))
def hsv_filter_frame(frame_u8: jax.Array, rgb_idx: tuple,
                     hue_shift: jax.Array, sat_mul: jax.Array,
                     sat_off: jax.Array, val_mul: jax.Array,
                     val_off: jax.Array) -> jax.Array:
    """hsvfilter on a full (..., C) frame in its NATIVE channel
    order: the RGB planes at rgb_idx go through the hsv math,
    everything else (alpha / padding) passes through, and the output
    is assembled with a single channel stack.  Bit-identical to
    hsv_filter on the gathered (..., 3) view — same plane math, same
    truncating casts — but avoids two minor-dim-C u8 relayouts per
    frame, which at 4K were the difference between 15 and 70 ms."""
    ri, gi, bi = rgb_idx
    h, s, v = _rgb_planes_to_hsv(frame_u8[..., ri], frame_u8[..., gi],
                                 frame_u8[..., bi])
    h = jnp.mod(h + hue_shift, 360.0)
    h = jnp.where(h < 0.0, h + 360.0, h)
    s = jnp.clip(sat_mul * s + sat_off, 0.0, 1.0)
    v = jnp.clip(val_mul * v + val_off, 0.0, 1.0)
    comps = _hsv_to_rgb_comps(h, s, v)
    chans: list = [None] * frame_u8.shape[-1]
    chans[ri], chans[gi], chans[bi] = (
        c.astype(jnp.uint8) for c in comps)
    for c in range(len(chans)):
        if chans[c] is None:
            chans[c] = frame_u8[..., c]
    return jnp.stack(chans, axis=-1)


@partial(jax.jit, static_argnames=("rgb_idx", "out_idx"))
def hsv_detect_frame(frame_u8: jax.Array, rgb_idx: tuple,
                     out_idx: tuple, hue_ref: jax.Array,
                     hue_var: jax.Array, sat_ref: jax.Array,
                     sat_var: jax.Array, val_ref: jax.Array,
                     val_var: jax.Array) -> jax.Array:
    """hsvdetector on a full (..., C) frame in its native channel
    order: RGB planes at rgb_idx feed the HSV window match, the
    output frame is assembled at out_idx = (r, g, b, alpha) with a
    single channel stack (same relayout-avoidance as
    hsv_filter_frame)."""
    ri, gi, bi = rgb_idx
    h, s, v = _rgb_planes_to_hsv(frame_u8[..., ri], frame_u8[..., gi],
                                 frame_u8[..., bi])
    match = _hsv_match(h, s, v, hue_ref, hue_var, sat_ref, sat_var,
                       val_ref, val_var)
    alpha = jnp.where(match, jnp.uint8(255), jnp.uint8(0))
    ro, go, bo, ao = out_idx
    chans: list = [None] * 4
    chans[ro], chans[go], chans[bo] = (frame_u8[..., ri],
                                       frame_u8[..., gi],
                                       frame_u8[..., bi])
    chans[ao] = alpha
    return jnp.stack(chans, axis=-1)


@jax.jit
def hsv_detect(rgb_u8: jax.Array, hue_ref: jax.Array, hue_var: jax.Array,
               sat_ref: jax.Array, sat_var: jax.Array,
               val_ref: jax.Array, val_var: jax.Array) -> jax.Array:
    """hsvdetector match mask: 255 where the pixel is within the HSV
    key window (circular hue), else 0 (hsvdetector/imp.rs:130-161)."""
    h, s, v = rgb_to_hsv(rgb_u8)
    match = _hsv_match(h, s, v, hue_ref, hue_var, sat_ref, sat_var,
                       val_ref, val_var)
    return jnp.where(match, jnp.uint8(255), jnp.uint8(0))


def _hsv_match(h, s, v, hue_ref, hue_var, sat_ref, sat_var,
               val_ref, val_var):
    """Boolean HSV-window match on (h, s, v) planes — the shared
    core of hsv_detect / hsv_detect_frame."""
    shifted = h + (180.0 - hue_ref)
    shifted = jnp.where(shifted < 0.0, shifted + 360.0, shifted)
    shifted = jnp.mod(shifted, 360.0)
    return ((jnp.abs(shifted - 180.0) <= hue_var)
            & (jnp.abs(s - sat_ref) <= sat_var)
            & (jnp.abs(v - val_ref) <= val_var))
