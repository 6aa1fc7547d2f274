"""FFV1 prediction/context/residual field as one fused device pass.

This is the codec-internal parallel split SURVEY.md §2.8 P4 calls for
(the reference keeps codec internals inside wrapped CPU engines;
gstpu moves the data-parallel half onto the TPU): because FFV1 is
lossless, the decoder's reconstruction equals the source, so every
neighbor a sample's context and prediction depend on is known up
front and the whole per-frame field — 3-gradient quantized context,
median prediction, folded residual — computes as one jitted, fully
vectorized pass.  Only the inherently sequential adaptive range
coding stays on the host (native/gstpu_ffv1.cpp).

Bit-exactness contract: matches gstpu.codecs.ffv1.predict_plane
(numpy spec model) exactly; the combined encoder output is decoded
bit-exactly by libavcodec's ffv1 decoder (tests/test_ffv1enc.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("bits",))
def predict_fields(plane: jax.Array, q0: jax.Array, q1: jax.Array,
                   q2: jax.Array, bits: int = 8):
    """(H, W) uint8 plane -> (ctx int32 >= 0, diff int8 sign-folded).

    Border rules pinned against libavcodec (see codecs/ffv1.py):
    row 0 has t=tl=tr=0; l(0)=t(0); tl(0) = first sample two rows up;
    tr(last col) = t(last col).
    """
    p = plane.astype(jnp.int32)
    h, w = p.shape
    z_row = jnp.zeros((1, w), jnp.int32)
    up = jnp.concatenate([z_row, p[:-1]], axis=0)           # p[y-1, x]
    T = up
    RT = jnp.concatenate([up[:, 1:], up[:, -1:]], axis=1)   # p[y-1, x+1]
    L = jnp.concatenate([jnp.zeros((h, 1), jnp.int32), p[:, :-1]], axis=1)
    L = L.at[1:, 0].set(p[:-1, 0])                          # l(0) = t(0)
    LT = jnp.concatenate([jnp.zeros((h, 1), jnp.int32), up[:, :-1]], axis=1)
    LT = LT.at[2:, 0].set(p[:-2, 0])                        # tl(0) 2 rows up
    ctx = (jnp.take(q0, (L - LT) & 0xFF)
           + jnp.take(q1, (LT - T) & 0xFF)
           + jnp.take(q2, (T - RT) & 0xFF))
    sign = ctx < 0
    grad = L + T - LT
    pred = jnp.maximum(jnp.minimum(L, T),
                       jnp.minimum(jnp.maximum(L, T), grad))
    diff = p - pred
    diff = jnp.where(sign, -diff, diff)
    diff = ((diff + (1 << (bits - 1))) & ((1 << bits) - 1)) \
        - (1 << (bits - 1))
    # uint16 ctx: contexts fit 10 bits; halves the device->host bytes
    # vs int32 (the tunnel/PCIe transfer is the split's overhead)
    return jnp.abs(ctx).astype(jnp.uint16), diff.astype(jnp.int8)


# vmapped over a (B, H, W) stack with shared (unbatched) quant tables
predict_fields_batched = jax.jit(jax.vmap(
    lambda p, q0, q1, q2: predict_fields(p, q0, q1, q2),
    in_axes=(0, None, None, None)))


@partial(jax.jit, static_argnames=("bits",))
def predict_fields_packed(plane: jax.Array, q0: jax.Array, q1: jax.Array,
                          q2: jax.Array, bits: int = 8):
    """predict_fields with the context split to 2.25 bytes/px for the
    device->host hop: (diff int8 (H,W), ctx&0xFF uint8 (H,W), ctx>>8
    packed 4-per-byte uint8 (H, ceil(W/4))).  Contexts are <= 10 bits
    (666 for the default 8-bit quant tables), so 2 high bits suffice;
    the native coder (fe_encode_packed) reassembles them inline."""
    ctx, diff = predict_fields(plane, q0, q1, q2, bits=bits)
    lo = (ctx & 0xFF).astype(jnp.uint8)
    hi = (ctx >> 8).astype(jnp.uint8)
    pad = (-plane.shape[1]) % 4
    hi = jnp.pad(hi, ((0, 0), (0, pad)))
    h4 = hi.reshape(hi.shape[0], -1, 4)
    hip = (h4[..., 0] | (h4[..., 1] << 2)
           | (h4[..., 2] << 4) | (h4[..., 3] << 6)).astype(jnp.uint8)
    return diff, lo, hip


@partial(jax.jit, static_argnames=("w", "h", "bits"))
def predict_fields_i420(flat: jax.Array, q0: jax.Array, q1: jax.Array,
                        q2: jax.Array, w: int, h: int, bits: int = 8):
    """Whole-frame fused pass for a flat I420 buffer: all three
    planes' folded residuals as ONE (n,) int8 array.  One device
    dispatch + one download per frame instead of three — per-call
    link/RPC overhead is the dominant cost of the split on a
    host-mediated device link, so the hop count matters as much as
    the byte count."""
    cw, ch = -(-w // 2), -(-h // 2)
    y = flat[:w * h].reshape(h, w)
    u = flat[w * h:w * h + cw * ch].reshape(ch, cw)
    v = flat[w * h + cw * ch:w * h + 2 * cw * ch].reshape(ch, cw)
    parts = [predict_fields(p, q0, q1, q2, bits=bits)[1].reshape(-1)
             for p in (y, u, v)]
    return jnp.concatenate(parts)


class Predictor:
    """Per-resolution cached device pass for the ffv1enc element."""

    def __init__(self, quant):
        self.q = [jnp.asarray(np.asarray(t, np.int32)) for t in quant[:3]]

    def __call__(self, plane: np.ndarray):
        ctx, diff = predict_fields(jnp.asarray(plane), *self.q)
        return (np.asarray(ctx, dtype=np.uint16),
                np.asarray(diff, dtype=np.int8))

    def dispatch(self, plane: np.ndarray):
        """Async device dispatch: returns (ctx, diff) DEVICE arrays.
        Materialize with np.asarray (e.g. from a download thread) so
        the transfer overlaps the host range coder working on the
        previous frame."""
        return predict_fields(jnp.asarray(plane), *self.q)

    def dispatch_packed(self, plane: np.ndarray):
        """Async dispatch of the 2.25-bytes/px packed field layout
        (diff, ctx_lo, ctx_hi4) for fe_encode_packed."""
        return predict_fields_packed(jnp.asarray(plane), *self.q)

    def dispatch_diff(self, plane: np.ndarray):
        """Async dispatch of the minimal 1-byte/px hop: the folded
        residual only; fe_encode_from_plane re-derives contexts from
        the host-resident source plane."""
        return predict_fields(jnp.asarray(plane), *self.q)[1]

    def dispatch_diff_i420(self, flat, w: int, h: int):
        """Async dispatch of a whole flat I420 frame (device-resident
        or host) to one fused residual pass: one dispatch, one (n,)
        int8 download for all three planes."""
        return predict_fields_i420(jnp.asarray(flat), *self.q, w=w, h=h)

    def batched(self, planes: np.ndarray):
        ctx, diff = predict_fields_batched(jnp.asarray(planes), *self.q)
        return np.asarray(ctx, np.uint16), np.asarray(diff, np.int8)
