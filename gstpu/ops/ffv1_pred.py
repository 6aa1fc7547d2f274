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

Lowering note (measured on the dev TPU link): a 256-entry `jnp.take`
over a 2-Mpx plane costs ~25 ms and an `.at[col].set` scatter ~24 ms,
while elementwise ops on the same plane are ~0.1 ms.  FFV1's quant
tables are monotone staircases over the signed byte difference, so
each lookup compiles to a static sum of compares (exactly equal to
the gather by construction), and the column-0 border fixups are
`where` masks.  That turns a ~100 ms/frame pass into ~1 ms, which is
what lets the device round hide completely under the host range
coder.  Non-monotone (custom) tables fall back to the gather form.

Bit-exactness contract: matches gstpu.codecs.ffv1.predict_plane
(numpy spec model) exactly; the combined encoder output is decoded
bit-exactly by libavcodec's ffv1 decoder (tests/test_ffv1enc.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp


def staircase(table):
    """Decompose a 256-entry byte-indexed quant table into
    (base, thresholds, steps) over the signed difference d8 in
    [-128, 127] (the byte index is d & 0xFF, i.e. two's complement),
    so that  table[d & 0xFF] == base + sum_i steps[i] * (d8 >= ts[i]).
    Returns None if the table is not a monotone staircase.
    Memoized per table contents (a per-frame host cost otherwise if
    callers loop over the back-compat `predict_fields` entry)."""
    return _staircase_cached(np.asarray(table, np.int64).tobytes())


@lru_cache(maxsize=64)
def _staircase_cached(tab_bytes: bytes):
    tab = np.frombuffer(tab_bytes, np.int64)[np.arange(-128, 128) & 0xFF]
    d = np.diff(tab)
    if (d < 0).any():
        return None
    idx = np.nonzero(d)[0]
    ts = tuple(int(v) for v in np.arange(-128, 128)[idx + 1])
    steps = tuple(int(v) for v in d[idx])
    return (int(tab[0]), ts, steps)


def pack_ctx_hi4(ctx):
    """Split a uint16 context field into the 2.25-bytes/px hop layout
    used by fe_encode_packed: (ctx & 0xFF uint8 (H,W), high 2 bits
    packed 4-per-byte uint8 (H, ceil(W/4))).  Contexts are <= 10 bits
    (666 for the default 8-bit quant tables), so 2 high bits
    suffice."""
    lo = (ctx & 0xFF).astype(jnp.uint8)
    hi = (ctx >> 8).astype(jnp.uint8)
    pad = (-ctx.shape[1]) % 4
    hi = jnp.pad(hi, ((0, 0), (0, pad)))
    h4 = hi.reshape(hi.shape[0], -1, 4)
    hip = (h4[..., 0] | (h4[..., 1] << 2)
           | (h4[..., 2] << 4) | (h4[..., 3] << 6)).astype(jnp.uint8)
    return lo, hip


def _neighbors(p):
    """(H, W) int32 -> (L, T, LT, RT) with FFV1's border rules, all
    as elementwise shift/where ops (no scatters).

    Border rules pinned against libavcodec (see codecs/ffv1.py):
    row 0 has t=tl=tr=0; l(0)=t(0); tl(0) = first sample two rows up;
    tr(last col) = t(last col)."""
    h, w = p.shape
    up = jnp.pad(p, ((1, 0), (0, 0)))[:h]            # p[y-1, x]
    up2 = jnp.pad(p, ((2, 0), (0, 0)))[:h]           # p[y-2, x]
    RT = jnp.concatenate([up[:, 1:], up[:, -1:]], axis=1)
    Ls = jnp.pad(p, ((0, 0), (1, 0)))[:, :w]
    LTs = jnp.pad(up, ((0, 0), (1, 0)))[:, :w]
    col0 = (jnp.arange(w) == 0)[None, :]
    L = jnp.where(col0, up, Ls)                      # l(0) = t(0)
    LT = jnp.where(col0, up2, LTs)                   # tl(0) 2 rows up
    return L, up, LT, RT


def _qmap(d, stair):
    """table[d & 0xFF] as a static compare-sum (see `staircase`)."""
    base, ts, steps = stair
    d8 = ((d + 128) & 0xFF) - 128
    acc = jnp.full(d.shape, base, jnp.int32)
    for t, s in zip(ts, steps):
        acc = acc + jnp.where(d8 >= t, jnp.int32(s), jnp.int32(0))
    return acc


def _fields_from_ctx(p, ctx, L, T, LT, bits):
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


@partial(jax.jit, static_argnames=("stair", "bits"))
def predict_fields_stair(plane: jax.Array, stair, bits: int = 8):
    """(H, W) uint8 plane -> (ctx uint16 >= 0, diff int8 sign-folded)
    with the quant lookup as static compare-sums (`stair` is the
    3-tuple of `staircase()` decompositions — hashable, so it is a
    compile-time constant)."""
    p = plane.astype(jnp.int32)
    L, T, LT, RT = _neighbors(p)
    ctx = _qmap(L - LT, stair[0]) + _qmap(LT - T, stair[1]) \
        + _qmap(T - RT, stair[2])
    return _fields_from_ctx(p, ctx, L, T, LT, bits)


@partial(jax.jit, static_argnames=("bits",))
def predict_fields_gather(plane: jax.Array, q0: jax.Array, q1: jax.Array,
                          q2: jax.Array, bits: int = 8):
    """Gather-form fallback for non-staircase (custom) quant tables.
    Bit-identical to predict_fields_stair where both apply."""
    p = plane.astype(jnp.int32)
    L, T, LT, RT = _neighbors(p)
    ctx = (jnp.take(q0, (L - LT) & 0xFF)
           + jnp.take(q1, (LT - T) & 0xFF)
           + jnp.take(q2, (T - RT) & 0xFF))
    return _fields_from_ctx(p, ctx, L, T, LT, bits)


def predict_fields(plane, q0, q1, q2, bits: int = 8):
    """Back-compat entry: picks the staircase lowering when the
    tables allow it (the spec's default tables do)."""
    stair = tuple(staircase(np.asarray(q)) for q in (q0, q1, q2))
    if all(s is not None for s in stair):
        return predict_fields_stair(jnp.asarray(plane), stair, bits=bits)
    return predict_fields_gather(jnp.asarray(plane), jnp.asarray(q0),
                                 jnp.asarray(q1), jnp.asarray(q2),
                                 bits=bits)


@partial(jax.jit, static_argnames=("stair", "bits"))
def predict_fields_batched_stair(planes, stair, bits: int = 8):
    return jax.vmap(
        lambda p: predict_fields_stair(p, stair, bits=bits))(planes)


@partial(jax.jit, static_argnames=("stair", "bits"))
def predict_fields_packed_stair(plane, stair, bits: int = 8):
    """predict_fields with the context split to 2.25 bytes/px for the
    device->host hop: (diff int8 (H,W), ctx&0xFF uint8 (H,W), ctx>>8
    packed 4-per-byte uint8 (H, ceil(W/4))).  Contexts are <= 10 bits
    (666 for the default 8-bit quant tables), so 2 high bits suffice;
    the native coder (fe_encode_packed) reassembles them inline."""
    ctx, diff = predict_fields_stair(plane, stair, bits=bits)
    lo, hip = pack_ctx_hi4(ctx)
    return diff, lo, hip


@partial(jax.jit, static_argnames=("stair", "w", "h", "bits"))
def predict_fields_i420_stair(flat: jax.Array, stair, w: int, h: int,
                              bits: int = 8):
    """Whole-frame fused pass for a flat I420 buffer: all three
    planes' folded residuals as ONE (n,) int8 array.  One device
    dispatch + one download per frame instead of three — per-call
    link/RPC overhead is a real cost of the split on a host-mediated
    device link, so the hop count matters as much as the byte count."""
    cw, ch = -(-w // 2), -(-h // 2)
    y = flat[:w * h].reshape(h, w)
    u = flat[w * h:w * h + cw * ch].reshape(ch, cw)
    v = flat[w * h + cw * ch:w * h + 2 * cw * ch].reshape(ch, cw)
    parts = [predict_fields_stair(p, stair, bits=bits)[1].reshape(-1)
             for p in (y, u, v)]
    return jnp.concatenate(parts)


class Predictor:
    """Per-resolution cached device pass for the ffv1enc element."""

    def __init__(self, quant):
        self.q = [jnp.asarray(np.asarray(t, np.int32)) for t in quant[:3]]
        stair = tuple(staircase(t) for t in quant[:3])
        self.stair = stair if all(s is not None for s in stair) else None

    def __call__(self, plane: np.ndarray):
        ctx, diff = self._fields(jnp.asarray(plane))
        return (np.asarray(ctx, dtype=np.uint16),
                np.asarray(diff, dtype=np.int8))

    def _fields(self, plane):
        if self.stair is not None:
            return predict_fields_stair(plane, self.stair)
        return predict_fields_gather(plane, *self.q)

    def dispatch(self, plane: np.ndarray):
        """Async device dispatch: returns (ctx, diff) DEVICE arrays.
        Materialize with np.asarray (e.g. from a download thread) so
        the transfer overlaps the host range coder working on the
        previous frame."""
        return self._fields(jnp.asarray(plane))

    def dispatch_packed(self, plane: np.ndarray):
        """Async dispatch of the 2.25-bytes/px packed field layout
        (diff, ctx_lo, ctx_hi4) for fe_encode_packed."""
        if self.stair is not None:
            return predict_fields_packed_stair(jnp.asarray(plane),
                                               self.stair)
        ctx, diff = predict_fields_gather(jnp.asarray(plane), *self.q)
        lo, hip = pack_ctx_hi4(ctx)
        return diff, lo, hip

    def dispatch_diff(self, plane: np.ndarray):
        """Async dispatch of the minimal 1-byte/px hop: the folded
        residual only; fe_encode_from_plane re-derives contexts from
        the host-resident source plane."""
        return self._fields(jnp.asarray(plane))[1]

    def dispatch_diff_i420(self, flat, w: int, h: int):
        """Async dispatch of a whole flat I420 frame (device-resident
        or host) to one fused residual pass: one dispatch, one (n,)
        int8 download for all three planes."""
        if self.stair is not None:
            return predict_fields_i420_stair(jnp.asarray(flat),
                                             self.stair, w=w, h=h)
        return _i420_gather(jnp.asarray(flat), *self.q, w=w, h=h)

    def batched(self, planes: np.ndarray):
        if self.stair is not None:
            ctx, diff = predict_fields_batched_stair(
                jnp.asarray(planes), self.stair)
        else:
            ctx, diff = jax.vmap(
                lambda p: predict_fields_gather(p, *self.q))(
                    jnp.asarray(planes))
        return np.asarray(ctx, np.uint16), np.asarray(diff, np.int8)


@partial(jax.jit, static_argnames=("w", "h", "bits"))
def _i420_gather(flat, q0, q1, q2, w: int, h: int, bits: int = 8):
    cw, ch = -(-w // 2), -(-h // 2)
    y = flat[:w * h].reshape(h, w)
    u = flat[w * h:w * h + cw * ch].reshape(ch, cw)
    v = flat[w * h + cw * ch:w * h + 2 * cw * ch].reshape(ch, cw)
    parts = [predict_fields_gather(p, q0, q1, q2, bits=bits)[1]
             .reshape(-1) for p in (y, u, v)]
    return jnp.concatenate(parts)
