"""Device-side AV1 intra analysis: the encoder's transform/quantize
compute as one fused TPU pass.

BASELINE config #5 pairs audiornnoise with `rav1enc` 1080p intra.  AV1
*entropy coding* is env-gated at the literal-data level in this image:
a from-spec bitstream writer needs the default CDF tables (AV1 spec
§9.4 — thousands of normative uint16 constants), which exist here only
inside stripped binaries (libdav1d/libaom export no table symbols, no
debug packages).  The compute that CAN ride the TPU — per-block intra
prediction, the forward transform, quantization, and the rate
estimate built from them — is exactly what this pass runs, batched
over every 8x8 block of a frame in one dispatch:

* intra mode decision: AV1 DC_PRED / H_PRED / V_PRED from the row
  above and column left (source-pixel approximation, the standard
  encoder-lookahead simplification), best-of-3 by SAD;
* forward 8x8 DCT-II of the chosen-mode residual (two 8x8 matmuls per
  block -> MXU-friendly einsum over all blocks at once);
* quantization at a GRID of quantizer steps + a bits proxy per step
  (sign + magnitude-log2 cost, the standard rate model), yielding a
  per-frame rate curve bits(q).

The host engine (rav1e/SVT-AV1/libaom through the native shim) owns
conformance; this pass owns the rate decision: `rav1enc
rc-mode=device` fits the curve against the target bitrate and steers
the engine's quantizer closed-loop (a multiplicative correction from
observed bits absorbs the proxy's scale error, so no literal AV1
qindex tables are needed).  Reference anchor:
video/rav1e/src/rav1enc/imp.rs:788 (bitrate property) and SURVEY.md
§2.8 P4 (codec-internal split, proven end-to-end by ffv1enc).
"""

from __future__ import annotations

import math

import numpy as np

BLOCK = 8

# quantizer-step grid: an exponential ladder covering crf 0..63
# territory.  Absolute scale is irrelevant (closed-loop corrected);
# only monotone coverage matters.
N_Q = 16
Q_GRID = np.asarray([0.5 * 2.0 ** (i / 2.0) for i in range(N_Q)],
                    np.float32)                     # 0.5 .. ~91


def _dct_matrix(n: int = BLOCK) -> np.ndarray:
    k = np.arange(n)
    D = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    D *= np.sqrt(2.0 / n)
    D[0] *= 1.0 / np.sqrt(2.0)
    return D.astype(np.float32)


def make_intra_analyzer(height: int, width: int):
    """Build `analyze(y_plane (H, W) uint8) -> (bits (N_Q,) f32,
    mode_counts (3,) i32, mean_step_bits...)`, jitted for one frame
    size.  H and W must be multiples of 8 (1080p is).  Returns device
    arrays; callers fetch lazily."""
    import jax
    import jax.numpy as jnp

    if height % BLOCK or width % BLOCK:
        raise ValueError(f"plane {width}x{height} not /{BLOCK}")
    by, bx = height // BLOCK, width // BLOCK
    D = jnp.asarray(_dct_matrix())
    qg = jnp.asarray(Q_GRID)

    @jax.jit
    def analyze(y):
        x = y.astype(jnp.float32)
        # blocks (by, bx, 8, 8)
        blk = x.reshape(by, BLOCK, bx, BLOCK).transpose(0, 2, 1, 3)
        # neighbor row above / column left of each block (source
        # pixels; frame edges use the AV1 missing-neighbor constant)
        above = jnp.concatenate(
            [jnp.full((1, width), 128.0, jnp.float32),
             x[BLOCK - 1::BLOCK][:-1]], axis=0)     # (by, W)
        above = above.reshape(by, bx, BLOCK)        # row per block
        left = jnp.concatenate(
            [jnp.full((height, 1), 129.0, jnp.float32),
             x[:, BLOCK - 1::BLOCK][:, :-1]], axis=1)
        left = left.reshape(by, BLOCK, bx).transpose(0, 2, 1)
        dc = (jnp.mean(above, -1) + jnp.mean(left, -1))[..., None,
                                                        None] * 0.5
        pred_dc = jnp.broadcast_to(dc, blk.shape)
        pred_v = jnp.broadcast_to(above[:, :, None, :], blk.shape)
        pred_h = jnp.broadcast_to(left[:, :, :, None], blk.shape)
        preds = jnp.stack([pred_dc, pred_v, pred_h])  # (3, by, bx, 8, 8)
        sad = jnp.sum(jnp.abs(blk[None] - preds), axis=(-1, -2))
        mode = jnp.argmin(sad, axis=0)              # (by, bx)
        mode_counts = jnp.sum(
            jax.nn.one_hot(mode, 3, dtype=jnp.int32), axis=(0, 1))
        res = blk - jnp.take_along_axis(
            preds, mode[None, :, :, None, None], 0)[0]
        # forward 8x8 DCT-II of every residual block: D @ R @ D.T
        coef = jnp.einsum("ij,bcjk,lk->bcil", D, res, D)
        # quantize on the grid; bits proxy per level:
        #   nonzero flag (sign+eob overhead) + log2 magnitude
        a = jnp.abs(coef)[None] / qg[:, None, None, None, None]
        lvl = jnp.floor(a + 0.5)                    # dead-zone-less
        nz = lvl > 0
        bits = jnp.sum(jnp.where(nz, 2.0 + jnp.log2(1.0 + lvl), 0.0),
                       axis=(1, 2, 3, 4))           # (N_Q,)
        return bits, mode_counts

    return analyze


def make_intra_transform(height: int, width: int):
    """Full device transform pass for `rav1enc device-transform=true`
    (the restricted device-intra profile, SURVEY.md §2.8 P4 applied to
    AV1 the same way ffv1enc applies it): for every 8x8 block of all
    three I420 planes, the TPU performs

      * intra mode decision (DC/H/V from the row above / column left,
        source-pixel neighbors — the profile's defined semantics; the
        bitstream layer below carries conformance),
      * the forward 8x8 DCT-II of the chosen-mode residual,
      * uniform quantization at the traced scalar `qstep`,
      * dequantization + inverse DCT + clipped reconstruction,

    in ONE jitted dispatch, returning the reconstructed planes and a
    bits proxy.  The host engine then encodes the reconstruction
    LOSSLESSLY (libaom lossless=1, conformant AV1, decodes under
    libdav1d) — i.e. it serves as the entropy/bitstream layer for the
    device's transform+quant decisions, which is the closest
    conformant split available in this image: a from-scratch AV1
    coefficient coder needs the spec §9.4 default CDF tables, literal
    data that exists here only inside stripped binaries (the same
    env-gate class as raptorq's RFC 6330 generator tables).  The
    decoded output of the emitted bits is EXACTLY the device
    reconstruction — every lossy decision in the stream was made by
    the TPU transform+quant (tested in
    tests/test_av1_device_transform.py).  Reference anchor:
    video/rav1e/src/rav1enc/imp.rs:757-788.

    Returns encode(y, u, v, qstep) -> (ry, ru, rv, bits) with planes
    uint8 of the I420 geometry for (height, width); non-/8 plane dims
    are edge-padded in-graph and cropped back.
    """
    import jax
    import jax.numpy as jnp

    D = jnp.asarray(_dct_matrix())

    def plane_pass(x_u8, qstep):
        H, W = x_u8.shape
        ph, pw = (-H) % BLOCK, (-W) % BLOCK
        x = jnp.pad(x_u8.astype(jnp.float32), ((0, ph), (0, pw)),
                    mode="edge")
        Hp, Wp = H + ph, W + pw
        by, bx = Hp // BLOCK, Wp // BLOCK
        blk = x.reshape(by, BLOCK, bx, BLOCK).transpose(0, 2, 1, 3)
        above = jnp.concatenate(
            [jnp.full((1, Wp), 128.0, jnp.float32),
             x[BLOCK - 1::BLOCK][:-1]], axis=0).reshape(by, bx, BLOCK)
        left = jnp.concatenate(
            [jnp.full((Hp, 1), 129.0, jnp.float32),
             x[:, BLOCK - 1::BLOCK][:, :-1]], axis=1)
        left = left.reshape(by, BLOCK, bx).transpose(0, 2, 1)
        dc = (jnp.mean(above, -1) + jnp.mean(left, -1))[..., None,
                                                        None] * 0.5
        preds = jnp.stack([jnp.broadcast_to(dc, blk.shape),
                           jnp.broadcast_to(above[:, :, None, :],
                                            blk.shape),
                           jnp.broadcast_to(left[:, :, :, None],
                                            blk.shape)])
        sad = jnp.sum(jnp.abs(blk[None] - preds), axis=(-1, -2))
        mode = jnp.argmin(sad, axis=0)
        pred = jnp.take_along_axis(
            preds, mode[None, :, :, None, None], 0)[0]
        res = blk - pred
        coef = jnp.einsum("ij,bcjk,lk->bcil", D, res, D)
        lvl = jnp.round(coef / qstep)
        bits = jnp.sum(jnp.where(
            lvl != 0, 2.0 + jnp.log2(1.0 + jnp.abs(lvl)), 0.0))
        rec = pred + jnp.einsum("ji,bcjk,kl->bcil", D, lvl * qstep, D)
        rec = jnp.clip(jnp.round(rec), 0, 255).astype(jnp.uint8)
        rec = rec.transpose(0, 2, 1, 3).reshape(Hp, Wp)
        return rec[:H, :W], bits

    @jax.jit
    def encode(y, u, v, qstep):
        q = jnp.maximum(qstep.astype(jnp.float32), 1e-3)
        ry, b0 = plane_pass(y, q)
        ru, b1 = plane_pass(u, q)
        rv, b2 = plane_pass(v, q)
        return ry, ru, rv, b0 + b1 + b2

    return encode


class QstepRateControl:
    """Closed-loop quantizer-step control for device-transform mode:
    the device qstep decides the reconstruction's information content,
    the lossless entropy layer's observed output bits feed back
    multiplicatively (bits ~ qstep^-gamma locally)."""

    def __init__(self, target_bps: float, fps: float,
                 qmin: float = 0.5, qmax: float = 256.0):
        self.target = max(1.0, target_bps / max(fps, 1e-6))
        self.qmin, self.qmax = qmin, qmax
        self.qstep = 16.0

    def observe(self, actual_bits: float) -> float:
        if actual_bits > 0:
            ratio = actual_bits / self.target
            # damped exponential correction; gamma ~ 1 in the
            # operating range of transform coding rate curves
            self.qstep *= ratio ** 0.5
            self.qstep = min(self.qmax, max(self.qmin, self.qstep))
        return self.qstep


class DeviceRateControl:
    """Closed-loop per-frame quantizer from the device rate curve.

    pick(bits_curve, actual from the last encode) -> crf int in
    [min_crf, max_crf].  A multiplicative EWMA correction maps the
    proxy-bit scale onto the engine's real output, so the analyzer
    needs no AV1 qindex tables."""

    def __init__(self, target_bps: float, fps: float,
                 min_crf: int = 8, max_crf: int = 63):
        self.target = max(1.0, target_bps / max(fps, 1e-6))
        self.min_crf, self.max_crf = min_crf, max_crf
        self.scale = 1.0            # actual_bits / proxy_bits

    @staticmethod
    def proxy_at(bits_curve: np.ndarray, crf: int) -> float:
        """UNSCALED proxy bits the curve predicts at a given crf —
        log-log interpolation over the Q_GRID.  observe() must compare
        the engine's actual bits against the proxy at the crf that was
        IN FORCE for those bits: comparing against the unrounded pick
        instead biases the EWMA by exactly the rounding/deadband gap
        and parks the loop at a stable off-target equilibrium
        (measured -41% at 1080p before this fix)."""
        est = np.maximum(np.asarray(bits_curve, np.float64), 1e-3)
        q = 0.125 * 2.0 ** (crf / 6.0)
        lq = np.log(np.asarray(Q_GRID, np.float64))
        x = math.log(max(q, 1e-6))
        i = int(np.clip(np.searchsorted(lq, x), 1, N_Q - 1))
        t = (x - lq[i - 1]) / (lq[i] - lq[i - 1])
        t = min(1.0, max(0.0, t))
        b0, b1 = math.log(est[i - 1]), math.log(est[i])
        return float(math.exp(b0 * (1 - t) + b1 * t))

    def observe(self, actual_bits: float, proxy_bits: float) -> None:
        if proxy_bits > 0 and actual_bits:
            r = actual_bits / proxy_bits
            # gain 0.5: starved windows are filtered upstream
            # (rav1enc accumulates until the packet count is
            # representative), so the remaining observations are
            # trustworthy and a slow EWMA only delays convergence.
            # The clamp stops runaway collapse when windows are
            # bimodal (keyframe-bearing vs keyframe-free GOP spans).
            self.scale = min(50.0, max(
                0.02, 0.5 * self.scale + 0.5 * r))

    def pick(self, bits_curve: np.ndarray) -> int:
        est = np.maximum(np.asarray(bits_curve, np.float64)
                         * self.scale, 1.0)
        want = self.target
        # monotone-decreasing curve over Q_GRID; log-interp the step
        i = int(np.searchsorted(-est, -want))
        if i <= 0:
            # target above the finest step's cost: floor quantizer
            return self.min_crf
        elif i >= N_Q:
            # target below even the coarsest step: ceiling quantizer
            return self.max_crf
        b0, b1 = math.log(est[i - 1]), math.log(est[i])
        t = 0.0 if b1 == b0 else (math.log(want) - b0) / (b1 - b0)
        q = float(Q_GRID[i - 1] ** (1 - t) * Q_GRID[i] ** t)
        # qstep -> crf: crf = 6*log2(qstep/0.125), the same
        # exponential family as the grid (closed loop absorbs offset)
        crf = int(round(6.0 * math.log2(max(q, 1e-3) / 0.125)))
        return max(self.min_crf, min(self.max_crf, crf))
