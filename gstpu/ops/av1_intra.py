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
        self._last_proxy = None

    def observe(self, actual_bits: float) -> None:
        if self._last_proxy and self._last_proxy > 0 and actual_bits:
            r = actual_bits / self._last_proxy
            self.scale = 0.7 * self.scale + 0.3 * r

    def pick(self, bits_curve: np.ndarray) -> int:
        est = np.maximum(np.asarray(bits_curve, np.float64)
                         * self.scale, 1.0)
        want = self.target
        # monotone-decreasing curve over Q_GRID; log-interp the step
        i = int(np.searchsorted(-est, -want))
        if i <= 0:
            # target above the finest step's cost: floor quantizer
            self._last_proxy = float(est[0] / self.scale)
            return self.min_crf
        elif i >= N_Q:
            # target below even the coarsest step: ceiling quantizer
            self._last_proxy = float(est[-1] / self.scale)
            return self.max_crf
        else:
            b0, b1 = math.log(est[i - 1]), math.log(est[i])
            t = 0.0 if b1 == b0 else (math.log(want) - b0) / (b1 - b0)
            q = float(Q_GRID[i - 1] ** (1 - t) * Q_GRID[i] ** t)
            self._last_proxy = float(
                math.exp(b0 * (1 - t) + b1 * t) / self.scale)
        # qstep -> crf: crf = 6*log2(qstep/0.125), the same
        # exponential family as the grid (closed loop absorbs offset)
        crf = int(round(6.0 * math.log2(max(q, 1e-3) / 0.125)))
        return max(self.min_crf, min(self.max_crf, crf))
