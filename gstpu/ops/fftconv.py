"""Block FFT convolution: overlap-save with carried history.

The kernel behind hrtfrender and sofalizer (reference audio/hrtf —
hrtf crate block FFT convolution, sofar partitioned FIR): convolution
of streaming blocks with (possibly per-block-changing) impulse
responses as batched rFFT multiplies — the canonical mapping of long
FIR work onto the TPU (SURVEY.md §2.8 P6: block-parallel conv as
batched FFT matmuls, overlap carried as state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("ir_len",))
def ols_block(history: jax.Array, x: jax.Array, ir_f: jax.Array,
              *, ir_len: int):
    """Overlap-save convolution of one block.

    history: (..., ir_len-1) carried input tail
    x: (..., S) new samples
    ir_f: (..., F) rfft of the zero-padded IR (F = nfft//2+1,
          nfft = next_pow2(S + ir_len - 1)); broadcastable against
          history/x batch dims (e.g. (C, 2, F) for per-channel stereo
          IRs against x (C, 1, S)).
    Returns (new_history (..., ir_len-1), y (..., S)).
    """
    S = x.shape[-1]
    nfft = 2 * (ir_f.shape[-1] - 1)
    full = jnp.concatenate([history, x], axis=-1)  # (..., ir_len-1+S)
    fx = jnp.fft.rfft(full, n=nfft, axis=-1)
    y = jnp.fft.irfft(fx * ir_f, n=nfft, axis=-1)
    y = y[..., ir_len - 1: ir_len - 1 + S]
    new_hist = full[..., full.shape[-1] - (ir_len - 1):] if ir_len > 1 \
        else history
    return new_hist, y


def ir_rfft(ir: np.ndarray, seg_len: int) -> np.ndarray:
    """Precompute the rfft of IRs for segment length seg_len."""
    ir_len = ir.shape[-1]
    nfft = next_pow2(seg_len + ir_len - 1)
    return np.fft.rfft(ir, n=nfft, axis=-1)


# ---------------------------------------------------------------------------
# Uniformly-partitioned convolution (UPC / UPOLS)
# ---------------------------------------------------------------------------
#
# The reference sofalizer runs the sofar Renderer's uniformly
# partitioned convolution with partition-length 64 (reference
# audio/hrtf/src/sofa/imp.rs:37-44, 776-797): the FIR is split into
# K partitions of P taps; each input sub-frame's spectrum enters a
# frequency-domain delay line (FDL) and the output is
# sum_k FDL[j-k] * H[k] — so output depends on input with P-sample
# granularity instead of full-IR-length granularity. TPU mapping: the
# whole element block's sub-frames are one batched rfft, the FDL
# window a gather, the partition sum one einsum-like reduce, and the
# inverse one batched irfft — a single fused dispatch per block.


@partial(jax.jit, static_argnames=("part_len",))
def upc_ir_rfft(ir: jax.Array, *, part_len: int) -> jax.Array:
    """Partition a real IR at part_len taps and rfft each partition
    at FFT size 2*part_len (computed ON DEVICE from a real upload —
    see gstpu.elements.audio.hrtf._dev_rfft for why).

    ir: (..., L) real. Returns (..., K, part_len+1) complex64 with
    K = ceil(L / part_len); partition k holds taps [k*P, (k+1)*P).
    """
    L = ir.shape[-1]
    K = -(-L // part_len)
    pad = K * part_len - L
    irp = jnp.pad(ir.astype(jnp.float32),
                  [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    parts = irp.reshape(ir.shape[:-1] + (K, part_len))
    return jnp.fft.rfft(parts, n=2 * part_len, axis=-1)


def upc_init(batch_shape: tuple, ir_len: int, part_len: int):
    """Zero state for upc_block: (fdl (..., K-1, F) complex64,
    prev (..., P) float32)."""
    K = -(-ir_len // part_len)
    F = part_len + 1
    fdl = jnp.zeros(batch_shape + (K - 1, F), jnp.complex64)
    prev = jnp.zeros(batch_shape + (part_len,), jnp.float32)
    return fdl, prev


@partial(jax.jit, static_argnames=("part_len",))
def upc_block(state, x: jax.Array, h_f: jax.Array, *, part_len: int):
    """Uniformly-partitioned overlap-save convolution of one block.

    state: (fdl, prev) from upc_init (batch dims = x's batch dims)
    x: (..., S) with S % part_len == 0
    h_f: (..., K, F) partitioned IR spectra from upc_ir_rfft;
         broadcastable against x's batch dims (e.g. (C, 2, K, F)
         against x (C, 1, S)).
    Returns ((new_fdl, new_prev), y (..., S)) — y identical to the
    full linear convolution, but each P-sample output sub-block
    depends only on input up to its own end (P-sample algorithmic
    granularity, the reference's latency semantics).
    """
    P = part_len
    K = h_f.shape[-2]
    fdl, prev = state
    S = x.shape[-1]
    n = S // P
    ext = jnp.concatenate([prev, x.astype(jnp.float32)], axis=-1)
    # frame j = ext[j*P : j*P + 2P] = [sub-block j-1, sub-block j]
    idx = jnp.arange(n)[:, None] * P + jnp.arange(2 * P)[None, :]
    frames = ext[..., idx]                      # (..., n, 2P)
    X = jnp.fft.rfft(frames, axis=-1)           # (..., n, F)
    # FDL extended across the block: oldest first
    Xext = jnp.concatenate([fdl, X], axis=-2)   # (..., K-1+n, F)
    # output sub-block j consumes spectra X_{j-K+1} .. X_j
    gidx = (K - 1 + jnp.arange(n)[:, None]
            - jnp.arange(K)[None, :])           # (n, K)
    Xwin = Xext[..., gidx, :]                   # (..., n, K, F)
    Y = jnp.sum(Xwin * h_f[..., None, :, :], axis=-2)
    y = jnp.fft.irfft(Y, n=2 * P, axis=-1)[..., P:]   # (..., n, P)
    y = y.reshape(y.shape[:-2] + (S,))
    new_fdl = Xext[..., Xext.shape[-2] - (K - 1):, :] if K > 1 else fdl
    new_prev = ext[..., ext.shape[-1] - P:]
    return (new_fdl, new_prev), y


def direct_conv_reference(x: np.ndarray, ir: np.ndarray) -> np.ndarray:
    """Host golden: straight convolution truncated to len(x)."""
    from scipy.signal import fftconvolve
    return fftconvolve(x, ir, mode="full")[..., :x.shape[-1]]
