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


def direct_conv_reference(x: np.ndarray, ir: np.ndarray) -> np.ndarray:
    """Host golden: straight convolution truncated to len(x)."""
    from scipy.signal import fftconvolve
    return fftconvolve(x, ir, mode="full")[..., :x.shape[-1]]
