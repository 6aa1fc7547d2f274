"""Biquad IIR filtering as a parallel associative scan.

IIR filters are the classic "sequential" DSP op; the TPU-native
formulation rewrites the direct-form-II-transposed recurrence as a
linear state recurrence s[n] = A s[n-1] + B x[n] (A constant 2x2) and
evaluates it with jax.lax.associative_scan over affine maps — log-depth
instead of sample-sequential, fully on the VPU. Used by the EBU R-128
K-weighting pre-filter (gstpu/ops/ebur128.py), replacing the reference's
sample loop inside the ebur128 crate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def biquad_coeffs_shelving(rate: int):
    """BS.1770 stage-1 shelving filter (spec constants, as recomputed
    for arbitrary rates by libebur128/ffmpeg)."""
    f0 = 1681.974450955533
    G = 3.999843853973347
    Q = 0.7071752369554196
    K = np.tan(np.pi * f0 / rate)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b = np.array([(Vh + Vb * K / Q + K * K) / a0,
                  2.0 * (K * K - Vh) / a0,
                  (Vh - Vb * K / Q + K * K) / a0])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0,
                  (1.0 - K / Q + K * K) / a0])
    return b, a


def biquad_coeffs_highpass(rate: int):
    """BS.1770 stage-2 high-pass (RLB weighting)."""
    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = np.tan(np.pi * f0 / rate)
    a0 = 1.0 + K / Q + K * K
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0,
                  (1.0 - K / Q + K * K) / a0])
    b = np.array([1.0, -2.0, 1.0])
    return b, a


def _affine_combine(left, right):
    """Compose affine maps (M, v): x -> M x + v; right applied after.
    M: (..., 2, 2), v: (..., 2, 1) so both scan along axis -3."""
    M1, v1 = left
    M2, v2 = right
    return M2 @ M1, M2 @ v1 + v2


@partial(jax.jit, static_argnames=("unroll",))
def biquad_scan(x: jax.Array, b: jax.Array, a: jax.Array,
                state: jax.Array, unroll: int = 1):
    """Apply one biquad along the last axis via associative scan.

    x: (..., N); b: (3,); a: (3,) with a[0] == 1; state: (..., 2)
    DF2T state. Returns (y, new_state).
    """
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]
    # s[n] = A s[n-1] + Bc x[n];  y[n] = b0 x[n] + s1[n-1]
    A = jnp.stack([jnp.stack([-a1, jnp.ones_like(a1)]),
                   jnp.stack([-a2, jnp.zeros_like(a2)])])  # (2,2)
    Bc = jnp.stack([b1 - a1 * b0, b2 - a2 * b0])  # (2,)

    N = x.shape[-1]
    batch = x.shape[:-1]
    Ms = jnp.broadcast_to(A, batch + (N, 2, 2))
    vs = x[..., None, None] * Bc[:, None]  # (..., N, 2, 1)
    # fold the initial state into the first element: v0' = A s0 + v0
    v0 = vs[..., 0, :, :] + A @ state[..., None]
    vs = jnp.concatenate([v0[..., None, :, :], vs[..., 1:, :, :]], axis=-3)
    _, vc = jax.lax.associative_scan(_affine_combine, (Ms, vs), axis=-3)
    # initial state folded into element 0 => vc[..., n, :, :] == s[n]
    s = vc[..., 0, 0]  # z1[n] for all n: (..., N)
    z1_prev = jnp.concatenate(
        [state[..., 0][..., None], s[..., :-1]], axis=-1)
    y = b0 * x + z1_prev
    return y, vc[..., -1, :, 0]


@partial(jax.jit, static_argnames=("chunk",))
def biquad_apply(x: jax.Array, b: jax.Array, a: jax.Array,
                 state: jax.Array, chunk: int = 2048):
    """Long-block biquad: lax.scan over chunks, parallel associative
    scan within each chunk. Bounds the scan's intermediate memory to
    O(batch * chunk) instead of O(batch * N) (a 48k-sample block at
    batch 256 would otherwise materialize tens of GB of 2x2 matrices).
    """
    N = x.shape[-1]
    if N <= chunk:
        return biquad_scan(x, b, a, state)
    K = N // chunk
    rem = N - K * chunk
    xc = x[..., :K * chunk].reshape(x.shape[:-1] + (K, chunk))
    xc = jnp.moveaxis(xc, -2, 0)  # (K, ..., chunk)

    def body(st, xk):
        yk, st = biquad_scan(xk, b, a, st)
        return st, yk

    st, yc = jax.lax.scan(body, state, xc)
    y = jnp.moveaxis(yc, 0, -2).reshape(x.shape[:-1] + (K * chunk,))
    if rem:
        y_tail, st = biquad_scan(x[..., K * chunk:], b, a, st)
        y = jnp.concatenate([y, y_tail], axis=-1)
    return y, st


def biquad_reference(x: np.ndarray, b: np.ndarray, a: np.ndarray,
                     state: np.ndarray | None = None):
    """scipy.signal.lfilter golden (sequential, host)."""
    from scipy.signal import lfilter
    if state is None:
        state = np.zeros(x.shape[:-1] + (2,))
    y, zf = lfilter(b, a, x, axis=-1, zi=state)
    return y, zf
