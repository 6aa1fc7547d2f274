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
    """Compose affine maps x -> M x + v (right applied after), with the
    2x2 M and 2-vector v carried as SEPARATE component arrays — on TPU
    a trailing (2, 2) axis pads each matrix to an (8, 128) tile (256x
    waste); component arrays keep the scan on full VPU lanes."""
    m00a, m01a, m10a, m11a, v0a, v1a = left
    m00b, m01b, m10b, m11b, v0b, v1b = right
    return (m00b * m00a + m01b * m10a,
            m00b * m01a + m01b * m11a,
            m10b * m00a + m11b * m10a,
            m10b * m01a + m11b * m11a,
            m00b * v0a + m01b * v1a + v0b,
            m10b * v0a + m11b * v1a + v1b)


@partial(jax.jit, static_argnames=("unroll",))
def biquad_scan(x: jax.Array, b: jax.Array, a: jax.Array,
                state: jax.Array, unroll: int = 1):
    """Apply one biquad along the last axis via associative scan.

    x: (..., N); b: (3,); a: (3,) with a[0] == 1; state: (..., 2)
    DF2T state. Returns (y, new_state).
    """
    b = b.astype(x.dtype)
    a = a.astype(x.dtype)
    state = state.astype(x.dtype)
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]
    # s[n] = A s[n-1] + Bc x[n];  y[n] = b0 x[n] + s1[n-1]
    # A = [[-a1, 1], [-a2, 0]];  Bc = [b1 - a1 b0, b2 - a2 b0]
    N = x.shape[-1]
    batch = x.shape[:-1]
    shape = batch + (N,)
    m00 = jnp.broadcast_to(-a1, shape)
    m01 = jnp.broadcast_to(jnp.ones((), x.dtype), shape)
    m10 = jnp.broadcast_to(-a2, shape)
    m11 = jnp.broadcast_to(jnp.zeros((), x.dtype), shape)
    v0 = x * (b1 - a1 * b0)
    v1 = x * (b2 - a2 * b0)
    # fold the initial state into the first element: v0' = A s0 + v0
    s0, s1 = state[..., 0], state[..., 1]
    v0 = v0.at[..., 0].add(-a1 * s0 + s1)
    v1 = v1.at[..., 0].add(-a2 * s0)
    comps = (m00, m01, m10, m11, v0, v1)
    out = jax.lax.associative_scan(_affine_combine, comps, axis=-1)
    sz1, sz2 = out[4], out[5]        # s[n] components for all n
    z1_prev = jnp.concatenate(
        [state[..., 0][..., None], sz1[..., :-1]], axis=-1)
    y = b0 * x + z1_prev
    new_state = jnp.stack([sz1[..., -1], sz2[..., -1]], axis=-1)
    return y, new_state


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


def block_biquad_tables(b: np.ndarray, a: np.ndarray, L: int):
    """Host-side f64 tables for the block state-space biquad.

    The DF2T recurrence s[n] = A s[n-1] + Bc x[n], y[n] = b0 x[n] +
    z1[n-1] is unrolled over blocks of L samples:
      y_blk  = b0 x_blk + (h * x_blk)[in-block] + O @ s_in
      s_out  = M s_in + sum_j W[j] x_blk[j]
    with h[m] = (A^m Bc)[0] (within-block FIR), O[i] = A^i[0, :]
    (state observation), W[j] = A^{L-1-j} Bc, M = A^L.  This is exact
    (state-space, no truncation): the IIR becomes VPU-friendly shifted
    multiply-adds plus a tiny per-block recurrence — the TPU answer to
    a sequential filter (SURVEY §7: block-parallel scan with carried
    state).
    """
    b0, b1, b2 = float(b[0]), float(b[1]), float(b[2])
    a1, a2 = float(a[1]), float(a[2])
    A = np.array([[-a1, 1.0], [-a2, 0.0]])
    Bc = np.array([b1 - a1 * b0, b2 - a2 * b0])
    P = np.empty((L + 1, 2, 2))
    P[0] = np.eye(2)
    for i in range(1, L + 1):
        P[i] = A @ P[i - 1]
    h = np.array([(P[m] @ Bc)[0] for m in range(L - 1)])
    O = P[:L, 0, :].copy()                     # (L, 2)
    W = np.stack([P[L - 1 - j] @ Bc for j in range(L)])  # (L, 2)
    M = P[L]
    # the within-block FIR as one lower-triangular Toeplitz matrix:
    # y_blk += x_blk @ T  (T[i, j] = h[j - i - 1] for j > i).  One
    # (L, L) matmul on the MXU instead of L-1 shifted scatter-adds —
    # which also fed XLA's algebraic simplifier a rewrite loop
    # (the "circular simplification" warnings in MULTICHIP_r02).
    T = np.zeros((L, L))
    for i in range(L):
        for j in range(i + 1, L):
            if j - i - 1 < L - 1:
                T[i, j] = h[j - i - 1]
    return b0, h, O, W, M, T


def _tree_sum_last(x: jax.Array) -> jax.Array:
    """Sum over the last axis with a fixed binary-halving order
    (pow2 zero-pad): elementwise adds only, so the result is bitwise
    invariant to batch shape and backend tiling — unlike a bare
    jnp.sum whose reduction order XLA may retile per shape."""
    n = x.shape[-1]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, p - n)]
        x = jnp.pad(x, pad)
    while x.shape[-1] > 1:
        x = x[..., 0::2] + x[..., 1::2]
    return x[..., 0]


def make_block_biquad(b: np.ndarray, a: np.ndarray, L: int = 64,
                      dtype=jnp.float64):
    """Returns apply(x, state) -> (y, state) for x: (B, N) with
    N % L == 0, state: (B, 2) DF2T.  Traceable (jit inside a larger
    graph).  Exact block state-space evaluation of the biquad."""
    b0_, h_, O_, W_, M_, T_ = block_biquad_tables(np.asarray(b),
                                                  np.asarray(a), L)
    b0 = jnp.asarray(b0_, dtype)
    h = jnp.asarray(h_, dtype)
    O = jnp.asarray(O_, dtype)
    W = jnp.asarray(W_, dtype)
    M = jnp.asarray(M_, dtype)
    T = jnp.asarray(T_, dtype)
    # formulation choice: the (L, L) Toeplitz matmul is what cured
    # XLA:CPU's algebraic-simplifier rewrite loop, but TPU f64
    # matmuls are EMULATED (no f64 MXU) and measurably slower than
    # the elementwise shifted-add chain — pick per backend.
    import jax as _jax
    _use_matmul = _jax.default_backend() == "cpu" \
        or dtype != jnp.float64

    def apply(x: jax.Array, state: jax.Array):
        B, N = x.shape
        NB = N // L
        xb = x.reshape(B, NB, L)
        # per-block input-driven state increment u = sum_j W[j] x[j]
        u0 = _tree_sum_last(xb * W[:, 0])      # (B, NB)
        u1 = _tree_sum_last(xb * W[:, 1])
        # block-state recurrence s_k = M s_{k-1} + u_k via assoc scan
        m00, m01, m10, m11 = M[0, 0], M[0, 1], M[1, 0], M[1, 1]
        shape = (B, NB)
        comps = (jnp.broadcast_to(m00, shape),
                 jnp.broadcast_to(m01, shape),
                 jnp.broadcast_to(m10, shape),
                 jnp.broadcast_to(m11, shape),
                 u0.at[:, 0].add(m00 * state[:, 0] + m01 * state[:, 1]),
                 u1.at[:, 0].add(m10 * state[:, 0] + m11 * state[:, 1]))
        out = jax.lax.associative_scan(_affine_combine, comps, axis=-1)
        se0, se1 = out[4], out[5]              # state at end of block
        s0 = jnp.concatenate([state[:, :1], se0[:, :-1]], axis=1)
        s1 = jnp.concatenate([state[:, 1:], se1[:, :-1]], axis=1)
        # within-block FIR: triangular-Toeplitz matmul (CPU / f32)
        # or shifted adds (TPU f64 — emulated f64 matmul is slower)
        if _use_matmul:
            y = b0 * xb + xb @ T
        else:
            y = b0 * xb
            for m in range(h.shape[0]):
                y = y.at[:, :, m + 1:].add(
                    h[m] * xb[:, :, :L - 1 - m])
        y = y + s0[:, :, None] * O[:, 0] + s1[:, :, None] * O[:, 1]
        new_state = jnp.stack([se0[:, -1], se1[:, -1]], axis=-1)
        return y.reshape(B, N), new_state

    return apply


def biquad_reference(x: np.ndarray, b: np.ndarray, a: np.ndarray,
                     state: np.ndarray | None = None):
    """scipy.signal.lfilter golden (sequential, host)."""
    from scipy.signal import lfilter
    if state is None:
        state = np.zeros(x.shape[:-1] + (2,))
    y, zf = lfilter(b, a, x, axis=-1, zi=state)
    return y, zf
