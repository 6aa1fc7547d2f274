"""Batched multi-stream device processing with mesh sharding.

The core TPU-native runtime idea (SURVEY.md §7 L2'): many independent
media streams are stacked into a StreamBatch (B, N) and processed by
one jitted step; the batch axis shards over chips (data parallel over
*streams*, reference webrtcsink's 1-encoder-N-consumers fan-out
analogue), and within one very long stream the time axis can shard as
sequence blocks whose FIR/delay state crosses shard boundaries via
ICI collective-permute halos (ring-attention-shaped, but for DSP
carry — SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gstpu.ops import echo as echo_ops


def make_mesh(n_stream: int, n_seq: int = 1,
              devices=None) -> Mesh:
    """2D device mesh: stream (data-parallel) x seq (sequence-parallel)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = n_stream * n_seq
    assert len(devices) >= n, (len(devices), n)
    arr = np.array(devices[:n]).reshape(n_stream, n_seq)
    return Mesh(arr, ("stream", "seq"))


# ---------------------------------------------------------------------------
# stream-sharded echo step (the flagship round-1 device pipeline)
# ---------------------------------------------------------------------------

def make_stream_sharded_echo(mesh: Mesh, delay: int):
    """Echo step over (B, N) blocks with B sharded across the 'stream'
    mesh axis. State (B, S) shards the same way; no cross-chip comms
    (streams are independent)."""

    spec = NamedSharding(mesh, P(("stream", "seq"), None))

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,),
             out_shardings=(spec, spec))
    def step(tail, x, intensity, feedback):
        return echo_ops.echo_block(tail, x, intensity, feedback,
                                   delay=delay)

    return step, spec


# ---------------------------------------------------------------------------
# sequence-sharded FIR echo (feedback=0): halo exchange over ICI
# ---------------------------------------------------------------------------

def make_seq_sharded_fir_echo(mesh: Mesh, delay: int, seg_len: int):
    """Echo without feedback is a sparse FIR: out = x + i*delay(x).
    Shard a long block (B, n_seq*seg_len) over the 'seq' axis; each
    shard needs the last `delay` input samples of its left neighbor —
    fetched with lax.ppermute (ICI neighbor halo). Requires
    delay <= seg_len.
    """
    assert delay <= seg_len, (delay, seg_len)
    n_seq = mesh.shape["seq"]

    def shard_fn(tail, x, intensity):
        # x: (B_local, seg_len) — this shard's time segment
        # tail: (B_local, delay) — stream carry (end of *previous block*),
        #       only used by the first shard
        idx = jax.lax.axis_index("seq")
        halo_src = jnp.concatenate([tail, x], axis=-1)[..., -delay:]
        # pass each shard's trailing samples to its right neighbor
        left_halo = jax.lax.ppermute(
            halo_src, "seq",
            perm=[(i, (i + 1) % n_seq) for i in range(n_seq)])
        # shard 0 uses the stream carry; others use the neighbor halo
        prev = jnp.where(idx == 0, tail, left_halo)
        full = jnp.concatenate([prev, x], axis=-1)
        delayed = full[..., :seg_len]
        out = x + intensity * delayed
        # new stream carry comes from the LAST shard's tail; every
        # shard computes its own candidate, psum-masked to the last
        carry = jnp.where(idx == n_seq - 1, halo_src,
                          jnp.zeros_like(halo_src))
        carry = jax.lax.psum(carry, "seq")
        return carry, out

    from jax import shard_map

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(("stream",), None), P(("stream",), "seq"), P()),
        out_specs=(P(("stream",), None), P(("stream",), "seq")),
        check_vma=False)

    return jax.jit(mapped)


class StreamBatch:
    """Host-side handle for B device-resident stream states + a jitted
    chain step. The scheduler's batching window fills (B, N) blocks,
    this flushes them to the device in one dispatch."""

    def __init__(self, step, state):
        self.step = step
        self.state = state

    def process(self, blocks):
        """blocks: (B, N) ndarray -> (B, N) processed."""
        self.state, out = self.step(self.state, blocks)
        return out


# ---------------------------------------------------------------------------
# sequence-sharded K-weighting (IIR with cross-shard state handoff)
# ---------------------------------------------------------------------------

def make_seq_sharded_kweight(mesh: Mesh, rate: int = 192_000,
                             seg_len: int = 19_200):
    """The BS.1770 K-weighting biquad cascade — the REAL loudnorm
    chain's measurement front — sequence-sharded over the 'seq' mesh
    axis (SURVEY §2.8 P6).

    An IIR's shard boundary state depends on ALL earlier samples, so a
    fixed halo can't work; instead each shard filters its local
    segment from a ZERO state (y0, s0) and the true incoming state is
    reconstructed from an all-gather of every shard's zero-state end
    state: s_in(j) = M^seg s_in(j-1) + s0(j-1), a tiny sequential
    affine composition (n_seq terms of 2-vectors). The output is then
    corrected linearly: y += Tobs @ s_in with Tobs[n] = (A^n)[0, :]
    (state-space superposition — exact up to f64 rounding).  ICI cost:
    one all-gather of (B_local, 2) per stage per block.

    step(z (B, 2, 2), x (B, n_seq*seg)) -> (z, y) with x/y sharded
    P('stream', 'seq') and z (both cascade stages' DF2T states)
    replicated over seq.
    """
    import numpy as np

    from gstpu.ops.biquad import (biquad_coeffs_highpass,
                                  biquad_coeffs_shelving,
                                  block_biquad_tables, make_block_biquad)

    n_seq = mesh.shape["seq"]
    coeffs = (biquad_coeffs_shelving(rate), biquad_coeffs_highpass(rate))
    bqs = [make_block_biquad(b, a, L=64) for b, a in coeffs]

    # per-stage: M^seg (2x2) and the per-sample observation table
    tables = []
    for b, a in coeffs:
        b0, h, O, W, M, T = block_biquad_tables(np.asarray(b),
                                                np.asarray(a), 64)
        a1, a2 = float(a[1]), float(a[2])
        A = np.array([[-a1, 1.0], [-a2, 0.0]])
        P_ = np.empty((seg_len, 2, 2))
        P_[0] = np.eye(2)
        for i in range(1, seg_len):
            P_[i] = A @ P_[i - 1]
        Tobs = P_[:, 0, :].copy()              # (seg, 2)
        Mseg = np.linalg.matrix_power(M, seg_len // 64)
        tables.append((jnp.asarray(Tobs), jnp.asarray(Mseg)))

    def _stage(stage_i, z, x_local):
        """One biquad stage on this shard's segment."""
        bq = bqs[stage_i]
        Tobs, Mseg = tables[stage_i]
        B = x_local.shape[0]
        idx = jax.lax.axis_index("seq")
        y0, s_end0 = bq(x_local, jnp.zeros((B, 2), x_local.dtype))
        # gather every shard's zero-state end state: (n_seq, B, 2)
        allz = jax.lax.all_gather(s_end0, "seq")
        # reconstruct the incoming state for every shard sequentially
        s_in = z                                 # shard 0's incoming
        s_ins = [s_in]
        for k in range(1, n_seq):
            s_in = s_in @ Mseg.T + allz[k - 1]
            s_ins.append(s_in)
        stack = jnp.stack(s_ins)                 # (n_seq, B, 2)
        mine = stack[idx]
        y = y0 + mine @ Tobs.T                   # superposition
        z_next = stack[n_seq - 1] @ Mseg.T + allz[n_seq - 1]
        return z_next, y

    def shard_fn(z, x_local):
        z1, y = _stage(0, z[:, 0], x_local)
        z2, y = _stage(1, z[:, 1], y)
        return jnp.stack([z1, z2], axis=1), y

    from jax import shard_map
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(("stream",), None, None), P(("stream",), "seq")),
        out_specs=(P(("stream",), None, None), P(("stream",), "seq")),
        check_vma=False)
    return jax.jit(mapped)


def kweight_unsharded(rate: int = 192_000):
    """Single-device golden for the seq-sharded K-weighting."""
    from gstpu.ops.biquad import (biquad_coeffs_highpass,
                                  biquad_coeffs_shelving,
                                  make_block_biquad)
    bq1 = make_block_biquad(*biquad_coeffs_shelving(rate), L=64)
    bq2 = make_block_biquad(*biquad_coeffs_highpass(rate), L=64)

    @jax.jit
    def step(z, x):
        y, z1 = bq1(x, z[:, 0])
        y, z2 = bq2(y, z[:, 1])
        return jnp.stack([z1, z2], axis=1), y
    return step
